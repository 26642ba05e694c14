// Fast xyz point-cloud parser (native runtime component).
//
// The reference's native implementations each carry their own text parser
// (/root/reference/c++/src/simpleicp-cli.cpp:72-128 — getline + stod;
// /root/reference/rust/src/io.rs:9-37). This one is built for throughput on
// large clouds (50M+ points, GB-scale text): mmap the file, split it into
// per-thread chunks at line boundaries, and parse every chunk concurrently
// (OpenMP) with branch-light float parsing and no per-line allocations.
// Contract matches the reference CLIs: whitespace-separated `x y z` per
// line, blank lines skipped, lines starting with "//" skipped (CloudCompare
// headers), exactly three numeric columns enforced, first malformed line
// reported by its 1-based global line number.
//
// Exposed C ABI (loaded from Python via ctypes in native/__init__.py):
//   int64_t xyz_count_and_parse(const char* path, double* out /* may be
//       null */, int64_t capacity, char* errbuf, int64_t errlen);
// Returns the number of points on success (writing 3*n doubles into `out`
// when non-null), or -1 on error with a message in errbuf. The count call
// (out == null) only classifies lines (blank/comment/point) without
// validating numerics — the fill call re-scans and reports any malformed
// line, so the two-call Python flow raises the same errors as before.

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

inline bool is_space(char c) { return c == ' ' || c == '\t' || c == '\r'; }

// Fast strtod-compatible-enough parser for plain decimal floats with
// optional sign/exponent. Falls back to strtod for anything exotic.
inline bool parse_double(const char*& p, const char* end, double& out) {
  while (p < end && is_space(*p)) ++p;
  if (p >= end || *p == '\n') return false;
  const char* start = p;
  bool neg = false;
  if (*p == '-' || *p == '+') {
    neg = (*p == '-');
    ++p;
  }
  double value = 0.0;
  bool any = false;
  while (p < end && *p >= '0' && *p <= '9') {
    value = value * 10.0 + (*p - '0');
    ++p;
    any = true;
  }
  if (p < end && *p == '.') {
    ++p;
    double scale = 0.1;
    while (p < end && *p >= '0' && *p <= '9') {
      value += (*p - '0') * scale;
      scale *= 0.1;
      ++p;
      any = true;
    }
  }
  if (!any) return false;
  if (p < end && (*p == 'e' || *p == 'E')) {
    // Exponent (and any accumulated rounding risk): redo with strtod for
    // exactness; scientific notation is rare in xyz files.
    char* q = nullptr;
    errno = 0;
    double v = strtod(start, &q);
    if (q == start || errno == ERANGE) return false;
    p = q;
    out = v;
    return true;
  }
  out = neg ? -value : value;
  return true;
}

void set_err(char* errbuf, int64_t errlen, const char* msg, int64_t line) {
  if (errbuf && errlen > 0) {
    snprintf(errbuf, static_cast<size_t>(errlen), "%s (line %lld)", msg,
             static_cast<long long>(line));
  }
}

// Classify-only scan of [p, end): counts records (every line, matching the
// parse loop's per-iteration line counter — blank, comment, and point lines
// alike, including a trailing line with no newline) and point lines (first
// non-space char exists and the line is not a "//" comment). No numeric
// validation — memchr-speed, used to place per-chunk output offsets and
// base line numbers before the parallel parse.
void scan_range(const char* p, const char* end, int64_t& records,
                int64_t& points) {
  records = 0;
  points = 0;
  while (p < end) {
    ++records;
    while (p < end && is_space(*p)) ++p;
    if (p < end && *p == '\n') {  // blank line
      ++p;
      continue;
    }
    if (p >= end) break;  // trailing spaces, no newline
    if (!(p + 1 < end && p[0] == '/' && p[1] == '/')) ++points;
    const char* nl =
        static_cast<const char*>(memchr(p, '\n', static_cast<size_t>(end - p)));
    p = nl ? nl + 1 : end;
  }
}

// Full parse of [p, end): the original serial loop, parameterized with a
// global base line number and an output offset so chunks can run
// concurrently. Writes points at out[3*(out_base+i)] for local i; returns
// the number of points parsed, or -1 with err_line/err_msg set to the
// first malformed line.
int64_t parse_range(const char* p, const char* end, int64_t base_line,
                    double* out, int64_t out_base, int64_t capacity,
                    int64_t& err_line, const char*& err_msg) {
  int64_t n = 0;
  int64_t line = base_line;
  while (p < end) {
    ++line;
    while (p < end && is_space(*p)) ++p;
    if (p < end && *p == '\n') {  // blank line
      ++p;
      continue;
    }
    if (p + 1 < end && p[0] == '/' && p[1] == '/') {  // comment header
      while (p < end && *p != '\n') ++p;
      if (p < end) ++p;
      continue;
    }
    if (p >= end) break;

    double x, y, z;
    if (!parse_double(p, end, x) || !parse_double(p, end, y) ||
        !parse_double(p, end, z)) {
      err_line = line;
      err_msg = "expected 3 numeric columns";
      return -1;
    }
    // enforce exactly 3 columns like the reference CLIs
    while (p < end && is_space(*p)) ++p;
    if (p < end && *p != '\n') {
      err_line = line;
      err_msg = "more than 3 columns";
      return -1;
    }
    if (p < end) ++p;  // consume newline

    if (out != nullptr) {
      const int64_t g = out_base + n;
      if (g >= capacity) {
        err_line = line;
        err_msg = "output capacity exceeded";
        return -1;
      }
      out[3 * g + 0] = x;
      out[3 * g + 1] = y;
      out[3 * g + 2] = z;
    }
    ++n;
  }
  return n;
}

// Files below this size parse single-threaded (thread startup + the extra
// classify pass would dominate).
constexpr size_t kParallelMinBytes = size_t{4} << 20;

}  // namespace

extern "C" int64_t xyz_count_and_parse(const char* path, double* out,
                                       int64_t capacity, char* errbuf,
                                       int64_t errlen) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) {
    set_err(errbuf, errlen, "cannot open file", 0);
    return -1;
  }
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size == 0) {
    close(fd);
    set_err(errbuf, errlen, "empty or unreadable file", 0);
    return -1;
  }
  const size_t size = static_cast<size_t>(st.st_size);
  void* map = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (map == MAP_FAILED) {
    set_err(errbuf, errlen, "mmap failed", 0);
    return -1;
  }
  madvise(map, size, MADV_SEQUENTIAL);

  const char* base = static_cast<const char*>(map);
  const char* end = base + size;

  int threads = 1;
#ifdef _OPENMP
  threads = omp_get_max_threads();
#endif
  int chunks = threads;
  if (size < kParallelMinBytes || chunks < 2) chunks = 1;

  int64_t result;
  if (chunks == 1) {
    int64_t err_line = 0;
    const char* err_msg = nullptr;
    result = parse_range(base, end, 0, out, 0, out ? capacity : 0, err_line,
                         err_msg);
    if (result < 0) set_err(errbuf, errlen, err_msg, err_line);
  } else {
    // Chunk boundaries: byte positions rounded forward past the next
    // newline, so every line lives entirely in one chunk (a chunk start is
    // always the byte after a '\n', or 0, or EOF).
    const int64_t n_ch = chunks;
    int64_t* starts = new int64_t[static_cast<size_t>(n_ch) + 1];
    starts[0] = 0;
    starts[n_ch] = static_cast<int64_t>(size);
    for (int64_t i = 1; i < n_ch; ++i) {
      size_t pos = size / static_cast<size_t>(n_ch) * static_cast<size_t>(i);
      if (pos < static_cast<size_t>(starts[i - 1]))
        pos = static_cast<size_t>(starts[i - 1]);
      const char* nl = static_cast<const char*>(
          memchr(base + pos, '\n', size - pos));
      starts[i] = nl ? (nl - base) + 1 : static_cast<int64_t>(size);
    }

    int64_t* rec_c = new int64_t[static_cast<size_t>(n_ch)]();
    int64_t* pts_c = new int64_t[static_cast<size_t>(n_ch)]();
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < n_ch; ++i)
      scan_range(base + starts[i], base + starts[i + 1], rec_c[i], pts_c[i]);

    // Exclusive prefix sums: chunk i's first line is line_base[i]+1 and its
    // first point writes at row pts_base[i].
    int64_t total_pts = 0;
    if (out == nullptr) {
      for (int64_t i = 0; i < n_ch; ++i) total_pts += pts_c[i];
      result = total_pts;
    } else {
      int64_t* line_base = new int64_t[static_cast<size_t>(n_ch)];
      int64_t* pts_base = new int64_t[static_cast<size_t>(n_ch)];
      int64_t lb = 0, pb = 0;
      for (int64_t i = 0; i < n_ch; ++i) {
        line_base[i] = lb;
        pts_base[i] = pb;
        lb += rec_c[i];
        pb += pts_c[i];
      }
      total_pts = pb;

      // Per-chunk first-error slots; the smallest global line wins, which
      // is exactly the line the serial parse would have stopped at.
      int64_t* err_lines = new int64_t[static_cast<size_t>(n_ch)];
      const char** err_msgs = new const char*[static_cast<size_t>(n_ch)];
      for (int64_t i = 0; i < n_ch; ++i) {
        err_lines[i] = 0;
        err_msgs[i] = nullptr;
      }
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
      for (int64_t i = 0; i < n_ch; ++i) {
        if (pts_base[i] > capacity) {
          // A preceding chunk already overflows; that chunk reports it.
          continue;
        }
        parse_range(base + starts[i], base + starts[i + 1], line_base[i], out,
                    pts_base[i], capacity, err_lines[i], err_msgs[i]);
      }
      result = total_pts;
      for (int64_t i = 0; i < n_ch; ++i) {
        if (err_msgs[i] != nullptr) {
          set_err(errbuf, errlen, err_msgs[i], err_lines[i]);
          result = -1;
          break;
        }
      }
      delete[] err_lines;
      delete[] err_msgs;
      delete[] line_base;
      delete[] pts_base;
    }
    delete[] rec_c;
    delete[] pts_c;
    delete[] starts;
  }

  munmap(map, size);
  return result;
}
