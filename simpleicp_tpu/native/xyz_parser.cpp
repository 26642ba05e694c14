// Fast xyz point-cloud parser (native runtime component).
//
// The reference's native implementations each carry their own text parser
// (/root/reference/c++/src/simpleicp-cli.cpp:72-128 — getline + stod;
// /root/reference/rust/src/io.rs:9-37). This one is built for throughput on
// large clouds (50M+ points): mmap the file, single pass, branch-light float
// parsing, no per-line allocations. Contract matches the reference CLIs:
// whitespace-separated `x y z` per line, blank lines skipped, lines starting
// with "//" skipped (CloudCompare headers), exactly three numeric columns
// enforced.
//
// Exposed C ABI (loaded from Python via ctypes in native/__init__.py):
//   int64_t xyz_count_and_parse(const char* path, double* out /* may be
//       null */, int64_t capacity, char* errbuf, int64_t errlen);
// Returns the number of points on success (writing 3*n doubles into `out`
// when non-null), or -1 on error with a message in errbuf.

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

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

  const char* p = static_cast<const char*>(map);
  const char* end = p + size;
  int64_t n = 0;
  int64_t line = 0;
  int64_t status = 0;

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
      set_err(errbuf, errlen, "expected 3 numeric columns", line);
      status = -1;
      break;
    }
    // enforce exactly 3 columns like the reference CLIs
    while (p < end && is_space(*p)) ++p;
    if (p < end && *p != '\n') {
      set_err(errbuf, errlen, "more than 3 columns", line);
      status = -1;
      break;
    }
    if (p < end) ++p;  // consume newline

    if (out != nullptr) {
      if (n >= capacity) {
        set_err(errbuf, errlen, "output capacity exceeded", line);
        status = -1;
        break;
      }
      out[3 * n + 0] = x;
      out[3 * n + 1] = y;
      out[3 * n + 2] = z;
    }
    ++n;
  }

  munmap(map, size);
  return status == 0 ? n : -1;
}
