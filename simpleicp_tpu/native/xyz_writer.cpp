// Fast xyz point-cloud writer (native runtime component).
//
// Counterpart of xyz_parser.cpp for the export path: the CLI's --export of
// a 50M-point transformed cloud through np.savetxt costs ~107 s (Python
// per-row loop); this writer formats per-thread row ranges concurrently
// (OpenMP) and streams the buffers to disk in order. Formatting is an
// exact integer fixed-point conversion (fmt_fixed below) byte-identical to
// C printf "%.*f" — and hence to np.savetxt — with snprintf as the
// fallback for extreme values (reference writers:
// /root/reference/python/simpleicp/pointcloud.py:219-226 via pandas).
//
// Exposed C ABI (loaded from Python via ctypes in native/__init__.py):
//   int64_t xyz_write(const char* path, const double* X /* (n,3) C-order */,
//                     int64_t n, int32_t decimals, const char* header,
//                     char* errbuf, int64_t errlen);
// `header` is written verbatim first when non-empty (caller includes the
// trailing newline). Returns 0 on success, -1 on error with a message in
// errbuf.

#include <cstdint>
#include <cstdio>
#include <cstring>

#include <string>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

void set_err_w(char* errbuf, int64_t errlen, const char* msg) {
  if (errbuf && errlen > 0)
    snprintf(errbuf, static_cast<size_t>(errlen), "%s", msg);
}

__extension__ typedef unsigned __int128 u128;  // GCC/Clang on x86-64

// Exact %.{dec}f formatter for the common case (|v| < 2^52 and the scaled
// integer < 2^63): the double is m·2^e exactly, so v·10^dec = (m·10^dec)
// >> -e computes EXACTLY in 128-bit integer arithmetic, and rounding the
// remainder half-to-even reproduces glibc printf's correctly-rounded
// fixed-format output bit for bit (printf rounds the exact binary value;
// the tie case is a remainder of exactly 2^(-e-1), visible here exactly).
// Returns bytes written, or -1 to fall back to snprintf (nan/inf, huge
// magnitudes, dec > 12).
inline int fmt_fixed(char* out, double v, int dec, uint64_t p10) {
  uint64_t bits;
  memcpy(&bits, &v, 8);
  const bool neg = (bits >> 63) != 0;
  const int biased = static_cast<int>((bits >> 52) & 0x7ff);
  if (biased == 0x7ff || biased >= 1075 || dec > 12) return -1;
  // biased < 1075 <=> unbiased exponent e = biased-1075 < 0 (|v| < 2^52).
  const uint64_t m = (bits & ((uint64_t{1} << 52) - 1)) |
                     (biased ? (uint64_t{1} << 52) : 0);
  const int s = biased ? (1075 - biased) : 1074;  // v = m / 2^s, s >= 1
  uint64_t q;
  if (s > 100) {
    // |v| < 2^53/2^100 = 2^-47; with dec <= 12 the scaled value is under
    // 2^-47·10^12 < 2^-7 < 1/2, so it rounds to exactly 0.
    q = 0;
  } else {
    const u128 p = static_cast<u128>(m) * p10;
    const u128 qw = p >> s;
    if (qw >> 63) return -1;  // scaled integer needs > 63 bits: fallback
    q = static_cast<uint64_t>(qw);
    const u128 r = p - (qw << s);
    const u128 half = static_cast<u128>(1) << (s - 1);
    if (r > half || (r == half && (q & 1))) ++q;
  }
  char tmp[24];  // digits of q, backwards (q < 2^64: <= 20 digits)
  int nd = 0;
  uint64_t x = q;
  do {
    tmp[nd++] = static_cast<char>('0' + (x % 10));
    x /= 10;
  } while (x != 0);
  char* w = out;
  if (neg) *w++ = '-';  // printf keeps the sign even for "-0.000"
  if (nd > dec) {
    for (int i = nd - 1; i >= dec; --i) *w++ = tmp[i];
  } else {
    *w++ = '0';
  }
  if (dec > 0) {
    *w++ = '.';
    for (int i = dec - 1; i >= 0; --i)
      *w++ = (i < nd) ? tmp[i] : '0';
  }
  return static_cast<int>(w - out);
}

}  // namespace

extern "C" int64_t xyz_write(const char* path, const double* X, int64_t n,
                             int32_t decimals, const char* header,
                             char* errbuf, int64_t errlen) {
  if (n < 0 || decimals < 0 || decimals > 17) {
    set_err_w(errbuf, errlen, "invalid arguments");
    return -1;
  }
  int threads = 1;
#ifdef _OPENMP
  threads = omp_get_max_threads();
#endif
  if (n < (int64_t{1} << 18)) threads = 1;  // format startup not worth it
  const int64_t n_ch = threads;

  std::vector<std::string> bufs(static_cast<size_t>(n_ch));
#ifdef _OPENMP
#pragma omp parallel for schedule(static) num_threads(threads)
#endif
  for (int64_t c = 0; c < n_ch; ++c) {
    const int64_t i0 = n * c / n_ch;
    const int64_t i1 = n * (c + 1) / n_ch;
    std::string& buf = bufs[static_cast<size_t>(c)];
    // ~(sign + digits + dot + decimals) per column + separators
    buf.reserve(static_cast<size_t>((i1 - i0)) *
                static_cast<size_t>(3 * (14 + decimals) + 3));
    uint64_t p10 = 1;
    for (int d = 0; d < decimals && d < 13; ++d) p10 *= 10;
    char line[3 * 40 + 8];
    for (int64_t i = i0; i < i1; ++i) {
      const double* row = X + 3 * i;
      char* w = line;
      bool fast = true;
      for (int k = 0; k < 3 && fast; ++k) {
        const int len = fmt_fixed(w, row[k], decimals, p10);
        if (len < 0) {
          fast = false;
          break;
        }
        w += len;
        *w++ = (k < 2) ? ' ' : '\n';
      }
      if (fast) {
        buf.append(line, static_cast<size_t>(w - line));
      } else {
        // nan/inf, |v| >= 2^52, scaled value >= 2^63, or decimals > 12:
        // printf does the (arbitrarily wide) formatting.
        char col[352];
        for (int k = 0; k < 3; ++k) {
          snprintf(col, sizeof col, "%.*f", decimals, row[k]);
          buf += col;
          buf += (k < 2) ? ' ' : '\n';
        }
      }
    }
  }

  FILE* f = fopen(path, "wb");
  if (!f) {
    set_err_w(errbuf, errlen, "cannot open file for writing");
    return -1;
  }
  int64_t status = 0;
  if (header && header[0] != '\0') {
    if (fwrite(header, 1, strlen(header), f) != strlen(header)) status = -1;
  }
  for (int64_t c = 0; c < n_ch && status == 0; ++c) {
    const std::string& buf = bufs[static_cast<size_t>(c)];
    if (!buf.empty() && fwrite(buf.data(), 1, buf.size(), f) != buf.size())
      status = -1;
  }
  if (fclose(f) != 0) status = -1;
  if (status != 0) set_err_w(errbuf, errlen, "write failed");
  return status;
}
