// Parallel stable argsort over float keys (native runtime component).
//
// The blocked slab join (ops/dilate_gate.py:_blocked_slab_join) plans the
// band sweep host-side: argsort band queries and kept refs along two
// lattice axes. numpy's stable argsort (mergesort) costs ~2 s for the 11M
// kept refs of the 50M config — this LSD radix argsort does the same work
// multithreaded in a few hundred ms: keys map to order-preserving unsigned
// integers (sign-flip transform), then byte-wise stable counting-sort
// passes permute (key, index) pairs; per-thread 256-bin histograms and an
// exclusive scan over (bin, thread) give every thread private scatter
// ranges, so each pass is stable and lock-free. Passes whose byte is
// constant across all elements are skipped (coordinate data: high bytes
// rarely vary), so f64 typically needs 3-5 of its 8 passes.
//
// Tie order: equal keys keep their original relative order (stability),
// matching numpy kind="stable" — except that -0.0 sorts before +0.0 and
// NaNs sort by their bit patterns (numpy treats them as equal / puts NaN
// last). The slab join is tie-order independent (windows only need
// nondecreasing keys), so either order is correct there.
//
// Exposed C ABI (loaded from Python via ctypes in native/__init__.py):
//   void argsort_f32(const float* keys, int64_t n, int32_t* out);
//   void argsort_f64(const double* keys, int64_t n, int32_t* out);
// `out` receives the permutation (int32 — the gate plans over < 2^31
// rows by construction).

#include <cstdint>
#include <cstring>

#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// Order-preserving bijections float -> uint (IEEE-754 total order trick:
// flip all bits of negatives, flip only the sign bit of non-negatives).
inline uint32_t key_u32(float v) {
  uint32_t u;
  memcpy(&u, &v, 4);
  return (u & 0x80000000u) ? ~u : (u | 0x80000000u);
}
inline uint64_t key_u64(double v) {
  uint64_t u;
  memcpy(&u, &v, 8);
  return (u & 0x8000000000000000ull) ? ~u : (u | 0x8000000000000000ull);
}

template <typename K>
void radix_argsort(const K* keys, int64_t n, int32_t* out) {
  int threads = 1;
#ifdef _OPENMP
  threads = omp_get_max_threads();
#endif
  if (n < (int64_t{1} << 15)) threads = 1;
  const int64_t n_th = threads;
  constexpr int kBytes = static_cast<int>(sizeof(K));

  std::vector<K> kbuf_a(static_cast<size_t>(n)), kbuf_b(static_cast<size_t>(n));
  std::vector<int32_t> ibuf(static_cast<size_t>(n));
  K* ka = kbuf_a.data();
  K* kb = kbuf_b.data();
  int32_t* ia = out;  // permutation ping-pongs between out and ibuf
  int32_t* ib = ibuf.data();

#ifdef _OPENMP
#pragma omp parallel for schedule(static) num_threads(threads)
#endif
  for (int64_t i = 0; i < n; ++i) {
    ka[i] = keys[i];
    ia[i] = static_cast<int32_t>(i);
  }

  // hist[t*256 + b]: count of byte value b in thread t's chunk.
  std::vector<int64_t> hist(static_cast<size_t>(n_th) * 256);
  for (int pass = 0; pass < kBytes; ++pass) {
    const int shift = 8 * pass;
#ifdef _OPENMP
#pragma omp parallel for schedule(static) num_threads(threads)
#endif
    for (int64_t t = 0; t < n_th; ++t) {
      const int64_t i0 = n * t / n_th, i1 = n * (t + 1) / n_th;
      int64_t* h = hist.data() + t * 256;
      memset(h, 0, 256 * sizeof(int64_t));
      for (int64_t i = i0; i < i1; ++i)
        ++h[(ka[i] >> shift) & 0xff];
    }
    // Constant byte across all elements: the pass is the identity — skip.
    {
      bool constant = false;
      for (int b = 0; b < 256 && !constant; ++b) {
        int64_t c = 0;
        for (int64_t t = 0; t < n_th; ++t) c += hist[static_cast<size_t>(t * 256 + b)];
        if (c == n) constant = true;
        else if (c != 0) break;
      }
      if (constant) continue;
    }
    // Exclusive scan in (byte, thread) order -> per-thread scatter bases.
    int64_t run = 0;
    for (int b = 0; b < 256; ++b) {
      for (int64_t t = 0; t < n_th; ++t) {
        int64_t& h = hist[static_cast<size_t>(t * 256 + b)];
        const int64_t c = h;
        h = run;
        run += c;
      }
    }
#ifdef _OPENMP
#pragma omp parallel for schedule(static) num_threads(threads)
#endif
    for (int64_t t = 0; t < n_th; ++t) {
      const int64_t i0 = n * t / n_th, i1 = n * (t + 1) / n_th;
      int64_t* h = hist.data() + t * 256;
      for (int64_t i = i0; i < i1; ++i) {
        const int64_t pos = h[(ka[i] >> shift) & 0xff]++;
        kb[pos] = ka[i];
        ib[pos] = ia[i];
      }
    }
    K* kt = ka; ka = kb; kb = kt;
    int32_t* it = ia; ia = ib; ib = it;
  }
  if (ia != out)
    memcpy(out, ia, static_cast<size_t>(n) * sizeof(int32_t));
}

}  // namespace

extern "C" void argsort_f32(const float* keys, int64_t n, int32_t* out) {
  if (n <= 0) return;
  std::vector<uint32_t> u(static_cast<size_t>(n));
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < n; ++i) u[static_cast<size_t>(i)] = key_u32(keys[i]);
  radix_argsort<uint32_t>(u.data(), n, out);
}

extern "C" void argsort_f64(const double* keys, int64_t n, int32_t* out) {
  if (n <= 0) return;
  std::vector<uint64_t> u(static_cast<size_t>(n));
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < n; ++i) u[static_cast<size_t>(i)] = key_u64(keys[i]);
  radix_argsort<uint64_t>(u.data(), n, out);
}
