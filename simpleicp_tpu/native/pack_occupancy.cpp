// Native occupancy packer (runtime component of ops/dilate_gate.py).
//
// Bins n points into the dilate gate's packed word grid and ORs their
// occupancy bits: one pass, multithreaded, atomic OR per word. This is the
// one step of the gate no accelerator primitive covers (there is no
// scatter-OR), and numpy's np.bitwise_or.at is a serial ~60M updates/s
// ufunc loop — at the 50M-point scale that is seconds of pure host time.
//
// Binning MUST replicate the device arithmetic bit for bit:
//     k = floor((p - origin) * inv_cell)   in the cloud's own dtype,
// then clip into the (bordered) grid — see dilate_gate.pack_occupancy.
// The build disables FP contraction so the sub-then-mul sequence rounds
// exactly like XLA's and numpy's (no FMA fusion).
//
// Word layout is z-major: word_index = (kz>>5)*(dx*dy) + kx*dy + ky,
// bit = kz & 31 (TPU tile padding dictated the layout; keep in sync with
// dilate_gate.pack_occupancy / _classify_packed).
//
// Exposed C ABI (ctypes, native/__init__.py):
//   void pack_occupancy_f32(const float*  X, int64_t n, const float  o[3],
//       float  inv, int64_t dx, int64_t dy, int64_t dz, int64_t wz,
//       uint32_t* grid);
//   void pack_occupancy_f64(const double* X, int64_t n, const double o[3],
//       double inv, int64_t dx, int64_t dy, int64_t dz, int64_t wz,
//       uint32_t* grid);
// `grid` has wz*dx*dy words and must be zero-initialized by the caller.

#include <cmath>
#include <cstdint>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

template <typename T>
inline int64_t bin1(T v, T origin, T inv, int64_t dim) {
  T cell = std::floor((v - origin) * inv);
  // Clip exactly like np.clip on the int64 key: values are small enough
  // that the T->int64 cast is exact after clipping against dim-1.
  if (!(cell > T(0))) return 0;  // also catches NaN
  if (cell >= T(dim - 1)) return dim - 1;
  return static_cast<int64_t>(cell);
}

template <typename T>
void pack_occupancy(const T* X, int64_t n, const T* origin, T inv,
                    int64_t dx, int64_t dy, int64_t dz, uint32_t* grid) {
  const int64_t plane = dx * dy;
  const T ox = origin[0], oy = origin[1], oz = origin[2];
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < n; ++i) {
    const int64_t kx = bin1(X[3 * i + 0], ox, inv, dx);
    const int64_t ky = bin1(X[3 * i + 1], oy, inv, dy);
    const int64_t kz = bin1(X[3 * i + 2], oz, inv, dz);
    const int64_t w = (kz >> 5) * plane + kx * dy + ky;
    const uint32_t bit = uint32_t(1) << (kz & 31);
    __atomic_fetch_or(&grid[w], bit, __ATOMIC_RELAXED);
  }
}

}  // namespace

extern "C" {

void pack_occupancy_f32(const float* X, int64_t n, const float* origin,
                        float inv, int64_t dx, int64_t dy, int64_t dz,
                        int64_t wz, uint32_t* grid) {
  (void)wz;
  pack_occupancy<float>(X, n, origin, inv, dx, dy, dz, grid);
}

void pack_occupancy_f64(const double* X, int64_t n, const double* origin,
                        double inv, int64_t dx, int64_t dy, int64_t dz,
                        int64_t wz, uint32_t* grid) {
  (void)wz;
  pack_occupancy<double>(X, n, origin, inv, dx, dy, dz, grid);
}

}  // extern "C"
