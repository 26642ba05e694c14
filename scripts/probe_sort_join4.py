"""Part 4: slab-gather variants (chunked so candidates never materialize in
full), vs the measured 9.16 s element gather at 12.5M x 32 x 3."""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, make_args, reps=2):
    args = make_args(0)
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for r in range(1, reps + 1):
        args = make_args(r)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    n_r, cap, chunk = 12_500_000, 32, 1 << 16
    n_q = (12_500_000 // chunk) * chunk  # 12.45M, chunk-aligned

    # row-major points (n, 3), slab (cap, 3)
    def mk_row(r):
        pts = jnp.asarray(rng.standard_normal((n_r, 3)).astype(np.float32))
        starts = jnp.asarray(
            rng.integers(0, n_r - cap, n_q, dtype=np.int32).reshape(-1, chunk)
        )
        return pts, starts

    @jax.jit
    def slab_row(pts, starts):
        def chunk_fn(s_chunk):
            def one(s):
                return lax.dynamic_slice(pts, (s, 0), (cap, 3))
            cand = jax.vmap(one)(s_chunk)  # (chunk, cap, 3)
            return jnp.sum(cand, axis=(1, 2))
        return lax.map(chunk_fn, starts)

    t = timed(slab_row, mk_row)
    print(f"slab row-major {n_q}x{cap}x3 (chunked): {t:.3f}s", flush=True)

    # planar points (3, n), slab (3, cap) — minor dim cap, lane-friendly
    def mk_pl(r):
        pts = jnp.asarray(rng.standard_normal((3, n_r)).astype(np.float32))
        starts = jnp.asarray(
            rng.integers(0, n_r - cap, n_q, dtype=np.int32).reshape(-1, chunk)
        )
        return pts, starts

    @jax.jit
    def slab_planar(pts, starts):
        def chunk_fn(s_chunk):
            def one(s):
                return lax.dynamic_slice(pts, (0, s), (3, cap))
            cand = jax.vmap(one)(s_chunk)  # (chunk, 3, cap)
            return jnp.sum(cand, axis=(1, 2))
        return lax.map(chunk_fn, starts)

    t = timed(slab_planar, mk_pl)
    print(f"slab planar {n_q}x3x{cap} (chunked): {t:.3f}s", flush=True)

    # element gather, chunked, planar: per-coordinate 1-D element gathers
    def mk_el(r):
        pts = jnp.asarray(rng.standard_normal((3, n_r)).astype(np.float32))
        starts = jnp.asarray(
            rng.integers(0, n_r - cap, n_q, dtype=np.int32).reshape(-1, chunk)
        )
        return pts, starts

    @jax.jit
    def elem_planar(pts, starts):
        offs = jnp.arange(cap, dtype=jnp.int32)
        def chunk_fn(s_chunk):
            pos = s_chunk[:, None] + offs[None, :]
            x = pts[0][pos]
            y = pts[1][pos]
            z = pts[2][pos]
            return jnp.sum(x + y + z, axis=1)
        return lax.map(chunk_fn, starts)

    t = timed(elem_planar, mk_el)
    print(f"elem planar 1-D {n_q}x{cap} x3coords (chunked): {t:.3f}s", flush=True)

    # one-hot matmul gather: candidates via MXU? (chunk x n_window) too big;
    # skip. Instead: measure a single big 1-D element gather for scale.
    def mk_1d(r):
        v = jnp.asarray(rng.standard_normal(n_r).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, n_r, n_q * 4, dtype=np.int32))
        return v, idx

    t = timed(jax.jit(lambda v, i: v[i].sum()), mk_1d)
    print(f"1-D element gather {n_q * 4}: {t:.3f}s", flush=True)


if __name__ == "__main__":
    main()
