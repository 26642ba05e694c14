"""Part 2 of the TPU primitive probes (probe_sort_join.py timed out in the
slow multi-key sort): bitonic merge, scatter, slab vs element gather,
searchsorted."""

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


def bitonic_merge_2key(ka, pa, kb, pb):
    k = jnp.concatenate([ka, kb[::-1]])
    p = jnp.concatenate([pa, pb[::-1]])
    L = k.shape[0]
    s = L // 2
    while s >= 1:
        k2 = k.reshape(-1, 2, s)
        p2 = p.reshape(-1, 2, s)
        a_k, b_k = k2[:, 0], k2[:, 1]
        a_p, b_p = p2[:, 0], p2[:, 1]
        le = a_k <= b_k
        lo_k = jnp.where(le, a_k, b_k)
        hi_k = jnp.where(le, b_k, a_k)
        lo_p = jnp.where(le, a_p, b_p)
        hi_p = jnp.where(le, b_p, a_p)
        k = jnp.stack([lo_k, hi_k], axis=1).reshape(L)
        p = jnp.stack([lo_p, hi_p], axis=1).reshape(L)
        s //= 2
    return k, p


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # ---- bitonic merge 12.5M + 25M -> L=64M (pad) ---------------------
    na, nb = 12_500_000, 25_000_000
    L = 1 << int(np.ceil(np.log2(na + nb)))
    pad = L - na - nb

    def mkm(r):
        ka = jnp.asarray(np.sort(rng.integers(0, 1 << 30, na, dtype=np.int32)))
        kb = np.sort(rng.integers(0, 1 << 30, nb, dtype=np.int32))
        kb = jnp.asarray(
            np.concatenate([kb, np.full(pad, np.iinfo(np.int32).max, np.int32)])
        )
        pa = jnp.arange(na, dtype=jnp.int32)
        pb = jnp.arange(nb + pad, dtype=jnp.int32)
        return ka, pa, kb, pb

    t = timed(jax.jit(bitonic_merge_2key), mkm)
    print(f"bitonic merge {na}+{nb} (L={L}): {t:.3f}s", flush=True)

    # ---- cumsum + scatter (merge postprocessing shape) ----------------
    n = 1 << 26

    def mks(r):
        f = jnp.asarray(rng.integers(0, 2, n, dtype=np.int32))
        s = jnp.asarray(rng.permutation(n).astype(np.int32))
        return f, s

    @jax.jit
    def cum_scatter(f, s):
        cp = jnp.cumsum(f)
        vals = jnp.arange(n, dtype=jnp.int32) - cp
        tgt = jnp.where(f == 1, s % (n // 2), n)  # drop half
        out = jnp.zeros(n // 2, jnp.int32).at[tgt].set(vals, mode="drop")
        return out

    t = timed(cum_scatter, mks)
    print(f"cumsum+scatter n={n}: {t:.3f}s", flush=True)

    # ---- element vs slab gather ---------------------------------------
    n_r, n_q, cap = 12_500_000, 12_500_000, 32

    def mk_g(r):
        pts = jnp.asarray(rng.standard_normal((n_r, 3)).astype(np.float32))
        starts = jnp.asarray(rng.integers(0, n_r - cap, n_q, dtype=np.int32))
        return pts, starts

    @jax.jit
    def elem_gather(pts, starts):
        pos = starts[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
        cand = pts[pos]
        return jnp.sum(cand, axis=(1, 2))

    @jax.jit
    def slab_gather(pts, starts):
        def one(s):
            return lax.dynamic_slice(pts, (s, 0), (cap, 3))
        cand = jax.vmap(one)(starts)
        return jnp.sum(cand, axis=(1, 2))

    t = timed(elem_gather, mk_g)
    print(f"element gather {n_q}x{cap}x3: {t:.3f}s", flush=True)
    t = timed(slab_gather, mk_g)
    print(f"slab gather {n_q}x{cap}x3: {t:.3f}s", flush=True)

    # ---- planar (col-major) slab gather: pts stored as (3, n) ----------
    def mk_gp(r):
        pts = jnp.asarray(rng.standard_normal((3, n_r)).astype(np.float32))
        starts = jnp.asarray(rng.integers(0, n_r - cap, n_q, dtype=np.int32))
        return pts, starts

    @jax.jit
    def slab_gather_planar(pts, starts):
        def one(s):
            return lax.dynamic_slice(pts, (0, s), (3, cap))
        cand = jax.vmap(one)(starts)
        return jnp.sum(cand, axis=(1, 2))

    t = timed(slab_gather_planar, mk_gp)
    print(f"planar slab gather {n_q}x3x{cap}: {t:.3f}s", flush=True)

    # ---- searchsorted baseline ----------------------------------------
    def mk_s(r):
        refs = jnp.asarray(np.sort(rng.integers(0, 1 << 30, n_r, dtype=np.int32)))
        q = jnp.asarray(rng.integers(0, 1 << 30, n_q, dtype=np.int32))
        return refs, q

    t = timed(jax.jit(lambda refs, q: jnp.searchsorted(refs, q)), mk_s)
    print(f"searchsorted {n_q} probes into {n_r}: {t:.3f}s", flush=True)


if __name__ == "__main__":
    main()
