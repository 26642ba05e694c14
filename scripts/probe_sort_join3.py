"""Part 3 of the TPU primitive probes: the dense-cell_start gate design's
building blocks — scatter-add histogram, cumsum over the key space, direct
gathers, slab vs element candidate gathers, and searchsorted for reference.
"""

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
    n_r, n_q = 12_500_000, 12_500_000
    K = 1 << 22  # 4M cells

    # ---- scatter-add histogram (12.5M keys into 4M cells) -------------
    def mk_h(r):
        keys = jnp.asarray(rng.integers(0, K, n_r, dtype=np.int32))
        return (keys,)

    @jax.jit
    def hist(keys):
        return jnp.zeros(K, jnp.int32).at[keys].add(1)

    t = timed(hist, mk_h)
    print(f"scatter-add {n_r} -> {K}: {t:.3f}s", flush=True)

    # ---- cumsum over the key space ------------------------------------
    def mk_c(r):
        return (jnp.asarray(rng.integers(0, 30, K, dtype=np.int32)),)

    t = timed(jax.jit(lambda c: jnp.cumsum(c)), mk_c)
    print(f"cumsum {K}: {t:.3f}s", flush=True)

    # ---- direct int32 gathers (cell_start lookups): 18 per query ------
    def mk_l(r):
        table = jnp.asarray(rng.integers(0, n_r, K + 1, dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, K, (n_q, 9), dtype=np.int32))
        return table, idx

    @jax.jit
    def lookups(table, idx):
        return table[idx].sum(axis=1) + table[idx + 1].sum(axis=1)

    t = timed(lookups, mk_l)
    print(f"18 direct gathers x {n_q}: {t:.3f}s", flush=True)

    # ---- element vs slab candidate gather -----------------------------
    for cap in (32, 64):
        def mk_g(r, cap=cap):
            pts = jnp.asarray(rng.standard_normal((n_r, 3)).astype(np.float32))
            starts = jnp.asarray(
                rng.integers(0, n_r - cap, n_q, dtype=np.int32)
            )
            return pts, starts

        @jax.jit
        def elem_gather(pts, starts, cap=cap):
            pos = starts[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
            cand = pts[pos]
            return jnp.sum(cand, axis=(1, 2))

        @jax.jit
        def slab_gather(pts, starts, cap=cap):
            def one(s):
                return lax.dynamic_slice(pts, (s, 0), (cap, 3))
            cand = jax.vmap(one)(starts)
            return jnp.sum(cand, axis=(1, 2))

        t = timed(elem_gather, mk_g)
        print(f"element gather {n_q}x{cap}x3: {t:.3f}s", flush=True)
        t = timed(slab_gather, mk_g)
        print(f"slab gather {n_q}x{cap}x3: {t:.3f}s", flush=True)

    # ---- searchsorted for reference -----------------------------------
    def mk_s(r):
        refs = jnp.asarray(np.sort(rng.integers(0, 1 << 30, n_r, dtype=np.int32)))
        q = jnp.asarray(rng.integers(0, 1 << 30, n_q, dtype=np.int32))
        return refs, q

    t = timed(jax.jit(lambda refs, q: jnp.searchsorted(refs, q)), mk_s)
    print(f"searchsorted {n_q} probes into {n_r}: {t:.3f}s", flush=True)


if __name__ == "__main__":
    main()
