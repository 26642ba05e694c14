"""TPU primitive cost probes for the sort-join grid gate redesign (round 2).

Measures, on the real chip, the building blocks the merge-join gate design
chooses between (NEXT.md round-1 analysis: searchsorted probes ~60% and
random candidate gathers ~40% of grid-gate time; both must go):

  1. lax.sort throughput: 1-key and multi-key at 12.5M..112M rows
  2. hand-rolled bitonic MERGE of two pre-sorted streams (log n stages
     vs the sort's log^2 n) at the same sizes
  3. candidate fetching: element gather (current) vs contiguous slab gather
     (vmapped dynamic_slice -> XLA gather with slice_sizes)
  4. searchsorted baseline for reference

Timing per CLAUDE.md rules: host readback of a small checksum, fresh inputs
per repeat, one process on the chip.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, make_args, reps=3):
    args = make_args(0)
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile + settle
    ts = []
    for r in range(1, reps + 1):
        args = make_args(r)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


# ---------------------------------------------------------------- bitonic merge
def bitonic_merge_2key(ka, pa, kb, pb):
    """Merge two ascending streams (key, payload) -> ascending. Lengths must
    sum to a power of two (pad with INT32_MAX keys beforehand)."""
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
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    results = {}

    # ---- 1. lax.sort throughput --------------------------------------
    for n in (12_500_000, 37_500_000, 112_500_000):
        def mk(r, n=n):
            k = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
            p = jnp.arange(n, dtype=jnp.int32)
            return k, p

        t = timed(
            jax.jit(lambda k, p: lax.sort((k, p), num_keys=1)), mk, reps=2
        )
        results[f"sort_1key_{n}"] = t
        print(f"sort 1key+1payload n={n}: {t:.3f}s", flush=True)

    n = 37_500_000
    def mk4(r):
        ks = [jnp.asarray(rng.integers(0, 1 << 12, n, dtype=np.int32))
              for _ in range(3)]
        f = jnp.asarray(rng.integers(0, 2, n, dtype=np.int32))
        p = jnp.arange(n, dtype=jnp.int32)
        return (*ks, f, p)

    t = timed(
        jax.jit(lambda a, b, c, f, p: lax.sort((a, b, c, f, p), num_keys=4)),
        mk4, reps=2,
    )
    results[f"sort_4key_{n}"] = t
    print(f"sort 4key+1payload n={n}: {t:.3f}s", flush=True)

    # ---- 2. bitonic merge of pre-sorted streams ----------------------
    for na, nb in ((12_500_000, 25_000_000), (48_000_000, 16_000_000)):
        L = 1 << int(np.ceil(np.log2(na + nb)))
        pad = L - na - nb

        def mkm(r, na=na, nb=nb, pad=pad):
            ka = jnp.asarray(
                np.sort(rng.integers(0, 1 << 30, na, dtype=np.int32))
            )
            kb = np.sort(rng.integers(0, 1 << 30, nb, dtype=np.int32))
            kb = jnp.asarray(
                np.concatenate([kb, np.full(pad, np.iinfo(np.int32).max, np.int32)])
            )
            pa = jnp.arange(na, dtype=jnp.int32)
            pb = jnp.arange(nb + pad, dtype=jnp.int32)
            return ka, pa, kb, pb

        t = timed(jax.jit(bitonic_merge_2key), mkm, reps=2)
        results[f"bitonic_merge_{na}_{nb}"] = t
        print(f"bitonic merge {na}+{nb} (L={L}): {t:.3f}s", flush=True)

    # ---- 3. candidate fetch: element gather vs slab gather -----------
    n_r, n_q, cap = 12_500_000, 12_500_000, 32

    def mk_g(r):
        pts = jnp.asarray(rng.standard_normal((n_r, 3), dtype=np.float32))
        starts = jnp.asarray(
            rng.integers(0, n_r - cap, n_q, dtype=np.int32)
        )
        return pts, starts

    @jax.jit
    def elem_gather(pts, starts):
        pos = starts[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
        cand = pts[pos]  # (n_q, cap, 3) element gather
        return jnp.sum(cand, axis=(1, 2))

    @jax.jit
    def slab_gather(pts, starts):
        def one(s):
            return lax.dynamic_slice(pts, (s, 0), (cap, 3))
        cand = jax.vmap(one)(starts)
        return jnp.sum(cand, axis=(1, 2))

    t = timed(elem_gather, mk_g, reps=2)
    results["elem_gather"] = t
    print(f"element gather {n_q}x{cap}x3: {t:.3f}s", flush=True)
    t = timed(slab_gather, mk_g, reps=2)
    results["slab_gather"] = t
    print(f"slab gather {n_q}x{cap}x3: {t:.3f}s", flush=True)

    # ---- 4. searchsorted baseline ------------------------------------
    def mk_s(r):
        refs = jnp.asarray(
            np.sort(rng.integers(0, 1 << 30, n_r, dtype=np.int32))
        )
        q = jnp.asarray(rng.integers(0, 1 << 30, n_q, dtype=np.int32))
        return refs, q

    t = timed(
        jax.jit(lambda refs, q: jnp.searchsorted(refs, q)), mk_s, reps=2
    )
    results["searchsorted_1probe"] = t
    print(f"searchsorted {n_q} probes into {n_r}: {t:.3f}s", flush=True)

    print(results)


if __name__ == "__main__":
    main()
