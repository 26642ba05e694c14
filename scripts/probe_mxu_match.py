#!/usr/bin/env python
"""Feasibility probe for an MXU-prefiltered exact match (NEXT.md item 2).

The big-C headline is bound by 7 x 5.54 s brute 1-NN sweeps at the VPU's
2.26e11 pairs/s. An MXU route computes the cross-term q.r via bf16 matmul
(197 TFLOPs) and reduces argmin over -2*q.r + |r|^2 per tile on the VPU —
the question is whether the per-pair VPU work left over (one add + running
min) is enough cheaper than the current 8-ish ops/pair to matter, BEFORE
designing the exactness certificate around it. This measures the candidate
kernel's raw throughput at the headline shape (no certificate, no refine —
feasibility only; the product kernel would add a top-K + exact f32 refine).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from simpleicp_tpu.utils.xyz_io import read_xyz
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_bigc import tile_cloud

    N = int(float(sys.argv[1])) if len(sys.argv) > 1 else 12_500_000
    C = 100_000
    X1 = jnp.asarray(read_xyz("/root/reference/data/dragon1.xyz"), jnp.float32)
    ext = float(jnp.max(X1[:, 0]) - jnp.min(X1[:, 0]))
    Xf = jax.block_until_ready(tile_cloud(X1, N, ext * 1.05))
    Q = Xf[:: N // C][:C]
    print(f"N={N} C={C} backend={jax.default_backend()}", flush=True)

    RT = 1 << 16

    QT = 2048

    @functools.partial(jax.jit, static_argnames=())
    def mxu_min(Qf, refs):
        # pad refs to a tile multiple; queries swept in QT chunks like the
        # VPU kernel (a full (C, RT) distance block would be 26 GB)
        n = refs.shape[0]
        n_pad = -(-n // RT) * RT
        refs_p = jnp.pad(refs, ((0, n_pad - n), (0, 0)),
                         constant_values=1e15)
        tiles = refs_p.reshape(-1, RT, 3)
        tiles_b = tiles.astype(jnp.bfloat16)
        r2_all = jnp.sum(tiles * tiles, axis=2)  # f32 (ntile, RT)
        nq = Qf.shape[0]
        q_pad = (-nq) % QT
        q_chunks = jnp.pad(Qf, ((0, q_pad), (0, 0))).reshape(-1, QT, 3)

        def chunk_fn(Qc):
            Qb = Qc.astype(jnp.bfloat16)

            def step(carry, xs):
                tile_b, r2, base = xs
                best_d, best_i = carry
                # MXU: cross-term (QT, RT) in one matmul
                cross = jax.lax.dot_general(
                    Qb, tile_b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                d2 = r2[None, :] - 2.0 * cross  # |q|^2 const per row: skip
                i = jnp.argmin(d2, axis=1)
                dmin = jnp.take_along_axis(d2, i[:, None], 1)[:, 0]
                take = dmin < best_d
                best_d = jnp.where(take, dmin, best_d)
                best_i = jnp.where(take, base + i.astype(jnp.int32), best_i)
                return (best_d, best_i), None

            ntile = tiles_b.shape[0]
            bases = jnp.arange(ntile, dtype=jnp.int32) * RT
            init = (jnp.full((QT,), jnp.inf, jnp.float32),
                    jnp.zeros((QT,), jnp.int32))
            (d, idx), _ = lax.scan(step, init, (tiles_b, r2_all, bases))
            return d, idx

        d, idx = lax.map(chunk_fn, q_chunks)
        return d.reshape(-1)[:nq], idx.reshape(-1)[:nq]

    # correctness sanity + timing
    from simpleicp_tpu.ops.knn import nn_search

    nn_j = jax.jit(lambda q, r: nn_search(q, r, ref_tile=RT, query_tile=2048))

    for tag, fn in (("mxu bf16 prefilter", mxu_min), ("vpu exact sweep", nn_j)):
        ts = []
        for rep in range(3):
            Qi = Q + jnp.float32(1e-6 * rep)
            t0 = time.perf_counter()
            d, i = fn(Qi, Xf)
            np.asarray(d[:1])
            dt = time.perf_counter() - t0
            if rep:
                ts.append(dt)
        med = float(np.median(ts))
        print(f"{tag:24s} {med:7.3f} s  -> {C * N / med:.3e} pairs/s",
              flush=True)
        if tag.startswith("mxu"):
            d_m, i_m = fn(Q, Xf)
        else:
            d_v, i_v = fn(Q, Xf)
    agree = float(np.mean(np.asarray(i_m) == np.asarray(i_v)))
    print(f"bf16-argmin == exact-argmin agreement: {agree:.4f} "
          "(product kernel would top-K + refine + certify)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
