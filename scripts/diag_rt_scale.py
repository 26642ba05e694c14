#!/usr/bin/env python
"""Sweep nn_search's ref_tile at multi-million-point ref clouds.

The in-loop matcher is a lax.scan over n_refs/ref_tile sequential tiles;
icp_register auto-scales ref_tile but caps it at 65536 (models/icp.py).
At 50M refs that is 763 sequential steps per match — if per-step overhead
still matters at that depth, a larger cap wins. This times the PRODUCTION
kernel (ops/knn.nn_search, transposed in-loop layout) with C=1000 queries,
8x-chained to amortize the ~32 ms tunnel roundtrip, inputs perturbed
between repeats.

Usage: python scripts/diag_rt_scale.py [--n 12.5e6,50e6] [--rts 65536,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from bench_gated_scale import tile_cloud  # noqa: E402

DATA = "/root/reference/data"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", default="12.5e6,50e6")
    ap.add_argument("--rts", default="65536,131072,262144,524288,1048576")
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from simpleicp_tpu.ops.knn import nn_search
    from simpleicp_tpu.utils.xyz_io import read_xyz

    X_mov0 = read_xyz(f"{DATA}/dragon2.xyz")
    extent = float(np.max(X_mov0[:, 0]) - np.min(X_mov0[:, 0]))
    C, chain = 1000, args.chain

    for n_s in args.n.split(","):
        n = int(float(n_s))
        Xm = jax.block_until_ready(
            jnp.asarray(tile_cloud(X_mov0, n, extent * 1.05), jnp.float32)
        )
        rng = np.random.default_rng(7)
        Q0 = jnp.asarray(
            rng.uniform(0, extent * 2, size=(C, 3)), jnp.float32
        )

        for rt_s in args.rts.split(","):
            rt = int(rt_s)

            @jax.jit
            def chained(q, Xm=Xm, rt=rt):
                # feed each match's argmin into the next query's offset so
                # the chain cannot be executed in parallel or elided
                def step(q, _):
                    d2, idx = nn_search(q, Xm, ref_tile=rt, query_tile=C,
                                        layout="tq")
                    q = q + (d2[:, None] * 0 + idx[0].astype(q.dtype) * 1e-12)
                    return q, idx[:4]
                q, outs = jax.lax.scan(step, q, None, length=chain)
                return outs

            np.asarray(chained(Q0))  # compile + warm
            times = []
            for i in range(3):
                Qi = jax.block_until_ready(Q0 + jnp.float32(1e-6 * (i + 1)))
                t0 = time.perf_counter()
                np.asarray(chained(Qi))
                times.append(time.perf_counter() - t0)
            med = float(np.median(times))
            print(json.dumps({
                "n_refs": n, "ref_tile": rt,
                "ms_per_match": round(1e3 * med / chain, 3),
                "pairs_per_sec": round(C * n * chain / med / 1e12, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
