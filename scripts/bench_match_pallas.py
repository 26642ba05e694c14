#!/usr/bin/env python
"""In-loop match step: lax scan kernel vs the fused transform+match Pallas
kernel, measured as 64 chained iterations (the while_loop shape) on TPU.

The lax path materializes the transformed movable cloud every iteration and
scans ref tiles; the Pallas kernel transforms reference lanes in VMEM from
the ORIGINAL planes (hoisted out of the loop) and keeps the running argmin
in scratch. Prints ms per 64-iteration chain.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

from simpleicp_tpu.ops.knn import nn_search
from simpleicp_tpu.ops.knn_pallas import match_transform_pallas, pad_ref_planes
from simpleicp_tpu.ops.transform import apply_H
from simpleicp_tpu.utils.xyz_io import read_xyz

REPS = 7
N_IT = 64


def timed(label, fn, variants):
    fn(variants[0])
    ts = []
    for i in range(REPS):
        v = variants[i % len(variants)]
        t0 = time.perf_counter()
        np.asarray(fn(v))
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"op": label, "ms": round(float(np.median(ts)) * 1e3, 3)}),
          flush=True)


def main():
    Xm = jnp.asarray(read_xyz("/root/reference/data/dragon2.xyz"), jnp.float32)
    Xf = jnp.asarray(read_xyz("/root/reference/data/dragon1.xyz"), jnp.float32)
    n = Xf.shape[0]
    C = 1000
    sel = np.round(np.linspace(0, n - 1, C)).astype(np.int32)
    Q0 = np.asarray(Xf)[sel]
    Qs = [jnp.asarray(Q0 + 1e-6 * (i + 1)) for i in range(3)]
    H0 = jnp.eye(4, dtype=jnp.float32)

    def chain_lax(rt):
        def run(q):
            def body(i, H):
                Xm_t = apply_H(Xm, H)
                _, idx = nn_search(q, Xm_t, ref_tile=rt, query_tile=1024)
                return H.at[0, 3].add(1e-12 * idx[0].astype(jnp.float32))
            return lax.fori_loop(0, N_IT, body, H0)
        return jax.jit(run)

    for rt in (16384, 32768, 65536):
        timed(f"64x lax rt={rt}", chain_lax(rt), Qs)

    for rt in (1024, 2048, 4096):
        def run_pallas(q, rt=rt):
            planes = pad_ref_planes(Xm, ref_tile=rt)

            def body(i, H):
                _, idx = match_transform_pallas(q, planes, H, ref_tile=rt)
                return H.at[0, 3].add(1e-12 * idx[0].astype(jnp.float32))
            return lax.fori_loop(0, N_IT, body, H0)
        timed(f"64x pallas rt={rt}", jax.jit(run_pallas), Qs)

    # cross-check argmin agreement on one H
    H = jnp.asarray(np.eye(4, dtype=np.float32))
    _, want = nn_search(Qs[0], apply_H(Xm, H), ref_tile=16384, query_tile=1024)
    planes = pad_ref_planes(Xm, ref_tile=2048)
    _, got = match_transform_pallas(Qs[0], planes, H, ref_tile=2048)
    agree = float(np.mean(np.asarray(want) == np.asarray(got)))
    print(json.dumps({"check": "argmin agreement", "frac": agree}), flush=True)


if __name__ == "__main__":
    main()
