#!/usr/bin/env python
"""Micro-benchmarks of the in-loop hot ops on the TPU (dragon shapes).

Targets the two dominant device-time items from the round-1 xplane profile
(NEXT.md): the per-iteration NN match (~1 ms/iter, ~8x above the VPU
roofline) and the normals-stage kNN (~5.8 ms). Sweeps tile shapes and kNN
strategies; prints one JSON line per variant.

Methodology per CLAUDE.md: vary inputs between repeats, force host
readback, median of repeats. Timings include one ~32 ms tunnel dispatch —
subtract the `null` row to read device time.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from simpleicp_tpu.ops.knn import knn_search, nn_search
from simpleicp_tpu.utils.xyz_io import read_xyz

DATA = "/root/reference/data"
REPS = 7


def timed(label, fn, variants):
    """fn(v) -> device array; variants: list of per-rep inputs."""
    fn(variants[0])  # compile
    ts = []
    for i in range(REPS):
        v = variants[i % len(variants)]
        t0 = time.perf_counter()
        np.asarray(fn(v))
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"op": label, "ms": round(float(np.median(ts)) * 1e3, 3)}),
          flush=True)


def main():
    Xf = jnp.asarray(read_xyz(f"{DATA}/dragon1.xyz"), jnp.float32)
    Xm = jnp.asarray(read_xyz(f"{DATA}/dragon2.xyz"), jnp.float32)
    n = Xf.shape[0]
    print(f"# dragon n={n}", flush=True)
    rng = np.random.default_rng(0)
    C = 1000

    sel = np.round(np.linspace(0, n - 1, C)).astype(np.int32)
    Q0 = np.asarray(Xf)[sel]
    Qs = [jnp.asarray(Q0 + 1e-6 * (i + 1)) for i in range(3)]

    timed("null (dispatch+readback)", lambda q: q[:4, 0], Qs)

    # ---- in-loop match: 1-NN of C selected vs full movable ----
    for qt in (256, 512, 1024, 2048):
        for rt in (4096, 16384, 65536):
            timed(
                f"match nn C={C} qt={qt} rt={rt}",
                lambda q, rt=rt, qt=qt: nn_search(
                    q, Xm, ref_tile=rt, query_tile=qt
                )[1],
                Qs,
            )

    # ---- normals kNN: k=10 of C selected vs full fixed ----
    for approx in (False, True):
        for rt in (4096, 16384, 65536):
            timed(
                f"knn k=10 rt={rt} approx={approx}",
                lambda q, rt=rt, a=approx: knn_search(
                    q, Xf, 10, ref_tile=rt, approx=a
                )[1],
                Qs,
            )

    # ---- batched-iteration probe: 8 sequential matches (the while_loop
    # pays this 7-9x per registration) ----
    def eight(q):
        def body(i, qq):
            _, idx = nn_search(qq, Xm, ref_tile=65536, query_tile=1024)
            return qq + 1e-9 * idx[:, None].astype(jnp.float32)
        return jax.lax.fori_loop(0, 8, body, q)

    eightj = jax.jit(eight)
    timed("8x match (loop, rt=65536 qt=1024)", eightj, Qs)


if __name__ == "__main__":
    main()
