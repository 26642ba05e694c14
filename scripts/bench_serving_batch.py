#!/usr/bin/env python
"""Serving throughput: pipelined single-pair dispatch vs the vmapped batch
API (`icp_register_batch` — one XLA program registers B pairs).

Round 4 measured the pipelined path at 62 dragon registrations/s (tunnel
amortized across 8 back-to-back launches, one readback). The batch API
should beat it: one launch has ONE enqueue and lets XLA fuse across the
batch dimension, so per-pair cost approaches pure device time (dragon
9.47 ms/registration measured by the round-5 profiler — a ~105/s
device-bound ceiling for unbatched dispatch).

Methodology per CLAUDE.md: device-resident inputs, compile pass first,
perturbed repeats, forced readback of every H in the batch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/root/reference/data"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="dragon",
                    choices=["dragon", "bunny"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=7)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from simpleicp_tpu import IcpConfig
    from simpleicp_tpu.models.icp import icp_register, icp_register_batch
    from simpleicp_tpu.utils.xyz_io import read_xyz

    if args.dataset == "dragon":
        f1, f2, kw = "dragon1.xyz", "dragon2.xyz", {}
    else:
        f1, f2, kw = "bunny_part1.xyz", "bunny_part2.xyz", {
            "max_overlap_distance": 1.0}
    X_fix = jnp.asarray(read_xyz(f"{DATA}/{f1}"), jnp.float32)
    X_mov = jnp.asarray(read_xyz(f"{DATA}/{f2}"), jnp.float32)
    jax.block_until_ready((X_fix, X_mov))
    B = args.batch
    cfg = IcpConfig(**kw)

    # batched inputs: B independent perturbations of the same pair (each
    # batch lane converges independently; fresh values defeat caching)
    rng = np.random.default_rng(0)

    def make_batch(i):
        offs = jnp.asarray(
            rng.uniform(-1e-7, 1e-7, (B, 1, 3)) + i * 1e-9, jnp.float32)
        Xf_b = jnp.broadcast_to(X_fix, (B,) + X_fix.shape)
        Xm_b = X_mov[None] + offs
        return jax.block_until_ready(Xf_b), jax.block_until_ready(Xm_b)

    out = {"dataset": args.dataset, "batch": B,
           "backend": jax.default_backend()}

    # ---- batch API: one program, B registrations ----
    Xf_b, Xm_b = make_batch(0)
    res = icp_register_batch(Xf_b, Xm_b, cfg)  # compile
    np.asarray(res.H)
    assert int(np.asarray(res.error_code).max()) == 0
    times = []
    for i in range(1, args.repeats + 1):
        Xf_b, Xm_b = make_batch(i)
        t0 = time.perf_counter()
        r = icp_register_batch(Xf_b, Xm_b, cfg)
        np.asarray(r.H)  # forced readback of all B transforms
        times.append(time.perf_counter() - t0)
        # every timed result must be a real registration — a failed lane
        # would contribute a fast wall sample that registered nothing
        assert int(np.asarray(r.error_code).max()) == 0, f"batch rep {i}"
    t_batch = float(np.median(times))
    out["batch_api"] = {
        "seconds_per_launch": round(t_batch, 4),
        "seconds_all": [round(t, 4) for t in times],
        "registrations_per_sec": round(B / t_batch, 1),
        # iteration counts of the LAST TIMED repeat (not the untimed
        # compile pass), so seconds and iterations describe the same runs
        "iterations": np.asarray(r.n_iterations).tolist(),
    }

    # ---- pipelined single-pair dispatch (round-4 comparator) ----
    res1 = icp_register(X_fix, X_mov, cfg)  # compile
    np.asarray(res1.H)
    times = []
    for i in range(args.repeats):
        Xms = [jax.block_until_ready(
            X_mov + jnp.asarray(rng.uniform(-1e-7, 1e-7, (1, 3)),
                                jnp.float32)) for _ in range(B)]
        t0 = time.perf_counter()
        rs = [icp_register(X_fix, Xm, cfg) for Xm in Xms]
        for r in rs:
            np.asarray(r.H)
        times.append(time.perf_counter() - t0)
        assert all(int(r.error_code) == 0 for r in rs), "pipelined rep"
    t_pipe = float(np.median(times))
    out["pipelined_single"] = {
        "seconds_per_batch": round(t_pipe, 4),
        "seconds_all": [round(t, 4) for t in times],
        "registrations_per_sec": round(B / t_pipe, 1),
    }
    out["batch_vs_pipelined"] = round(t_pipe / t_batch, 2)

    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
