#!/usr/bin/env python
"""Execute the sharded (shard_map) engine on real TPU silicon over the
available mesh (1 chip in this environment) and compare against the
single-chip engine — proves the SPMD program, its collectives lowering,
and (round 5) the prepared-fixed-map path on hardware, not just the
virtual CPU mesh. (Round 4's equivalent run: sharded_tpu_r4.json.)

Cases:
  default          — ungated dragon, brute matcher;
  prepared         — same config consuming a prepare_fixed preparation
                     (replicated to the mesh, SPMD prologue skipped);
  gated_ring       — bunny-radius overlap gate, ring collective;
  gated_allgather  — same gate, all-gather collective.

Each case reports wall seconds (readback-forced perturbed warm repeats,
per-rep list, health probe before each — the CLAUDE.md degraded-window
rule) and max |H| difference vs the single-chip icp_register run on the
IDENTICAL input (the compile-pass run — comparing a perturbed run would
contaminate the engine-parity figure with the input perturbation, which
sits at exactly the f32-roundoff scale the figure certifies).
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
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--probe-timeout", type=float, default=120.0)
    ap.add_argument("--probe-budget", type=float, default=1200.0)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from simpleicp_tpu import IcpConfig, icp_register, prepare_fixed
    from simpleicp_tpu.parallel import icp_register_sharded, make_mesh
    from simpleicp_tpu.utils.xyz_io import read_xyz

    X_fix = np.asarray(read_xyz(f"{DATA}/dragon1.xyz"), np.float32)
    X_mov = np.asarray(read_xyz(f"{DATA}/dragon2.xyz"), np.float32)
    mesh = make_mesh()
    ndev = int(np.prod(mesh.devices.shape))

    cfg_plain = IcpConfig()
    prep = prepare_fixed(X_fix, cfg_plain, dtype=jnp.float32)
    cases = {
        "default": (cfg_plain, {}),
        "prepared": (cfg_plain, {"fixed_prep": prep}),
        "gated_ring": (IcpConfig(max_overlap_distance=1.0,
                                 gate_collective="ring"), {}),
        "gated_allgather": (IcpConfig(max_overlap_distance=1.0,
                                      gate_collective="allgather"), {}),
    }

    from simpleicp_tpu.utils.device_policy import probe_until_healthy

    out = {"backend": jax.default_backend(), "mesh_devices": ndev,
           "cases": {}}
    for tag, (cfg, kw) in cases.items():
        probe_until_healthy(args.probe_timeout, args.probe_budget)
        ref = icp_register(X_fix, X_mov, cfg, dtype=jnp.float32)
        H_ref = np.asarray(ref.H)
        r = icp_register_sharded(X_fix, X_mov, cfg, mesh=mesh,
                                 dtype=jnp.float32, **kw)  # compile
        # engine parity on the IDENTICAL input (the whole point of the
        # artifact); the timed repeats below perturb and measure wall only
        H_same = np.asarray(r.H)
        times = []
        for i in range(args.repeats):
            probe_until_healthy(args.probe_timeout, args.probe_budget)
            Xm_i = X_mov + np.float32((i + 1) * 1e-7)
            t0 = time.perf_counter()
            r = icp_register_sharded(X_fix, Xm_i, cfg, mesh=mesh,
                                     dtype=jnp.float32, **kw)
            np.asarray(r.H)
            times.append(round(time.perf_counter() - t0, 4))
        out["cases"][tag] = {
            "seconds_all": times,
            "seconds_median": round(float(np.median(times)), 4),
            "iterations": int(r.n_iterations),
            "err": int(r.error_code),
            "max_H_diff_vs_single": float(np.abs(H_same - H_ref).max()),
        }
        print(tag, json.dumps(out["cases"][tag]), flush=True)
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
