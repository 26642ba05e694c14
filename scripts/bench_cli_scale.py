#!/usr/bin/env python
"""End-to-end CLI wall time at scale (round-4 verdict item 5).

Measures the FULL user flow the reference CLI is judged on — parse two xyz
files, register, write the transformed cloud — at 50M points per cloud,
through `python -m simpleicp_tpu` in a fresh process (so upload staging
runs in a cold-transfer window, the point of api.run's preload stage).

Generates the tiled-dragon 50M xyz inputs once (native writer) next to
--workdir and reuses them on later runs.

Usage: python scripts/bench_cli_scale.py [--n 50e6] [--workdir /root/cli_scale]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/root/reference/data"


# host-side tiler shared with the gated-scale bench (one tiling scheme for
# every synthetic-scale benchmark — divergence would silently change what
# the scale tables measure)
from bench_gated_scale import tile_cloud as tile_cloud_np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=float, default=50e6)
    ap.add_argument("--workdir", default="/root/cli_scale")
    ap.add_argument("--radius", type=float, default=1.0)
    ap.add_argument("--device", default="tpu")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from simpleicp_tpu.utils.xyz_io import read_xyz, write_xyz

    n = int(args.n)
    os.makedirs(args.workdir, exist_ok=True)
    f_fix = os.path.join(args.workdir, f"fix_{n}.xyz")
    f_mov = os.path.join(args.workdir, f"mov_{n}.xyz")
    gen = {}
    if not (os.path.exists(f_fix) and os.path.exists(f_mov)):
        X1 = read_xyz(f"{DATA}/dragon1.xyz")
        X2 = read_xyz(f"{DATA}/dragon2.xyz")
        spacing = float(X1[:, 0].max() - X1[:, 0].min()) * 1.05
        for path, X in ((f_fix, X1), (f_mov, X2)):
            t0 = time.perf_counter()
            write_xyz(path, tile_cloud_np(X, n, spacing), fmt="%.4f")
            gen[os.path.basename(path)] = round(time.perf_counter() - t0, 1)
        print(f"generated inputs: {gen}", flush=True)

    f_out = os.path.join(args.workdir, f"reg_{n}.xyz")
    cmd = [
        sys.executable, "-m", "simpleicp_tpu",
        "-f", f_fix, "-m", f_mov,
        "-o", str(args.radius),
        "--device", args.device,
        "--export", f_out,
    ]
    print("running:", " ".join(cmd), flush=True)
    env = dict(os.environ, SIMPLEICP_TPU_DEBUG_TIMING="1")
    t0 = time.perf_counter()
    r = subprocess.run(cmd, capture_output=True, text=True, env=env)
    wall = time.perf_counter() - t0
    sys.stdout.write(r.stdout[-4000:])
    sys.stderr.write(r.stderr[-2000:])
    if r.returncode != 0:
        print(f"CLI FAILED rc={r.returncode}", flush=True)
        return r.returncode

    m = re.search(r"Finished in ([0-9.]+) seconds", r.stdout + r.stderr)
    algo_s = float(m.group(1)) if m else None
    phases = re.findall(r"timing: (.+?) ([0-9.]+) s", r.stdout + r.stderr)
    res = {
        "phase_seconds": {k: float(v) for k, v in phases},
        "n_points_per_cloud": n,
        "cli_wall_seconds": round(wall, 1),
        "algorithm_seconds_reported": algo_s,
        "export_bytes": os.path.getsize(f_out) if os.path.exists(f_out) else 0,
        "generated_inputs_seconds": gen or "cached",
    }
    print(json.dumps(res), flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(res, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
