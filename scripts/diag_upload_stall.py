#!/usr/bin/env python
"""Diagnose the post-registration host->device upload stall (NEXT.md #3).

Observed: an isolated upload of a 12.5M-point cloud runs at 1.2-1.5 GB/s
through the tunnel; the SAME upload right after a big gated registration
stalls to ~30-50 MB/s. This script reproduces the stall and A/B-tests
mitigations:

  a. plain re-upload (stall baseline)
  b. after dropping all result references + gc
  c. after a small dummy computation (lets the runtime drain queues)
  d. chunked upload (16 MB pieces, concatenated on device)
  e. after jax.clear_caches()

Usage: python scripts/diag_upload_stall.py [--n 12.5e6]
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from bench_gated_scale import tile_cloud  # noqa: E402

DATA = "/root/reference/data"


def timed_upload(jnp, jax, X, label):
    t0 = time.perf_counter()
    d = jax.block_until_ready(jnp.asarray(X))
    dt = time.perf_counter() - t0
    gbs = X.nbytes / dt / 1e9
    print(f"  upload[{label}]: {dt:.2f} s ({gbs:.2f} GB/s)", flush=True)
    return d, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", default="12.5e6")
    ap.add_argument("--radius", type=float, default=1.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from simpleicp_tpu import IcpConfig, icp_register
    from simpleicp_tpu.utils.xyz_io import read_xyz

    n = int(float(args.n))
    Xf = tile_cloud(read_xyz(f"{DATA}/dragon1.xyz"), n, 2.2)
    Xm = tile_cloud(read_xyz(f"{DATA}/dragon2.xyz"), n, 2.2)
    print(f"clouds: {n} points, {Xf.nbytes/1e9:.2f} GB each", flush=True)

    print("baseline (cold process):")
    Xf_d, _ = timed_upload(jnp, jax, Xf, "fixed, isolated")
    Xm_d, _ = timed_upload(jnp, jax, Xm, "movable, isolated")

    cfg = IcpConfig(max_overlap_distance=args.radius)
    t0 = time.perf_counter()
    res = icp_register(Xf_d, Xm_d, cfg)
    H = np.asarray(res.H)
    print(f"registration: {time.perf_counter()-t0:.1f} s "
          f"({int(res.n_iterations)} iters)", flush=True)

    print("a. immediately after registration:")
    _, dt_a = timed_upload(jnp, jax, Xm, "movable")

    print("b. after dropping result refs + gc:")
    del res, H
    gc.collect()
    _, dt_b = timed_upload(jnp, jax, Xm, "movable")

    print("c. after a dummy computation:")
    x = jnp.ones((256, 256), jnp.float32)
    jax.block_until_ready(x @ x)
    _, dt_c = timed_upload(jnp, jax, Xm, "movable")

    print("d. chunked (16 MB pieces + device concat):")
    t0 = time.perf_counter()
    rows = (16 << 20) // 12
    parts = [
        jax.block_until_ready(jnp.asarray(Xm[s:s + rows]))
        for s in range(0, Xm.shape[0], rows)
    ]
    whole = jax.block_until_ready(jnp.concatenate(parts, axis=0))
    dt = time.perf_counter() - t0
    print(f"  upload[chunked]: {dt:.2f} s ({Xm.nbytes/dt/1e9:.2f} GB/s)",
          flush=True)
    del parts, whole

    print("e. after jax.clear_caches():")
    jax.clear_caches()
    timed_upload(jnp, jax, Xm, "movable")


if __name__ == "__main__":
    main()
