"""Benchmark: full dragon registration (100k vs 100k points, default params)
on one chip, end-to-end algorithm time — directly comparable to the
reference's `Finished in N.NNN seconds!` contract
(/root/reference/scripts/benchmark.sh:45-51; baseline numbers in BASELINE.md:
C++ 0.11 s, Rust 0.07 s, Python 1.86 s on the author's PC).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline = reference_best_seconds / our_seconds (>1 means faster than the
fastest reference implementation).
"""

import json
import sys
import time

import numpy as np


BASELINE_BEST_S = 0.07  # Rust, the fastest reference (README.md:183)


def main():
    import jax
    import jax.numpy as jnp

    from simpleicp_tpu import IcpConfig, icp_register
    from simpleicp_tpu.utils.xyz_io import read_xyz

    # Clouds resident on device before timing: the reference numbers assume
    # data already in RAM (file I/O excluded); the HBM analog is device
    # residency. The axon tunnel's ~30 ms/transfer latency is a test-harness
    # artifact, not part of the algorithm.
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    X_fix = jnp.asarray(read_xyz("/root/reference/data/dragon1.xyz"), dtype)
    X_mov = jnp.asarray(read_xyz("/root/reference/data/dragon2.xyz"), dtype)
    jax.block_until_ready((X_fix, X_mov))
    cfg = IcpConfig()

    # Compile once (the reference baseline numbers exclude startup; ours
    # exclude compilation the same way).
    res = icp_register(X_fix, X_mov, cfg)
    np.asarray(res.H)
    assert int(res.error_code) == 0 and bool(res.converged), "dragon must converge"

    # Timing methodology (CLAUDE.md / BENCHMARKS.md): vary inputs between
    # repeats (a fresh 1e-7 jitter of the movable cloud per run defeats any
    # result caching while leaving convergence behavior unchanged) and force a
    # host readback of H — `block_until_ready` alone can report optimistically
    # for some programs through the tunnel.
    rng = np.random.default_rng(0)
    jitters = [
        jax.block_until_ready(
            X_mov + jnp.asarray(rng.uniform(-1e-7, 1e-7, (1, 3)), dtype)
        )
        for _ in range(9)  # median of 9: the ~32 ms tunnel roundtrip
        # jitters by +/-10-15 ms run to run; more repeats stabilize the
        # median against latency spikes
    ]
    times = []
    for X_mov_i in jitters:
        t0 = time.perf_counter()
        res = icp_register(X_fix, X_mov_i, cfg)
        np.asarray(res.H)
        times.append(time.perf_counter() - t0)
    value = float(np.median(times))
    assert int(res.error_code) == 0 and bool(res.converged)

    print(
        json.dumps(
            {
                "metric": "dragon_registration_wall_time",
                "value": round(value, 4),
                "unit": "s",
                "vs_baseline": round(BASELINE_BEST_S / value, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
