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
import os
import sys
import time

import numpy as np


BASELINE_BEST_S = 0.07  # Rust, the fastest reference (README.md:183)


def _wait_for_device(budget_s: float) -> bool:
    """Pre-flight health gate: a fresh-shape matmul with a forced readback,
    probed in a SUBPROCESS under a timeout. A TPU worker recovering from a
    crash or a post-big-job stall hangs transfers uninterruptibly for
    minutes (CLAUDE.md), and new compiles fail — an in-process first touch
    would wedge bench.py with no way to retry. The subprocess keeps this
    process in control; fresh shapes defeat program caching so the probe
    exercises a real compile+run. Retries until the backend answers or the
    budget (BENCH_PROBE_BUDGET_S, default 20 min) runs out."""
    import random
    import subprocess

    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        attempt += 1
        n = 517 + random.randrange(256)
        code = (
            # JAX_PLATFORMS alone does NOT override a registered plugin
            # backend (CLAUDE.md); apply it via config so CPU test runs of
            # bench.py probe the backend they will actually use.
            "import os\n"
            "plat = os.environ.get('JAX_PLATFORMS')\n"
            "import jax\n"
            "if plat: jax.config.update('jax_platforms', plat)\n"
            "import numpy as np, jax.numpy as jnp\n"
            f"x = jnp.ones(({n}, 331), jnp.float32)\n"
            "print(np.asarray(x @ x.T).shape)\n"
        )
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], timeout=240,
                capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() > deadline:
            return False
        print(
            f"bench: device probe {attempt} failed; retrying in 60 s",
            file=sys.stderr, flush=True,
        )
        time.sleep(60)


def main():
    if not _wait_for_device(float(os.environ.get(
            "BENCH_PROBE_BUDGET_S", "1200"))):
        print(
            "bench: device did not answer a fresh-shape probe within the "
            "budget (worker stalled or recovering); no measurement taken.",
            file=sys.stderr, flush=True,
        )
        return 1
    plat = os.environ.get("JAX_PLATFORMS")
    import jax

    if plat:  # see probe note: the env var alone cannot override a plugin
        jax.config.update("jax_platforms", plat)
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

    # Tunnel floor: dispatch+fetch latency of a trivial cached program in
    # the SAME session as the headline (audit_small_path.py methodology).
    # Every capture thereby self-reports its transport overhead — a number
    # measured in a different session cannot be mislabeled as this capture's
    # (round-4 verdict item 1: session drift must be quantifiable from the
    # artifact alone). The algorithm's device time is roughly
    # value - tunnel_floor_s.
    tiny = jax.jit(lambda x: (x * 2.0).sum())
    xd = jax.device_put(jnp.ones((8, 8), jnp.float32))
    np.asarray(tiny(xd))  # compile
    floors = []
    for rep in range(9):
        xi = jax.block_until_ready(xd + np.float32(rep))
        t0 = time.perf_counter()
        np.asarray(tiny(xi))
        floors.append(time.perf_counter() - t0)

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

    # Median of 9 plus spread: the driver parses the required four fields;
    # min/max/n make a single lucky sample impossible to quote as the
    # headline (round-3 verdict: a best-of-jitter 35.5 ms drifted into the
    # docs while the captured median was 44 ms — the spread keeps everyone
    # honest).
    print(
        json.dumps(
            {
                "metric": "dragon_registration_wall_time",
                "value": round(value, 4),
                "unit": "s",
                "vs_baseline": round(BASELINE_BEST_S / value, 3),
                "n_repeats": len(times),
                "min": round(float(np.min(times)), 4),
                "max": round(float(np.max(times)), 4),
                # 6 decimals: a local backend's floor is tens of
                # microseconds and must not round to 0.0
                "tunnel_floor_s": round(float(np.median(floors)), 6),
                "tunnel_floor_min": round(float(np.min(floors)), 6),
                "tunnel_floor_max": round(float(np.max(floors)), 6),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
