"""Real multi-process validation of the multi-host path.

Spawns TWO OS processes, each owning 4 virtual CPU devices, that perform the
`jax.distributed` handshake via `initialize_multihost`, load host-local
shards onto an 8-device global mesh (`make_array_from_process_local_data`
inside `icp_register_sharded`), and run a full sharded registration with
cross-process collectives. Both processes must produce identical replicated
results, matching the single-process engine.

The reference has no distributed concept; this validates the BASELINE.json
north-star path (fixed cloud sharded per host) without TPU hardware.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_registration(tmp_path):
    port = _free_port()
    out = str(tmp_path / "mh")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), "2", str(port), out],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=os.path.dirname(os.path.dirname(_WORKER)),  # repo root
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout.decode(errors="replace"))
    for i, (p, text) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {i} failed:\n{text[-4000:]}"
        assert f"WORKER_OK {i}" in text

    r0 = np.load(f"{out}.0.npz")
    r1 = np.load(f"{out}.1.npz")
    # both controllers hold the identical replicated result
    np.testing.assert_array_equal(r0["H"], r1["H"])
    np.testing.assert_array_equal(r0["iter_means"], r1["iter_means"])
    assert r0["n_iterations"] == r1["n_iterations"]
    assert bool(r0["converged"])

    # and it matches the single-process reference engine on the same scene
    from simpleicp_tpu import IcpConfig, icp_register

    rng = np.random.default_rng(7)
    n = 6000
    xy = rng.uniform(-2, 2, size=(n, 2))
    z = 0.3 * np.sin(2 * xy[:, 0]) + 0.2 * np.cos(3 * xy[:, 1])
    X_fix = np.column_stack([xy, z])
    a1, a2, a3 = 0.02, -0.015, 0.03
    t = np.array([0.05, -0.04, 0.03])
    c1, s1, c2, s2, c3, s3 = (
        np.cos(a1), np.sin(a1), np.cos(a2), np.sin(a2), np.cos(a3), np.sin(a3),
    )
    R = np.array([
        [c2 * c3, -c2 * s3, s2],
        [c1 * s3 + s1 * s2 * c3, c1 * c3 - s1 * s2 * s3, -s1 * c2],
        [s1 * s3 - c1 * s2 * c3, s1 * c3 + c1 * s2 * s3, c1 * c2],
    ])
    X_mov = (X_fix - t) @ R
    res = icp_register(
        X_fix, X_mov, IcpConfig(correspondences=500, max_iterations=30)
    )
    np.testing.assert_allclose(r0["H"], np.asarray(res.H), atol=1e-9)
