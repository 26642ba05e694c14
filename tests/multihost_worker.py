"""Worker process for the 2-process multi-host test (test_multihost.py).

Each process owns 4 virtual CPU devices (8 global), performs the
jax.distributed handshake through simpleicp_tpu.parallel.multihost, loads
only its own point shard onto the global mesh (make_array_from_
process_local_data inside icp_register_sharded), runs a sharded
registration, and writes the replicated result for the parent test to
compare across processes and against the single-process engine.

Usage: python multihost_worker.py <process_id> <num_processes> <port> <out>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    proc_id, nprocs, port, out = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from simpleicp_tpu.parallel.multihost import initialize_multihost, process_info

    initialize_multihost(f"localhost:{port}", nprocs, proc_id)
    assert process_info() == (proc_id, nprocs), process_info()
    assert len(jax.devices()) == 4 * nprocs, len(jax.devices())

    import numpy as np

    from simpleicp_tpu import IcpConfig
    from simpleicp_tpu.parallel import make_mesh
    from simpleicp_tpu.parallel.sharded import icp_register_sharded

    # Deterministic synthetic scene, identical on every host.
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

    mesh = make_mesh()  # all 8 global devices
    res = icp_register_sharded(
        X_fix, X_mov, IcpConfig(correspondences=500, max_iterations=30),
        mesh=mesh,
    )
    H = np.asarray(res.H)  # replicated output: addressable on every host
    assert int(res.error_code) == 0
    np.savez(
        f"{out}.{proc_id}.npz",
        H=H,
        n_iterations=int(res.n_iterations),
        converged=bool(res.converged),
        iter_means=np.asarray(res.iter_means),
        iter_stds=np.asarray(res.iter_stds),
        iter_counts=np.asarray(res.iter_counts),
    )
    print("WORKER_OK", proc_id, flush=True)


if __name__ == "__main__":
    main()
