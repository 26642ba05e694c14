"""Sharded pipeline on the 8-device virtual CPU mesh: must agree with the
single-device engine (same masks, same collectives-free math) and exercise
every collective building block."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpleicp_tpu import IcpConfig, icp_register
from simpleicp_tpu.parallel.mesh import make_mesh
from simpleicp_tpu.parallel.sharded import icp_register_sharded


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple (virtual) devices"
)


def _surface(rng, n):
    xy = rng.uniform(-2, 2, size=(n, 2))
    z = 0.3 * np.sin(2 * xy[:, 0]) + 0.2 * np.cos(3 * xy[:, 1])
    return np.column_stack([xy, z])


def test_sharded_matches_serial_no_gate(rng):
    X_fix = _surface(rng, 4003)  # odd size: exercises padding
    t = np.array([0.04, -0.03, 0.02])
    X_mov = X_fix - t
    cfg = IcpConfig(correspondences=300, max_iterations=30)

    mesh = make_mesh(8)
    res_sh = icp_register_sharded(X_fix, X_mov, cfg, mesh=mesh)
    res_se = icp_register(X_fix, X_mov, cfg)

    assert int(res_sh.error_code) == 0
    np.testing.assert_allclose(
        np.asarray(res_sh.H), np.asarray(res_se.H), atol=1e-9
    )
    assert int(res_sh.n_iterations) == int(res_se.n_iterations)
    # identical correspondence selection
    np.testing.assert_array_equal(
        np.asarray(res_sh.sel_idx), np.asarray(res_se.sel_idx)
    )
    np.testing.assert_allclose(
        np.asarray(res_sh.normals), np.asarray(res_se.normals), atol=1e-9
    )


def test_sharded_matches_serial_with_gate(rng):
    # partial overlap: gate + distributed selection path
    X_fix = _surface(rng, 3001)
    half = _surface(rng, 3000)
    keep = half[:, 0] > 0  # movable covers only half the fixed cloud
    X_mov = half[keep] - np.array([0.02, 0.01, -0.01])
    cfg = IcpConfig(correspondences=200, max_overlap_distance=0.5, max_iterations=30)

    mesh = make_mesh(4)
    res_sh = icp_register_sharded(X_fix, X_mov, cfg, mesh=mesh)
    res_se = icp_register(X_fix, X_mov, cfg)

    assert int(res_sh.error_code) == 0
    np.testing.assert_array_equal(
        np.asarray(res_sh.sel_idx)[np.asarray(res_sh.sel_valid)],
        np.asarray(res_se.sel_idx)[np.asarray(res_se.sel_valid)],
    )
    np.testing.assert_allclose(
        np.asarray(res_sh.H), np.asarray(res_se.H), atol=1e-9
    )


def test_sharded_no_overlap_error(rng):
    X_fix = _surface(rng, 1000)
    res = icp_register_sharded(
        X_fix, X_fix + 100.0, IcpConfig(max_overlap_distance=0.1),
        mesh=make_mesh(8),
    )
    assert int(res.error_code) == 1


def test_sharded_frozen_params(rng):
    X_fix = _surface(rng, 2000)
    X_mov = X_fix - np.array([0.05, 0.0, 0.01])
    res = icp_register_sharded(
        X_fix, X_mov, IcpConfig(correspondences=200),
        mesh=make_mesh(8),
        rbp_observed_values=np.zeros(6),
        rbp_observation_weights=np.array([np.inf, np.inf, np.inf, 0, 0, 0]),
    )
    H = np.asarray(res.H)
    np.testing.assert_allclose(H[:3, :3], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(H[:3, 3], [0.05, 0.0, 0.01], atol=2e-3)


def test_sharded_grid_gate_matches_brute(rng):
    """The traveling-sorted-cell-list ring gate must select exactly the same
    fixed points (and hence the same registration) as the dense ring gate."""
    X_fix = _surface(rng, 3011)
    X_mov = _surface(rng, 2993) - np.array([0.03, 0.01, -0.02])
    mesh = make_mesh(8)
    results = {}
    for gm in ("brute", "grid"):
        cfg = IcpConfig(
            correspondences=200, max_iterations=20,
            max_overlap_distance=0.5, gate_method=gm,
        )
        results[gm] = icp_register_sharded(X_fix, X_mov, cfg, mesh=mesh)
    rb, rg = results["brute"], results["grid"]
    assert int(rb.error_code) == 0 and int(rg.error_code) == 0
    np.testing.assert_array_equal(
        np.asarray(rb.sel_idx), np.asarray(rg.sel_idx)
    )
    np.testing.assert_allclose(
        np.asarray(rb.H), np.asarray(rg.H), atol=1e-9
    )
    assert int(rb.n_iterations) == int(rg.n_iterations)


def test_allgather_gate_matches_ring(rng):
    """gate_collective='allgather' (one collective, local sweep) must equal
    the ring gate bit-for-bit for BOTH gate engines — the two strategies
    exist for the real-hardware A/B (round-2 verdict item 8); correctness
    must not depend on which wins."""
    X_fix = _surface(rng, 3011)
    X_mov = _surface(rng, 2993) - np.array([0.03, 0.01, -0.02])
    mesh = make_mesh(8)
    for gm in ("brute", "grid"):
        results = {}
        for coll in ("ring", "allgather"):
            cfg = IcpConfig(
                correspondences=200, max_iterations=20,
                max_overlap_distance=0.5, gate_method=gm,
                gate_collective=coll,
            )
            results[coll] = icp_register_sharded(X_fix, X_mov, cfg, mesh=mesh)
        rr, ra = results["ring"], results["allgather"]
        assert int(rr.error_code) == 0 and int(ra.error_code) == 0
        np.testing.assert_array_equal(
            np.asarray(rr.sel_idx), np.asarray(ra.sel_idx), err_msg=gm
        )
        np.testing.assert_array_equal(
            np.asarray(rr.H), np.asarray(ra.H), err_msg=gm
        )
        assert int(rr.n_iterations) == int(ra.n_iterations)


def test_sharded_select_n_big_c_exact(rng):
    """Distributed fixed-count selection at C > 46341 (the int32-overflow
    regime of the round-2 verdict) with an uneven random mask: slot-for-slot
    bit-equality with the reference np.round(np.linspace) formula — the
    round-2 float-rounding construction dropped/duplicated slots at scale."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from simpleicp_tpu.parallel.sharded import _sharded_select_n

    ndev = 8
    rows = 262_144  # per-shard
    nf = ndev * rows
    C = 60_000
    mask = rng.random(nf) < 0.8
    n_sel = int(mask.sum())
    assert n_sel > C
    Xf = rng.standard_normal((nf, 3))

    mesh = make_mesh(ndev)
    fn = shard_map(
        lambda s, x: _sharded_select_n(s, x, C, "points", ndev, jnp.float64),
        mesh=mesh,
        in_specs=(P("points"), P("points", None)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    Q, gidx, valid, n_sel_dev = fn(jnp.asarray(mask), jnp.asarray(Xf))
    assert int(n_sel_dev) == n_sel
    assert np.asarray(valid).all()
    sel = np.nonzero(mask)[0]
    ref_idx = sel[np.round(np.linspace(0, n_sel - 1, C)).astype(np.int64)]
    np.testing.assert_array_equal(np.asarray(gidx, np.int64), ref_idx)
    np.testing.assert_array_equal(np.asarray(Q), Xf[ref_idx])


def test_multihost_helpers_single_process():
    from simpleicp_tpu.parallel import process_info

    idx, cnt = process_info()
    assert idx == 0 and cnt >= 1


def test_sharded_user_normals(rng):
    """User-supplied fixed-cloud normals take the _gather_rows path and must
    reproduce the serial result (Q11 under sharding)."""
    X_fix = _surface(rng, 2500)
    X_mov = X_fix - np.array([0.02, -0.01, 0.015])
    normals = np.tile(np.array([0.0, 0.0, 1.0]), (2500, 1))
    # perturb so normals aren't all identical
    normals[:, 0] = 0.05 * np.sin(X_fix[:, 0])
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    planarity = np.full(2500, 0.9)

    cfg = IcpConfig(correspondences=200, max_iterations=20)
    res_se = icp_register(
        X_fix, X_mov, cfg, normals_fix=normals, planarity_fix=planarity
    )
    res_sh = icp_register_sharded(
        X_fix, X_mov, cfg, mesh=make_mesh(8),
        normals_fix=normals, planarity_fix=planarity,
    )
    assert int(res_sh.error_code) == 0
    np.testing.assert_allclose(
        np.asarray(res_sh.H), np.asarray(res_se.H), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(res_sh.normals), np.asarray(res_se.normals), atol=1e-12
    )


def test_ring_grid_gate_global_lattice_no_truncation():
    """Adversarial lattice-shift construction: a shard whose LOCAL minimum
    sits half a cell off the global minimum. With per-shard origins (the
    pre-fix behavior) that shard's lattice shifts, one shard cell swallows
    up to 4 full-cloud cells (61 points here), the full-cloud
    `grid_cell_cap` no longer bounds its occupancy, and the lone in-radius
    witness — sorted last in the merged run — is silently truncated: the
    gate reports no overlap for its query. With the global pmin origin the
    full-cloud cap is a provable bound and the witness survives."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from simpleicp_tpu.ops.gridhash import grid_cell_cap
    from simpleicp_tpu.parallel.sharded import _ring_min_dist2_grid

    radius = 1.0
    rows = 128  # per-shard row count (padded with invalid)

    # shard 0: the adversarial one
    chaff = []
    rng = np.random.default_rng(7)
    for lo in [(1.0, 1.0), (1.0, 0.6), (0.6, 1.0)]:  # full cells (1,1),(1,0),(0,1)
        xs = rng.uniform(lo[0], lo[0] + 0.4, 20)
        ys = rng.uniform(lo[1], lo[1] + 0.35, 20)
        chaff.append(np.column_stack([xs, ys, np.zeros(20)]))
    shard0 = np.concatenate(
        chaff
        + [np.array([[0.5, 0.5, 50.0]])]    # local-min shifter (far away)
        + [np.array([[0.7, 0.7, 0.0]])]     # the witness, LAST in the shard
    )
    # shard 1: provides the global (0,0,0)-ish minimum plus dull points
    shard1 = np.array([[0.0, 0.0, 0.0], [100.0, 100.0, 100.0]])

    def pad(X):
        out = np.full((rows, 3), 1e6)
        out[: X.shape[0]] = X
        valid = np.zeros(rows, bool)
        valid[: X.shape[0]] = True
        return out, valid

    m0, v0 = pad(shard0)
    m1, v1 = pad(shard1)
    Xm = np.concatenate([m0, m1])
    m_valid = np.concatenate([v0, v1])

    # query: within radius of ONLY the witness (0.99), every chaff point
    # and everything else is > 1.03 away
    Qf = np.tile(np.array([[0.7, 0.7, -0.99]]), (2 * rows, 1))
    f_valid = np.ones(2 * rows, bool)

    full = np.concatenate([shard0, shard1])
    cap = grid_cell_cap(full, radius)
    d_exact = np.sqrt(((Qf[0] - full) ** 2).sum(axis=1)).min()
    assert d_exact <= radius  # the witness really is in radius

    mesh = make_mesh(2)
    gate = shard_map(
        lambda q, fv, m, mv: _ring_min_dist2_grid(
            q, fv, m, mv, radius, cap, "points", 2
        ),
        mesh=mesh,
        in_specs=(P("points"), P("points"), P("points"), P("points")),
        out_specs=P("points"),
        check_vma=False,
    )
    d2 = np.asarray(
        gate(
            jnp.asarray(Qf, jnp.float64), jnp.asarray(f_valid),
            jnp.asarray(Xm, jnp.float64), jnp.asarray(m_valid),
        )
    )
    assert np.all(d2[f_valid] <= radius**2), (
        f"gate missed the witness: min d2 {d2[f_valid].min()}"
    )
    np.testing.assert_allclose(np.sqrt(d2[0]), d_exact, rtol=1e-12)


def test_sharded_dilate_gate_matches_serial(rng):
    """gate_method='dilate' under sharding: the precomputed mask rides the
    points axis; result must equal both the sharded brute gate and the
    serial dilate engine exactly."""
    X_fix = _surface(rng, 3011)
    X_mov = _surface(rng, 2993) - np.array([0.03, 0.01, -0.02])
    mesh = make_mesh(8)
    results = {}
    for gm in ("brute", "dilate"):
        cfg = IcpConfig(
            correspondences=200, max_iterations=20,
            max_overlap_distance=0.5, gate_method=gm,
        )
        results[gm] = icp_register_sharded(X_fix, X_mov, cfg, mesh=mesh)
    res_se = icp_register(
        X_fix, X_mov,
        IcpConfig(correspondences=200, max_iterations=20,
                  max_overlap_distance=0.5, gate_method="dilate"),
    )
    rb, rd = results["brute"], results["dilate"]
    assert int(rb.error_code) == 0 and int(rd.error_code) == 0
    np.testing.assert_array_equal(
        np.asarray(rb.sel_idx), np.asarray(rd.sel_idx)
    )
    np.testing.assert_allclose(np.asarray(rb.H), np.asarray(rd.H), atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(rd.H), np.asarray(res_se.H), atol=1e-9
    )
    assert int(rb.n_iterations) == int(rd.n_iterations)


def _assert_results_bitequal(a, b):
    for field in a._fields:
        va, vb = np.asarray(getattr(a, field)), np.asarray(getattr(b, field))
        np.testing.assert_array_equal(va, vb, err_msg=field)


def test_sharded_chunked_equals_monolithic(rng):
    """Host-chunked sharded dispatch (prologue program + K-iteration chunk
    programs, carry replicated) must be BIT-equal to the monolithic sharded
    program in every result field — gate + dynamic selection + brute
    collective matcher."""
    import dataclasses

    X_fix = _surface(rng, 3005)
    X_mov = _surface(rng, 2999) - np.array([0.02, 0.01, -0.015])
    cfg = IcpConfig(correspondences=250, max_overlap_distance=0.5,
                    max_iterations=30)
    mesh = make_mesh(8)
    mono = icp_register_sharded(X_fix, X_mov, cfg, mesh=mesh)
    chunk = icp_register_sharded(
        X_fix, X_mov,
        dataclasses.replace(cfg, dispatch="chunked", chunk_iterations=2),
        mesh=mesh,
    )
    assert int(mono.error_code) == 0
    _assert_results_bitequal(mono, chunk)


def test_sharded_chunked_grid_matcher_equals_monolithic(rng):
    """The sharded grid matcher's per-shard cell lists are built once in the
    chunked prologue program and re-fed (sharded) to every chunk — results
    must not depend on that split."""
    import dataclasses

    X_fix = _surface(rng, 3072)
    X_mov = _surface(rng, 3050) - np.array([0.02, -0.01, 0.01])
    cfg = IcpConfig(
        correspondences=250, max_overlap_distance=0.5,
        match_method="grid", max_iterations=30,
    )
    mesh = make_mesh(4)
    mono = icp_register_sharded(X_fix, X_mov, cfg, mesh=mesh)
    chunk = icp_register_sharded(
        X_fix, X_mov,
        dataclasses.replace(cfg, dispatch="chunked", chunk_iterations=3),
        mesh=mesh,
    )
    assert int(mono.error_code) == 0
    assert int(np.asarray(mono.iter_counts)[0]) > 0
    _assert_results_bitequal(mono, chunk)


def test_sharded_chunked_with_observations_and_trajectory(rng):
    """Frozen parameters + recorded trajectory ride the replicated carry
    across sharded chunk boundaries."""
    import dataclasses

    X_fix = _surface(rng, 2003)
    X_mov = _surface(rng, 2001) - np.array([0.01, 0.02, -0.01])
    obs_vals = np.array([np.deg2rad(-0.5), 0.0, 0.0, 0.0, 0.0, 0.0])
    obs_w = np.array([np.inf, np.inf, 0.0, 0.0, 0.0, 0.0])
    cfg = IcpConfig(correspondences=200, max_overlap_distance=0.5,
                    record_trajectory=True, max_iterations=30)
    mesh = make_mesh(8)
    mono = icp_register_sharded(X_fix, X_mov, cfg, mesh=mesh,
                                rbp_observed_values=obs_vals,
                                rbp_observation_weights=obs_w)
    chunk = icp_register_sharded(
        X_fix, X_mov,
        dataclasses.replace(cfg, dispatch="chunked", chunk_iterations=2),
        mesh=mesh, rbp_observed_values=obs_vals,
        rbp_observation_weights=obs_w,
    )
    _assert_results_bitequal(mono, chunk)


def test_sharded_chunked_no_overlap_error(rng):
    """Error surfaced from the sharded prologue stops the chunk loop."""
    import dataclasses

    X_fix = _surface(rng, 1000)
    res = icp_register_sharded(
        X_fix, X_fix + 100.0,
        dataclasses.replace(
            IcpConfig(max_overlap_distance=0.1),
            dispatch="chunked", chunk_iterations=2,
        ),
        mesh=make_mesh(8),
    )
    assert int(res.error_code) == 1
