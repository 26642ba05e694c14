"""Fixed-cloud preparation reuse (models/icp.py:prepare_fixed / FixedPrep):
the movable-independent prologue — reference-formula selection
(/root/reference/python/simpleicp/pointcloud.py:141-147) + normals at the
selected points — computed ONCE per fixed cloud and consumed by any number
of registrations. The serving contract is bit-equality: a registration with
`fixed_prep` must match the self-contained run field-for-field, across
dispatch shapes, matcher engines, and warm starts. The reference has no
analog (it recomputes selection+normals per run,
/root/reference/python/simpleicp/simpleicp.py:262-283).
"""

import dataclasses

import numpy as np
import pytest

from simpleicp_tpu import IcpConfig, icp_register, prepare_fixed


def _assert_results_bitequal(a, b):
    for field in a._fields:
        va, vb = np.asarray(getattr(a, field)), np.asarray(getattr(b, field))
        np.testing.assert_array_equal(va, vb, err_msg=field)


def _surface(rng, n):
    xy = rng.uniform(-2, 2, size=(n, 2))
    z = 0.3 * np.sin(2 * xy[:, 0]) + 0.2 * np.cos(3 * xy[:, 1])
    return np.column_stack([xy, z])


def _pair(rng, n_fix, n_mov):
    Xf = _surface(rng, n_fix)
    Xm = _surface(rng, n_mov)
    ang = 0.015
    R = np.array([
        [np.cos(ang), -np.sin(ang), 0.0],
        [np.sin(ang), np.cos(ang), 0.0],
        [0.0, 0.0, 1.0],
    ])
    return Xf, Xm @ R.T + np.array([0.04, -0.03, 0.02])


def test_prepared_equals_self_contained_dragon(dragon):
    """Reference dataset, both solver families, monolithic dispatch."""
    X_fix, X_mov = dragon
    for solver in ("nonlinear", "linearized"):
        cfg = IcpConfig(solver=solver)
        prep = prepare_fixed(X_fix, cfg)
        cold = icp_register(X_fix, X_mov, cfg)
        warm = icp_register(X_fix, X_mov, cfg, fixed_prep=prep)
        _assert_results_bitequal(cold, warm)


def test_prepared_serves_many_movables(rng):
    """The serving scenario: one preparation, several movable clouds — each
    registration equals its self-contained counterpart bit-for-bit."""
    Xf = _surface(rng, 4000)
    cfg = IcpConfig(correspondences=400)
    prep = prepare_fixed(Xf, cfg)
    for seed in range(3):
        r = np.random.default_rng(seed)
        _, Xm = _pair(r, 1, 3000 + 500 * seed)
        _assert_results_bitequal(
            icp_register(Xf, Xm, cfg),
            icp_register(Xf, Xm, cfg, fixed_prep=prep),
        )


def test_prepared_ref_tile_invariance(rng):
    """icp_register auto-sizes ref_tile from the MOVABLE cloud while
    prepare_fixed sizes from the FIXED cloud — the kNN kernels' index-stable
    tie-breaks make the normals identical either way. Pin it with a movable
    cloud large enough to change the auto tile."""
    Xf, _ = _pair(rng, 3000, 1)
    _, Xm = _pair(rng, 1, 40000)
    cfg = IcpConfig(correspondences=300)
    prep = prepare_fixed(Xf, cfg)
    _assert_results_bitequal(
        icp_register(Xf, Xm, cfg),
        icp_register(Xf, Xm, cfg, fixed_prep=prep),
    )


@pytest.mark.parametrize("k", [1, 3])
def test_prepared_chunked_dispatch(rng, k):
    """Chunked dispatch with a prepared fixed side: the prep replaces the
    prologue program; chunks must still compose bit-exactly."""
    Xf, Xm = _pair(rng, 5000, 5000)
    cfg = IcpConfig(correspondences=500)
    chunked = dataclasses.replace(cfg, dispatch="chunked",
                                  chunk_iterations=k)
    prep = prepare_fixed(Xf, cfg)
    _assert_results_bitequal(
        icp_register(Xf, Xm, cfg),
        icp_register(Xf, Xm, chunked, fixed_prep=prep),
    )


def test_prepared_grid_matcher(rng):
    """Grid matcher (explicit match_radius — the gate stays disabled) with
    a prepared fixed side, monolithic and chunked."""
    Xf, Xm = _pair(rng, 6000, 6000)
    cfg = IcpConfig(correspondences=500, match_method="grid",
                    match_radius=0.5)
    prep = prepare_fixed(Xf, cfg)
    cold = icp_register(Xf, Xm, cfg)
    _assert_results_bitequal(
        cold, icp_register(Xf, Xm, cfg, fixed_prep=prep))
    chunked = dataclasses.replace(cfg, dispatch="chunked",
                                  chunk_iterations=2)
    _assert_results_bitequal(
        cold, icp_register(Xf, Xm, chunked, fixed_prep=prep))


def test_prepared_warm_start(rng):
    """warm_start + fixed_prep: the coarse pass plans its own (subsampled)
    prologue; the full-resolution pass consumes the prep. Equal to the
    warm start without prep."""
    Xf, Xm = _pair(rng, 30000, 30000)
    cfg = IcpConfig(correspondences=500, warm_start=True,
                    warm_start_points=5000)
    prep = prepare_fixed(Xf, cfg)
    _assert_results_bitequal(
        icp_register(Xf, Xm, cfg),
        icp_register(Xf, Xm, cfg, fixed_prep=prep),
    )


def test_prepared_supplied_normals(rng):
    """User-supplied full-cloud normals flow through prepare_fixed exactly
    as through icp_register's normals_fix path (SURVEY.md Q11)."""
    Xf, Xm = _pair(rng, 3000, 3000)
    r = np.random.default_rng(7)
    normals = r.normal(size=(3000, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    planarity = r.uniform(0.3, 1.0, size=3000)
    cfg = IcpConfig(correspondences=300)
    prep = prepare_fixed(Xf, cfg, normals_fix=normals,
                         planarity_fix=planarity)
    _assert_results_bitequal(
        icp_register(Xf, Xm, cfg, normals_fix=normals,
                     planarity_fix=planarity),
        icp_register(Xf, Xm, cfg, fixed_prep=prep),
    )


def test_prepared_small_cloud_padding(rng):
    """nf < correspondences: the padded/clamped selection (reference
    semantics) survives preparation."""
    Xf, Xm = _pair(rng, 150, 200)
    cfg = IcpConfig(correspondences=256)
    prep = prepare_fixed(Xf, cfg)
    _assert_results_bitequal(
        icp_register(Xf, Xm, cfg),
        icp_register(Xf, Xm, cfg, fixed_prep=prep),
    )


def test_prepared_sharded_parity(rng):
    """The sharded driver consumes the SAME preparation (replicated to the
    mesh, SPMD prologue skipped): field-for-field equal to the sharded
    self-contained run on both dispatch shapes — padding at the cloud tail
    makes the sharded global indices equal the preparation's original
    indices."""
    from simpleicp_tpu.parallel import icp_register_sharded, make_mesh

    Xf, Xm = _pair(rng, 9000, 9000)
    mesh = make_mesh()
    cfg = IcpConfig(correspondences=800)
    prep = prepare_fixed(Xf, cfg)
    cold = icp_register_sharded(Xf, Xm, cfg, mesh=mesh)
    _assert_results_bitequal(
        cold, icp_register_sharded(Xf, Xm, cfg, mesh=mesh, fixed_prep=prep))
    chunked = dataclasses.replace(cfg, dispatch="chunked",
                                  chunk_iterations=2)
    _assert_results_bitequal(
        icp_register_sharded(Xf, Xm, chunked, mesh=mesh),
        icp_register_sharded(Xf, Xm, chunked, mesh=mesh, fixed_prep=prep))


def test_prepared_sharded_validation(rng):
    from simpleicp_tpu.parallel import icp_register_sharded, make_mesh

    Xf, Xm = _pair(rng, 2000, 2000)
    mesh = make_mesh()
    cfg = IcpConfig(correspondences=200)
    prep = prepare_fixed(Xf, cfg)
    with pytest.raises(ValueError, match="overlap gate"):
        icp_register_sharded(
            Xf, Xm, IcpConfig(correspondences=200, max_overlap_distance=1.0),
            mesh=mesh, fixed_prep=prep)
    with pytest.raises(ValueError, match="re-run prepare_fixed"):
        icp_register_sharded(Xf, Xm, IcpConfig(correspondences=300),
                             mesh=mesh, fixed_prep=prep)
    # sub-C fixed clouds: the sharded and host selection engines fill the
    # masked padding slots differently — refused rather than non-comparable
    small = prepare_fixed(Xf[:100], IcpConfig(correspondences=200))
    with pytest.raises(ValueError, match="at least"):
        icp_register_sharded(Xf[:100], Xm, cfg, mesh=mesh, fixed_prep=small)


def test_prepared_save_load_roundtrip(rng, tmp_path):
    """FixedPrep.save / load_fixed_prep: a serving deployment computes the
    preparation offline and loads it at startup — the round-trip must be
    bit-exact, so a registration consuming the loaded preparation equals
    the self-contained run field-for-field."""
    from simpleicp_tpu import load_fixed_prep

    Xf, Xm = _pair(rng, 3000, 3000)
    cfg = IcpConfig(correspondences=300)
    prep = prepare_fixed(Xf, cfg)
    path = tmp_path / "map_prep.npz"
    prep.save(path)
    loaded = load_fixed_prep(path)
    for a, b in zip(prep[:5], loaded[:5]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert prep[5:] == loaded[5:]  # metadata fingerprint
    _assert_results_bitequal(
        icp_register(Xf, Xm, cfg),
        icp_register(Xf, Xm, cfg, fixed_prep=loaded),
    )


def test_prepare_fixed_watchdog_refusal(rng, monkeypatch):
    """On accelerator backends, a preparation whose MINIMAL kNN query
    block alone exceeds program_budget_s is refused like icp_register's
    dispatch planner refuses it (over-long programs crash TPU workers) —
    prepare_fixed must not be a guard bypass. budget=0 disables the
    guard."""
    import jax

    Xf, _ = _pair(rng, 3000, 1)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pytest.raises(ValueError, match="program_budget_s"):
        prepare_fixed(Xf, IcpConfig(correspondences=300,
                                    program_budget_s=1e-12))
    prep = prepare_fixed(Xf, IcpConfig(correspondences=300,
                                       program_budget_s=0.0))
    assert prep.normals.shape == (300, 3)


def test_prepared_validation_errors(rng):
    Xf, Xm = _pair(rng, 2000, 2000)
    cfg = IcpConfig(correspondences=200)
    prep = prepare_fixed(Xf, cfg)

    with pytest.raises(ValueError, match="overlap gate"):
        prepare_fixed(Xf, IcpConfig(max_overlap_distance=1.0))
    with pytest.raises(ValueError, match="overlap gate"):
        icp_register(Xf, Xm, IcpConfig(correspondences=200,
                                       max_overlap_distance=1.0),
                     fixed_prep=prep)
    with pytest.raises(ValueError, match="prepare_fixed"):
        icp_register(Xf, Xm, cfg, fixed_prep=prep,
                     normals_fix=np.ones((2000, 3)))
    with pytest.raises(ValueError, match="re-run prepare_fixed"):
        icp_register(Xf, Xm, IcpConfig(correspondences=300),
                     fixed_prep=prep)
    with pytest.raises(ValueError, match="re-run prepare_fixed"):
        icp_register(Xf, Xm, IcpConfig(correspondences=200, neighbors=12),
                     fixed_prep=prep)
    with pytest.raises(ValueError, match="re-run prepare_fixed"):
        icp_register(Xf[:1999], Xm, cfg, fixed_prep=prep)
    with pytest.raises(ValueError, match="dtype"):
        icp_register(Xf, Xm, cfg, fixed_prep=prep, dtype=np.float32)
