"""Host-chunked dispatch (models/icp.py:_icp_run_chunked): K iterations per
device program, carry re-dispatched from the host — must be BIT-equal to the
monolithic single-program while_loop in every result field, for every
matcher/gate combination. The loop body is shared; the chunk boundary only
moves where the loop condition is evaluated, so equality here certifies that
big-correspondence exact configs (which the round-2 build REFUSED on TPU via
the watchdog guard) now execute with unchanged semantics.
"""

import dataclasses

import numpy as np
import pytest

from simpleicp_tpu import IcpConfig, icp_register


def _chunked(cfg, k):
    return dataclasses.replace(cfg, dispatch="chunked", chunk_iterations=k)


def _assert_results_bitequal(a, b):
    for field in a._fields:
        va, vb = np.asarray(getattr(a, field)), np.asarray(getattr(b, field))
        np.testing.assert_array_equal(va, vb, err_msg=field)


def _surface(rng, n):
    xy = rng.uniform(-2, 2, size=(n, 2))
    z = 0.3 * np.sin(2 * xy[:, 0]) + 0.2 * np.cos(3 * xy[:, 1])
    return np.column_stack([xy, z])


@pytest.mark.parametrize("k", [1, 3])
def test_chunked_equals_monolithic_dragon(dragon, k):
    """Ungated brute path (trace-time selection), both solver families."""
    X_fix, X_mov = dragon
    for solver in ("nonlinear", "linearized"):
        cfg = IcpConfig(solver=solver)
        mono = icp_register(X_fix, X_mov, cfg)
        chunk = icp_register(X_fix, X_mov, _chunked(cfg, k))
        _assert_results_bitequal(mono, chunk)


def test_chunked_equals_monolithic_gated_bunny(bunny):
    """In-program gate + dynamic selection under chunking."""
    X_fix, X_mov = bunny
    cfg = IcpConfig(max_overlap_distance=1.0)
    mono = icp_register(X_fix, X_mov, cfg)
    chunk = icp_register(X_fix, X_mov, _chunked(cfg, 2))
    _assert_results_bitequal(mono, chunk)


def test_chunked_equals_monolithic_grid_matcher(rng):
    """The grid matcher's cell list is built once in the prologue program
    and reused by every chunk — results must not depend on that split."""
    X_fix = _surface(rng, 4001)
    X_mov = _surface(rng, 3979) - np.array([0.02, -0.01, 0.015])
    cfg = IcpConfig(
        correspondences=300, max_overlap_distance=0.5,
        match_method="grid", max_iterations=30,
    )
    mono = icp_register(X_fix, X_mov, cfg)
    chunk = icp_register(X_fix, X_mov, _chunked(cfg, 2))
    assert int(mono.error_code) == 0
    _assert_results_bitequal(mono, chunk)


def test_chunked_with_observations_and_trajectory(multisensor):
    """Frozen parameters + recorded trajectory (debug-dump replay buffers
    ride the carry across chunk boundaries)."""
    X_fix, X_mov = multisensor
    obs_vals = np.array([np.deg2rad(-0.5), 0.0, 0.0, 0.0, 0.0, 0.0])
    obs_w = np.array([np.inf, np.inf, 0.0, 0.0, 0.0, 0.0])
    cfg = IcpConfig(max_overlap_distance=1.0, record_trajectory=True)
    mono = icp_register(X_fix, X_mov, cfg,
                        rbp_observed_values=obs_vals,
                        rbp_observation_weights=obs_w)
    chunk = icp_register(X_fix, X_mov, _chunked(cfg, 3),
                         rbp_observed_values=obs_vals,
                         rbp_observation_weights=obs_w)
    _assert_results_bitequal(mono, chunk)


def test_split_prologue_knn_blocks_bitequal(dragon):
    """knn_block > 0 splits the normals kNN into query-block programs (the
    round-3 fix for the ~14x-slower-than-modeled k-NN kernel that crashed
    the worker at C=1e5 x 12.5M). Per-query top-k is batch-independent, so
    the result must be bit-equal to the monolithic prologue — including a
    block size that does NOT divide C (padding path)."""
    import jax.numpy as jnp

    from simpleicp_tpu.models.icp import _icp_run_chunked, icp_register

    X_fix, X_mov = dragon
    cfg = IcpConfig(correspondences=1000)
    mono = icp_register(X_fix, X_mov, cfg)
    dt = jnp.float64
    for blk in (256, 384):  # 384 does not divide 1000: padding path
        chunk = _icp_run_chunked(
            jnp.asarray(X_fix, dt), jnp.asarray(X_mov, dt),
            jnp.zeros(6, dt), jnp.zeros(6, dt),
            jnp.zeros((1, 3), dt), jnp.zeros((1,), dt), jnp.zeros((1,), dt),
            jnp.zeros((1,), bool),
            cfg=cfg, has_normals=False, has_mov_planarity=False,
            has_ext_sel=False, chunk_iters=3, knn_block=blk,
        )
        _assert_results_bitequal(mono, chunk)


def test_grid_knn_prologue_bitequal(dragon):
    """knn_grid=True routes the prologue normals through the grid kNN
    (sampled radius, device-exact cell cap, certificates, dense patching of
    uncertified rows) — the result must STILL be bit-equal to the
    monolithic dense pipeline. Uses C=8192 so the grid path engages
    (guarded by C >= 4096)."""
    import jax.numpy as jnp

    from simpleicp_tpu.models.icp import _icp_run_chunked, icp_register

    X_fix, X_mov = dragon
    cfg = IcpConfig(correspondences=8192, max_iterations=20)
    mono = icp_register(X_fix, X_mov, cfg)
    dt = jnp.float64
    chunk = _icp_run_chunked(
        jnp.asarray(X_fix, dt), jnp.asarray(X_mov, dt),
        jnp.zeros(6, dt), jnp.zeros(6, dt),
        jnp.zeros((1, 3), dt), jnp.zeros((1,), dt), jnp.zeros((1,), dt),
        jnp.zeros((1,), bool),
        cfg=cfg, has_normals=False, has_mov_planarity=False,
        has_ext_sel=False, chunk_iters=4, knn_block=2048, knn_grid=True,
    )
    _assert_results_bitequal(mono, chunk)


def test_chunked_no_overlap_error(rng):
    """Error surfaced from the prologue stops the chunk loop immediately."""
    X_fix = _surface(rng, 500)
    res = icp_register(
        X_fix, X_fix + 100.0,
        _chunked(IcpConfig(max_overlap_distance=0.1), 2),
    )
    assert int(res.error_code) == 1


def test_stage_estimator_consistency():
    """The monolithic estimate is exactly the stage sum, and the round-2
    verdict's target config (C=1e5 x 12.5M exact) is chunkable under the
    default budget: per-iteration and the minimal kNN query block fit,
    while the FULL kNN does not (the ~14x-slower k=10 kernel measured in
    round 3 — calibration_tpu.json) and therefore must be query-blocked."""
    from simpleicp_tpu.utils.device_policy import (
        estimate_tpu_program_seconds,
        estimate_tpu_stage_seconds,
    )

    nf = nm = 12_500_000
    c = 100_000
    gate_s, knn_s, build_s, per = estimate_tpu_stage_seconds(
        nf, nm, correspondences=c
    )
    est = estimate_tpu_program_seconds(nf, nm, correspondences=c,
                                       iterations=10)
    np.testing.assert_allclose(
        est, gate_s + knn_s + build_s + 10 * per, rtol=1e-12
    )
    budget = IcpConfig().program_budget_s
    assert per < budget * 0.9          # one match iteration fits
    assert knn_s > budget * 0.5        # full kNN prologue does NOT
    assert knn_s * 2048.0 / c < budget * 0.9  # a minimal query block does
    k = max(1, int((budget * 0.5) / per))
    assert k >= 1 and k * per <= budget * 0.5 + per


def test_grid_knn_prologue_patches_uncertified_rows(rng, caplog, monkeypatch):
    """Force the certificate-failure path of _knn_grid_normals: queries in a
    sparse region (skipped by the 1024-query radius sample) whose k-th NN
    lies beyond the sampled cell radius fail certification and must be
    recomputed densely IN PLACE — a read-only np.asarray view here shipped
    broken to TPU once (2026-08-19), so this pins both the patching and the
    bit-equality with the dense kernel."""
    import logging

    import jax.numpy as jnp

    from simpleicp_tpu.models.icp import _icp_knn_block_jit, _knn_grid_normals
    from simpleicp_tpu.utils import device_policy

    # a small cloud keeps the test fast; make the grid plan economical by
    # deflating the modeled dense-kNN rate (the economics read the module
    # attributes at call time)
    monkeypatch.setattr(device_policy, "TPU_KNN10_PAIRS_PER_SEC", 1e7)

    # dense uniform slab + a sparse far-away patch
    n_side = 224  # ~50k points
    g = np.stack(np.meshgrid(np.arange(n_side), np.arange(n_side)), -1)
    dense = np.column_stack([
        g.reshape(-1, 2) * 0.01,
        0.001 * np.sin(g.reshape(-1, 2).sum(1)),
    ])
    sparse = rng.uniform(50.0, 60.0, size=(40, 3))  # spacing >> dense
    Xf = jnp.asarray(np.vstack([dense, sparse]))

    C = 4096
    q_idx = np.linspace(0, dense.shape[0] - 1, C).astype(int)
    # plant sparse-region queries at indices the radius sample skips
    # (stride = C // 1024 = 4; avoid multiples of 4)
    for j in range(sparse.shape[0]):
        q_idx[4 * j + 1] = dense.shape[0] + j
    Q = Xf[jnp.asarray(q_idx)]

    from simpleicp_tpu import IcpConfig

    cfg = IcpConfig(correspondences=C)
    with caplog.at_level(logging.INFO, "simpleicp_tpu.models.icp"):
        normals, planarity = _knn_grid_normals(Q, Xf, cfg, knn_block=2048)
    assert normals is not None, "grid plan unexpectedly uneconomical"
    assert any("uncertified" in r.message for r in caplog.records), (
        "test construction failed to force certificate failures"
    )
    nrm_d, pla_d = _icp_knn_block_jit(Q, Xf, cfg=cfg)
    np.testing.assert_array_equal(np.asarray(normals), np.asarray(nrm_d))
    np.testing.assert_array_equal(np.asarray(planarity), np.asarray(pla_d))


def test_knn_cascade_radius_planning():
    """Tight unimodal spacing -> single round at r_hi; heavy-tailed spacing
    -> a cheaper quantile radius (cap ~ r^3 makes one outlier inflate every
    query's gather cost)."""
    from simpleicp_tpu.models.icp import _knn_cascade_radius

    tight = np.full(1024, 0.01)  # d^2 samples, all equal
    r_hi = 1.25 * float(np.sqrt(tight.max()))
    assert _knn_cascade_radius(tight, r_hi) == r_hi

    tail = np.concatenate([np.full(1000, 0.01), np.full(24, 25.0)])
    r_hi_t = 1.25 * float(np.sqrt(tail.max()))
    r_lo = _knn_cascade_radius(tail, r_hi_t)
    assert r_lo < 0.2 * r_hi_t  # picks a quantile radius near the bulk


def test_grid_knn_prologue_cascade_round2(rng, caplog, monkeypatch):
    """A bimodal spacing distribution that the radius sample SEES: round 1
    runs at the quantile radius, the sparse-region queries fail its
    certificate, and cascade round 2 (regrid at r_hi) certifies them — no
    dense recompute, still bit-equal to the dense kernel."""
    import logging

    import jax.numpy as jnp

    from simpleicp_tpu import IcpConfig
    from simpleicp_tpu.models.icp import _icp_knn_block_jit, _knn_grid_normals
    from simpleicp_tpu.utils import device_policy

    monkeypatch.setattr(device_policy, "TPU_KNN10_PAIRS_PER_SEC", 1e7)

    n_side = 180  # ~32k dense points, spacing 0.01
    g = np.stack(np.meshgrid(np.arange(n_side), np.arange(n_side)), -1)
    dense = np.column_stack([
        g.reshape(-1, 2) * 0.01,
        0.001 * np.sin(g.reshape(-1, 2).sum(1)),
    ])
    gs = np.stack(np.meshgrid(np.arange(40), np.arange(40)), -1)
    sparse = np.column_stack([
        gs.reshape(-1, 2) * 0.12 + 10.0,  # spacing 12x the dense region
        0.01 * np.cos(gs.reshape(-1, 2).sum(1)),
    ])
    Xf = jnp.asarray(np.vstack([dense, sparse]))

    C = 4096
    q_idx = np.linspace(0, dense.shape[0] - 1, C).astype(int)
    # sparse queries at sampled positions (stride 4) AND unsampled ones
    for j in range(400):
        q_idx[8 * j + 4] = dense.shape[0] + (j % sparse.shape[0])
    Q = Xf[jnp.asarray(q_idx)]

    cfg = IcpConfig(correspondences=C)
    with caplog.at_level(logging.INFO, "simpleicp_tpu.models.icp"):
        normals, planarity = _knn_grid_normals(Q, Xf, cfg, knn_block=2048)
    assert normals is not None, "grid plan unexpectedly uneconomical"
    msgs = [r.message for r in caplog.records]
    assert any("regrid" in m for m in msgs), (
        "cascade round 2 did not engage: " + "; ".join(msgs)
    )
    assert not any("dense recompute" in m for m in msgs), (
        "round 2 failed to certify the tail: " + "; ".join(msgs)
    )
    nrm_d, pla_d = _icp_knn_block_jit(Q, Xf, cfg=cfg)
    np.testing.assert_array_equal(np.asarray(normals), np.asarray(nrm_d))
    np.testing.assert_array_equal(np.asarray(planarity), np.asarray(pla_d))


def test_chunk_stall_warning(rng, caplog, monkeypatch):
    """Round-4 stall observability: a chunk running far over its calibrated
    estimate logs a WARNING naming the degraded-window diagnosis (the same
    cached program was measured 2-13x slower inside such windows). Margins
    are module constants so the trigger can be tested without a real
    multi-second stall."""
    import logging

    import jax.numpy as jnp

    from simpleicp_tpu.models import icp as icp_core
    from simpleicp_tpu.models.icp import _icp_run_chunked

    X_fix = _surface(rng, 4000)
    X_mov = X_fix - np.array([0.03, 0.02, -0.01])
    monkeypatch.setattr(icp_core.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(
        "simpleicp_tpu.utils.device_policy.estimate_tpu_stage_seconds",
        lambda *a, **k: (0.0, 0.0, 0.0, 1.0),  # est 1 s/iter >> real wall? no:
    )
    # With per_iter_est=1.0 a 2-iteration chunk estimates 2 s; a healthy CPU
    # chunk runs in well under the 4x+5s margin, so NO warning fires. Then
    # shrink the margins to force the trigger deterministically.
    dt = jnp.float64
    args = (
        jnp.asarray(X_fix, dt), jnp.asarray(X_mov, dt),
        jnp.zeros(6, dt), jnp.zeros(6, dt),
        jnp.zeros((1, 3), dt), jnp.zeros((1,), dt), jnp.zeros((1,), dt),
        jnp.zeros((1,), bool),
    )
    kw = dict(cfg=IcpConfig(correspondences=256), has_normals=False,
              has_mov_planarity=False, has_ext_sel=False, chunk_iters=2,
              knn_block=0, knn_grid=False)
    with caplog.at_level(logging.WARNING, logger="simpleicp_tpu"):
        _icp_run_chunked(*args, **kw)
    assert not [r for r in caplog.records if "degraded window" in r.message]

    monkeypatch.setattr(icp_core, "_STALL_FACTOR", 0.0)
    monkeypatch.setattr(icp_core, "_STALL_SLACK_S", 0.0)
    monkeypatch.setattr(icp_core, "_STALL_MIN_EST_S", 0.0)
    with caplog.at_level(logging.WARNING, logger="simpleicp_tpu"):
        res = _icp_run_chunked(*args, **kw)
    assert int(res.error_code) == 0
    warned = [r for r in caplog.records if "degraded window" in r.message]
    assert warned, "stall warning did not fire with zeroed margins"


def test_stall_policy_cli_flag_and_validation():
    from simpleicp_tpu.cli import build_parser

    args = build_parser().parse_args(
        ["-f", "a.xyz", "-m", "b.xyz", "--stall-policy", "wait"])
    assert args.stall_policy == "wait"
    args = build_parser().parse_args(["-f", "a.xyz", "-m", "b.xyz"])
    assert args.stall_policy == "warn"
    with pytest.raises(ValueError, match="stall_policy"):
        IcpConfig(stall_policy="retry")


def test_stall_wait_budget_exhaustion(caplog, monkeypatch):
    """A worker that never answers must not deadlock the job: after the
    wait budget, _wait_for_healthy_window gives up with a warning and the
    run proceeds into the window."""
    import logging

    from simpleicp_tpu.models import icp as icp_core
    from simpleicp_tpu.utils import device_policy

    import time as _time

    monkeypatch.setattr(icp_core, "_STALL_WAIT_SLEEP_S", 0.0)
    monkeypatch.setattr(icp_core, "_STALL_WAIT_PROBE_TIMEOUT_S", 0.0)
    monkeypatch.setattr(icp_core, "_STALL_WAIT_BUDGET_S", 0.2)
    calls = []

    def never_ok(timeout_s):
        calls.append(timeout_s)
        _time.sleep(0.02)
        return ("timeout", "", 0.01)

    monkeypatch.setattr(device_policy, "probe_default_backend", never_ok)
    log = logging.getLogger("simpleicp_tpu.test_budget")
    t0 = _time.monotonic()
    with caplog.at_level(logging.WARNING,
                         logger="simpleicp_tpu.test_budget"):
        waited = icp_core._wait_for_healthy_window(log)
    # retried several times, held roughly the budget (not forever, not a
    # single attempt), and announced giving up
    assert len(calls) >= 2, "budget path must retry before giving up"
    assert 0.15 <= waited <= 5.0
    assert _time.monotonic() - t0 < 10.0
    assert any("proceeding into the degraded window" in r.message
               for r in caplog.records)


def test_chunk_stall_policy_wait(rng, caplog, monkeypatch):
    """stall_policy='wait' (round-4 verdict item 2): after a detected
    overrun, the dispatcher must HOLD the next chunk until the health probe
    answers ok — retrying failed probes — then resume with the
    device-resident carry (results unchanged) and log cumulative
    stall-wait seconds. Probes are faked so the wait path runs on CPU."""
    import logging

    import jax.numpy as jnp

    from simpleicp_tpu.models import icp as icp_core
    from simpleicp_tpu.models.icp import _icp_run_chunked
    from simpleicp_tpu.utils import device_policy

    X_fix = _surface(rng, 4000)
    X_mov = X_fix - np.array([0.03, 0.02, -0.01])
    monkeypatch.setattr(icp_core.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(
        "simpleicp_tpu.utils.device_policy.estimate_tpu_stage_seconds",
        lambda *a, **k: (0.0, 0.0, 0.0, 1.0),
    )
    # Zeroed margins: every post-first chunk counts as an overrun.
    monkeypatch.setattr(icp_core, "_STALL_FACTOR", 0.0)
    monkeypatch.setattr(icp_core, "_STALL_SLACK_S", 0.0)
    monkeypatch.setattr(icp_core, "_STALL_MIN_EST_S", 0.0)
    monkeypatch.setattr(icp_core, "_STALL_WAIT_SLEEP_S", 0.0)
    monkeypatch.setattr(icp_core, "_STALL_WAIT_PROBE_TIMEOUT_S", 0.0)
    monkeypatch.setattr(icp_core, "_STALL_WAIT_BUDGET_S", 30.0)

    probes = []

    def fake_probe(timeout_s):
        # first probe of each hold answers timeout (still degraded), the
        # retry answers ok — exercising the retry loop
        probes.append(timeout_s)
        return ("ok" if len(probes) % 2 == 0 else "timeout", "tpu", 0.01)

    monkeypatch.setattr(device_policy, "probe_default_backend", fake_probe)

    dt = jnp.float64
    args = (
        jnp.asarray(X_fix, dt), jnp.asarray(X_mov, dt),
        jnp.zeros(6, dt), jnp.zeros(6, dt),
        jnp.zeros((1, 3), dt), jnp.zeros((1,), dt), jnp.zeros((1,), dt),
        jnp.zeros((1,), bool),
    )
    cfg_warn = IcpConfig(correspondences=256)
    cfg_wait = dataclasses.replace(cfg_warn, stall_policy="wait")
    kw = dict(has_normals=False, has_mov_planarity=False, has_ext_sel=False,
              chunk_iters=1, knn_block=0, knn_grid=False)

    with caplog.at_level(logging.INFO, logger="simpleicp_tpu"):
        res_wait = _icp_run_chunked(*args, cfg=cfg_wait, **kw)
    assert int(res_wait.error_code) == 0
    # the probe loop engaged (>= 2 calls: a failed probe + its ok retry)
    assert len(probes) >= 2 and len(probes) % 2 == 0, probes
    held = [r for r in caplog.records if "Holding the next chunk" in r.message]
    assert held, "wait policy did not announce the hold"
    cum = [r for r in caplog.records
           if "cumulative stall-wait" in r.message]
    assert cum, "cumulative stall-wait seconds were not logged"
    total = [r for r in caplog.records if "total stall-wait" in r.message]
    assert total, "end-of-run stall-wait summary missing"

    # bit-neutrality: waiting must not change any result field
    probes.clear()
    caplog.clear()
    res_warn = _icp_run_chunked(*args, cfg=cfg_warn, **kw)
    assert not probes, "stall_policy='warn' must never probe"
    for field in res_wait._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(res_wait, field)),
            np.asarray(getattr(res_warn, field)), err_msg=field)
