"""The stdout logging contract — the reference's cross-implementation
conformance surface (SURVEY.md §5: stage banners, iteration table with an
orig:0 row, convergence line, 4x4 H in [%12.6f] rows, rbp table, and the
'Finished in N.NNN seconds!' line parsed by the benchmark harness)."""

import logging
import re

import numpy as np
import pytest

from simpleicp_tpu import PointCloud, SimpleICP


@pytest.fixture()
def run_capture(rng, caplog):
    xy = rng.uniform(-2, 2, size=(4000, 2))
    z = 0.3 * np.sin(2 * xy[:, 0]) + 0.2 * np.cos(3 * xy[:, 1])
    X1 = np.column_stack([xy, z])
    X2 = X1 - np.array([0.03, 0.02, -0.01])
    icp = SimpleICP(verbose=False)
    icp.add_point_clouds(PointCloud(X1), PointCloud(X2))
    with caplog.at_level(logging.INFO, logger="simpleicp_tpu"):
        icp.run(max_iterations=30)
    return [r.getMessage() for r in caplog.records]


def test_stage_banners(run_capture):
    msgs = "\n".join(run_capture)
    assert "Select points for correspondences in fixed point cloud ..." in msgs
    assert "Estimate normals of selected points ..." in msgs
    assert "Start iterations ..." in msgs


def test_iteration_table_format(run_capture):
    header = [m for m in run_capture if "correspondences" in m and "mean" in m]
    assert header, "iteration table header missing"
    assert re.search(
        r"Iteration \|\s+correspondences \|\s+mean\(residuals\) \|\s+std\(residuals\)",
        header[0],
    )
    orig = [m for m in run_capture if "orig:0" in m]
    assert orig, "orig:0 row missing"
    # orig row: "   orig:0 |            NNNN |          x.xxxx |          x.xxxx"
    assert re.match(
        r"\s+orig:0 \|\s+\d+ \|\s+-?\d+\.\d{4} \|\s+-?\d+\.\d{4}$", orig[0]
    )


def test_convergence_line_and_H_format(run_capture):
    msgs = run_capture
    assert "Convergence criteria fulfilled -> stop iteration!" in msgs
    assert "Estimated transformation matrix H:" in msgs
    h_rows = [m for m in msgs if re.match(
        r"\[\s*-?\d+\.\d{6}\s+-?\d+\.\d{6}\s+-?\d+\.\d{6}\s+-?\d+\.\d{6}\]$", m
    )]
    assert len(h_rows) == 4, f"expected 4 H rows, got {len(h_rows)}"


def test_rbp_table_and_finished_line(run_capture):
    msgs = run_capture
    for name in ("alpha1", "alpha2", "alpha3", "tx", "ty", "tz"):
        assert any(re.match(rf"\s+{name} \|", m) for m in msgs), name
    assert any(
        "(Unit of est.value, est.uncertainty, and obs.value for alpha1/2/3 "
        "is degree)" in m
        for m in msgs
    )
    fin = [m for m in msgs if m.startswith("Finished in ")]
    # exact benchmark-harness contract (reference scripts/benchmark.sh:45-51)
    assert fin and re.match(r"Finished in \d+\.\d{3} seconds!$", fin[-1])
