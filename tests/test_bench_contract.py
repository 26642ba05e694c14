"""bench.py is the driver contract: ONE JSON line with metric/value/unit/
vs_baseline, plus the round-3 spread fields and the round-5 in-session
tunnel floor (the session-drift normalizer — round-4 verdict item 1).
Run end-to-end on the CPU backend so the contract is CI-checkable."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(__file__))

REQUIRED = ("metric", "value", "unit", "vs_baseline")
SPREAD = ("n_repeats", "min", "max")
FLOOR = ("tunnel_floor_s", "tunnel_floor_min", "tunnel_floor_max")


@pytest.mark.slow
def test_bench_emits_full_contract_line():
    if not os.path.exists("/root/reference/data/dragon1.xyz"):
        pytest.skip("reference data not present")
    env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_PROBE_BUDGET_S="120",
               SIMPLEICP_TPU_CACHE="")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, timeout=560, env=env, cwd=ROOT,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, f"expected ONE JSON line, got: {r.stdout!r}"
    rec = json.loads(lines[0])
    for key in REQUIRED + SPREAD + FLOOR:
        assert key in rec, f"contract field {key} missing"
    assert rec["metric"] == "dragon_registration_wall_time"
    assert rec["unit"] == "s"
    assert 0 < rec["min"] <= rec["value"] <= rec["max"]
    assert rec["n_repeats"] >= 9
    assert 0 < rec["tunnel_floor_min"] <= rec["tunnel_floor_s"] \
        <= rec["tunnel_floor_max"]
    # the floor is dispatch+fetch of a trivial program — it cannot exceed
    # a full registration's wall time
    assert rec["tunnel_floor_s"] < rec["value"]
    assert rec["vs_baseline"] == pytest.approx(0.07 / rec["value"], rel=0.05)
