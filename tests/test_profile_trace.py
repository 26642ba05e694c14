"""Unit tests of scripts/profile_trace.py's trace parsing — the tool that
produced profile_trace_r5.json (the committed device-time table). Pins the
aggregation rules on a synthetic perfetto trace: device-process filtering,
'XLA Ops' vs 'XLA Modules' lane split, module-name normalization, and the
documented caveat that module-lane totals (not op sums, which double-count
nested while bodies) are the authoritative per-launch device time."""

import gzip
import importlib.util
import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(__file__))


@pytest.fixture()
def profile_trace_mod(monkeypatch):
    """Load scripts/profile_trace.py without permanently polluting
    sys.path with the scripts/ dir (its generically-named siblings like
    `benchmark` would otherwise shadow later imports on this worker —
    monkeypatch.syspath_prepend is undone at teardown; the module's own
    repo-root insertion is harmless)."""
    monkeypatch.syspath_prepend(os.path.join(ROOT, "scripts"))
    path = os.path.join(ROOT, "scripts", "profile_trace.py")
    spec = importlib.util.spec_from_file_location("profile_trace", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "vm.trace.json.gz", "wt") as fh:
        json.dump({"traceEvents": events}, fh)
    return str(tmp_path)


def test_parse_trace_filters_and_aggregates(tmp_path, profile_trace_mod):
    pt = profile_trace_mod
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 7, "tid": 1, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        # module launches twice: 100 + 140 us; name carries a fingerprint
        # suffix that must normalize away
        {"ph": "X", "pid": 3, "tid": 2, "name": "jit_f(123456)", "dur": 100},
        {"ph": "X", "pid": 3, "tid": 2, "name": "jit_f(123456)", "dur": 140},
        # ops: a while spanning a nested fusion (double-count hazard)
        {"ph": "X", "pid": 3, "tid": 3, "name": "while.1", "dur": 90},
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.2", "dur": 80},
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.2", "dur": 60},
        # host-side op with the same name must NOT count
        {"ph": "X", "pid": 7, "tid": 1, "name": "fusion.2", "dur": 9999},
        # non-X phases ignored
        {"ph": "B", "pid": 3, "tid": 3, "name": "fusion.2", "ts": 0},
    ]
    ops, modules = pt._parse_trace(_write_trace(tmp_path, events))
    assert modules == {"jit_f": {"us": 240.0, "count": 2}}
    assert ops["while.1"] == {"us": 90.0, "count": 1}
    assert ops["fusion.2"] == {"us": 140.0, "count": 2}

    # authoritative per-launch device time = module lane / launches
    assert sum(v["us"] for v in modules.values()) / 2 == 120.0
    # op-sum exceeds it (nested while double-counts) — the documented
    # reason _op_table is attribution detail, not a total
    assert sum(v["us"] for v in ops.values()) > 140.0


def test_op_table_sorts_and_normalizes_reps(tmp_path, profile_trace_mod):
    pt = profile_trace_mod
    ops = {
        "big": {"us": 1000.0, "count": 10},
        "small": {"us": 10.0, "count": 5},
        "mid": {"us": 500.0, "count": 5},
    }
    table = pt._op_table(ops, n_reps=5, top=2)
    assert [r["op"] for r in table] == ["big", "mid"]
    assert table[0] == {"op": "big", "device_us_per_run": 200.0,
                        "calls_per_run": 2}
