"""CLI contract (reference flag names/defaults) and xyz I/O edge cases."""

import numpy as np
import pytest

from simpleicp_tpu.cli import build_parser, main
from simpleicp_tpu.utils.xyz_io import XyzIOError, read_xyz, write_xyz

DATA = "/root/reference/data"


def test_flag_names_match_reference_contract():
    """Short+long option names follow the C++/Rust CLIs
    (/root/reference/c++/src/simpleicp-cli.cpp:15-35,
    /root/reference/rust/src/main.rs:8-9: underscores, not dashes)."""
    p = build_parser()
    args = p.parse_args([
        "-f", "a.xyz", "-m", "b.xyz", "-c", "500", "-n", "5", "-p", "0.5",
        "-o", "2.0", "-i", "0.5", "-x", "20",
    ])
    assert args.correspondences == 500
    assert args.neighbors == 5
    assert args.min_planarity == 0.5
    assert args.max_overlap_distance == 2.0
    assert args.min_change == 0.5
    assert args.max_iterations == 20
    # defaults
    d = p.parse_args(["-f", "a", "-m", "b"])
    assert (d.correspondences, d.neighbors, d.min_planarity) == (1000, 10, 0.3)
    assert (d.max_overlap_distance, d.min_change, d.max_iterations) == (-1.0, 1.0, 100)


def test_preset_flags_resolve():
    """--preset maps to the per-implementation semantics table; explicit
    quirk flags still override."""
    from simpleicp_tpu.cli import PRESETS

    assert PRESETS["python"] == ("nonlinear", 1.0, 1.0, "python", 0)
    assert PRESETS["rust"] == ("linearized", 1.0, 1.4826, "joint", 1)
    assert PRESETS["julia"][1] == 3.0  # SURVEY.md Q3
    p = build_parser()
    a = p.parse_args(["-f", "a", "-m", "b", "--preset", "julia",
                      "--std_ddof", "0"])
    assert a.preset == "julia" and a.std_ddof == 0


def test_cli_end_to_end_with_export(tmp_path):
    out = tmp_path / "out.xyz"
    rc = main([
        "-f", f"{DATA}/bunny_part1.xyz", "-m", f"{DATA}/bunny_part2.xyz",
        "-o", "1", "--quiet", "--export", str(out),
    ])
    assert rc == 0
    X = read_xyz(out)
    assert X.shape == (21637, 3)


def test_read_xyz_missing_file():
    with pytest.raises(XyzIOError, match="does not exist"):
        read_xyz("/nonexistent/nope.xyz")


def test_read_xyz_wrong_columns(tmp_path):
    bad = tmp_path / "bad.xyz"
    bad.write_text("1 2 3 4\n5 6 7 8\n")
    with pytest.raises(XyzIOError):
        read_xyz(bad)


def test_read_xyz_comments_and_blanks(tmp_path):
    f = tmp_path / "ok.xyz"
    f.write_text("//X Y Z\n\n1 2 3\n  4\t5 6  \n\n")
    X = read_xyz(f)
    np.testing.assert_array_equal(X, [[1, 2, 3], [4, 5, 6]])


def test_read_xyz_non_numeric(tmp_path):
    f = tmp_path / "nan.xyz"
    f.write_text("1 2 three\n")
    with pytest.raises(XyzIOError):
        read_xyz(f)


def test_write_read_roundtrip(tmp_path, rng):
    X = rng.standard_normal((100, 3))
    f = tmp_path / "rt.xyz"
    write_xyz(f, X, fmt="%.9f")
    np.testing.assert_allclose(read_xyz(f), X, atol=1e-8)


def test_native_makefile_sources_in_sync():
    """The Makefile's SRCS must list every translation unit the ctypes
    loader expects (_SOURCES): a missing one produces a library whose
    undefined symbols only surface at first call (round 5 found
    argsort.cpp absent — a clean `make` rebuild broke argsort_native)."""
    import os
    import re

    nat = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                       "simpleicp_tpu", "native")
    with open(os.path.join(nat, "Makefile")) as fh:
        m = re.search(r"^SRCS\s*=\s*(.+)$", fh.read(), re.MULTILINE)
    assert m, "Makefile has no SRCS line"
    from simpleicp_tpu.native import _SOURCES

    assert set(m.group(1).split()) == set(_SOURCES)


def test_native_parser_if_built(tmp_path, rng):
    """The ctypes-loaded C++ mmap parser agrees with the Python reader."""
    try:
        from simpleicp_tpu.native import read_xyz_native
    except ImportError:
        pytest.skip("native parser not built")
    X = rng.standard_normal((500, 3))
    f = tmp_path / "n.xyz"
    write_xyz(f, X, fmt="%.9f")
    np.testing.assert_allclose(read_xyz_native(str(f)), read_xyz(f), atol=0)
    bad = tmp_path / "bad.xyz"
    bad.write_text("1 2\n")
    with pytest.raises(XyzIOError):
        read_xyz_native(str(bad))


def test_native_writer_if_built(tmp_path, rng):
    """The native multithreaded %.Nf writer is byte-identical to np.savetxt
    (exact 128-bit fixed-point conversion incl. printf's half-to-even ties
    and '-0.000' sign); write_xyz routes plain %.Nf formats to it and
    falls back to np.savetxt for anything else."""
    try:
        from simpleicp_tpu.native import write_xyz_native
    except ImportError:
        pytest.skip("native writer not built")
    X = np.concatenate(
        [
            rng.uniform(-1000.0, 1000.0, (200, 3)),
            np.array(
                [
                    [0.0, -0.0, 0.5],
                    [1.25, 2.675, -0.0005],  # printf tie cases
                    [1e12, -1e12, 5e-324],
                    [np.inf, -np.inf, np.nan],  # snprintf fallback rows
                ]
            ),
        ]
    )
    for dec in (3, 6, 9):
        f_nat = tmp_path / f"nat{dec}.xyz"
        write_xyz_native(str(f_nat), X, decimals=dec)
        f_py = tmp_path / f"py{dec}.xyz"
        with open(f_py, "w") as fh:
            fh.write("//X Y Z\n")
            np.savetxt(fh, X, fmt=f"%.{dec}f", delimiter=" ")
        assert f_nat.read_bytes() == f_py.read_bytes()
    # write_xyz: %.Nf routes native, exotic formats fall back to savetxt
    f1 = tmp_path / "routed.xyz"
    write_xyz(f1, X[:200], fmt="%.6f")
    assert f1.read_bytes() == (tmp_path / "py6.xyz").read_bytes()[
        : len(f1.read_bytes())
    ] or np.allclose(read_xyz(f1), X[:200], atol=1e-6)
    f2 = tmp_path / "sci.xyz"
    write_xyz(f2, X[:10], fmt="%.3e")
    assert b"e+" in f2.read_bytes() or b"e-" in f2.read_bytes()


def test_native_parser_parallel_path(tmp_path, rng):
    """Files above the 4 MB chunking threshold take the multithreaded parse
    (per-thread line-aligned chunks): same values, same first-error line
    number as the serial contract."""
    try:
        from simpleicp_tpu.native import read_xyz_native
    except ImportError:
        pytest.skip("native parser not built")
    n = 200_000  # ~6 MB at %.6f > 4 MB parallel threshold
    X = np.round(rng.uniform(-1000.0, 1000.0, (n, 3)), 6)
    f = tmp_path / "big.xyz"
    with open(f, "w") as fh:
        fh.write("//X Y Z\n")
        np.savetxt(fh, X, fmt="%.6f")
    assert f.stat().st_size > (4 << 20)
    got = read_xyz_native(str(f))
    assert got.shape == (n, 3)
    np.testing.assert_allclose(got, X, atol=1e-9)  # 2 ULP fast-path rounding
    # A malformed line deep in the file reports its exact 1-based global
    # line number (header + n points + 1).
    with open(f, "a") as fh:
        fh.write("not a point\n")
    with pytest.raises(XyzIOError, match=rf"line {n + 2}"):
        read_xyz_native(str(f))


def test_device_routing_policy():
    """--device auto cost model: small jobs (dragon-size and below) route
    to the local CPU backend, big ones keep the accelerator; explicit
    choices and sharded runs always win over the estimate."""
    from simpleicp_tpu.utils.device_policy import resolve_device

    # dragon ungated (the CLI default, no -o): ~1 s CPU estimate -> CPU
    assert resolve_device("auto", 100_000, 100_000) == "cpu"
    # bunny gated (-o 1): ~2 s CPU estimate -> CPU
    assert resolve_device(
        "auto", 21637, 21873, max_overlap_distance=1.0
    ) == "cpu"
    # gated 1e5 x 1e5: the IN-PROGRAM gate runs ~2.5e8 pairs/s on CPU
    # (measured), so 1e10 gate pairs estimate ~40 s -> accelerator
    assert resolve_device(
        "auto", 100_000, 100_000, max_overlap_distance=1.0
    ) == "default"
    # ungated estimates drop the nf*nm gate term
    assert resolve_device("auto", 10**6, 10**6) == "cpu"
    # explicit choices win
    assert resolve_device("cpu", 10**8, 10**8) == "cpu"
    assert resolve_device("tpu", 10, 10) == "default"
    # a requested device mesh is never second-guessed
    assert resolve_device("auto", 10, 10, sharded=True) == "default"
    with pytest.raises(ValueError):
        resolve_device("gpu", 1, 1)


def test_cli_device_flag(tmp_path):
    """--device cpu end-to-end (under the CPU-forced test env the routing
    is a no-op platform update; this locks the flag contract + plumbing)."""
    p = build_parser()
    assert p.parse_args(["-f", "a", "-m", "b"]).device == "auto"
    rc = main([
        "-f", f"{DATA}/bunny_part1.xyz", "-m", f"{DATA}/bunny_part2.xyz",
        "-o", "1", "--quiet", "--device", "cpu",
    ])
    assert rc == 0


def test_cli_observation_flags(caplog):
    """--observed-values/--observation-weights (TPU-build extension: the
    reference exposes rbp observations via the Python API only) make the
    multisensor config CLI-runnable: alpha1/alpha2 frozen at the observed
    values."""
    import logging

    with caplog.at_level(logging.INFO, logger="simpleicp_tpu.api"):
        rc = main([
            "-f", f"{DATA}/multisensor_lidar.xyz",
            "-m", f"{DATA}/multisensor_radar.xyz", "-o", "1",
            "--observed-values=-0.5,0,0,0,0,0",
            "--observation-weights=inf,inf,0,0,0,0",
        ])
    assert rc == 0
    line_a1 = next(
        ln for ln in caplog.text.splitlines() if "alpha1" in ln and "|" in ln
    )
    assert "-0.500000" in line_a1 and "inf" in line_a1
    # malformed spec -> clean SystemExit, not a traceback
    with pytest.raises(SystemExit, match="six comma-separated"):
        main(["-f", "a", "-m", "b", "--observed-values=1,2,3"])


def test_cli_gate_method_flag(tmp_path, capsys):
    """--gate-method routes the overlap gate engine; 'dilate' must produce
    the same registration as the default on a gated run."""
    import numpy as np

    from simpleicp_tpu.cli import main
    from simpleicp_tpu.utils.xyz_io import read_xyz, write_xyz

    rng = np.random.default_rng(3)
    xy = rng.uniform(-2, 2, size=(1500, 2))
    X1 = np.column_stack([xy, 0.3 * np.sin(2 * xy[:, 0])])
    X2 = (X1 - np.array([0.03, -0.02, 0.01]))[:1200]
    f1, f2 = tmp_path / "a.xyz", tmp_path / "b.xyz"
    write_xyz(f1, X1)
    write_xyz(f2, X2)

    outs = {}
    for gm in ("brute", "dilate"):
        exp = tmp_path / f"out_{gm}.xyz"
        rc = main([
            "-f", str(f1), "-m", str(f2), "-o", "0.7",
            "--gate-method", gm, "--export", str(exp), "--quiet",
        ])
        assert rc == 0
        outs[gm] = read_xyz(exp)
    np.testing.assert_array_equal(outs["brute"], outs["dilate"])


def test_degraded_fallback_policy():
    """Routing policy after a failed accelerator health probe: auto falls
    back to CPU for CPU-tractable jobs, proceeds-with-warning otherwise;
    forced tpu always proceeds; a healthy probe changes nothing."""
    from simpleicp_tpu.utils.device_policy import (
        DEGRADED_CPU_FALLBACK_MAX_S,
        degraded_fallback,
    )

    assert degraded_fallback("auto", "ok", 100.0) == ("default", None)
    res, msg = degraded_fallback("auto", "timeout", 100.0)
    assert res == "cpu" and "routing" in msg
    res, msg = degraded_fallback(
        "auto", "timeout", DEGRADED_CPU_FALLBACK_MAX_S * 10
    )
    assert res == "default" and "too large" in msg
    res, msg = degraded_fallback("tpu", "error", 1.0)
    assert res == "default" and "forced" in msg


def test_probe_default_backend_subprocess():
    """The health probe runs a real subprocess (CPU here via JAX_PLATFORMS)
    and reports its backend."""
    from simpleicp_tpu.utils.device_policy import probe_default_backend

    status, backend, dt = probe_default_backend(timeout_s=240.0)
    assert status == "ok"
    assert backend == "cpu"  # conftest exports JAX_PLATFORMS=cpu
    assert dt < 240.0


def test_cli_probe_warns_on_degraded_worker(tmp_path, capsys, monkeypatch):
    """--device tpu + a failing probe: the CLI warns loudly and proceeds
    (conftest pins the actual backend to CPU, so the run still completes)."""
    from simpleicp_tpu.utils import device_policy

    monkeypatch.setattr(
        device_policy, "probe_default_backend",
        lambda timeout_s: ("timeout", "", timeout_s),
    )
    rc = main([
        "-f", "/root/reference/data/dragon1.xyz",
        "-m", "/root/reference/data/dragon2.xyz",
        "--device", "tpu", "--probe-timeout", "5",
    ])
    assert rc == 0
    err = capsys.readouterr().err
    assert "WARNING" in err and "stalled or recovering" in err
