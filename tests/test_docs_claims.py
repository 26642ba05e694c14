"""Docs must quote the committed driver BENCH artifact verbatim.

Rounds 3 AND 4 both shipped a README/BENCHMARKS dragon headline taken from
a builder-session run that disagreed with the committed driver capture
(round 4: docs said 34.2 ms [32.5-35.1] while BENCH_r04.json said 38.1 ms
[36.5-42.7] — non-overlapping spreads). This test closes the loop
structurally: every doc paragraph that quotes a driver capture must use the
pinned format

    **<V> ms** median of <N> repeats [<MIN>-<MAX> ms]
    (committed driver capture `BENCH_rNN.json`)

and the numbers must equal the cited artifact's value/min/max (converted to
ms, tolerance = the artifact's own 0.1 ms rounding). A future re-capture
then REQUIRES editing docs and artifact together; a session number pasted
over the quote fails here immediately.
"""

import json
import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(__file__))

# value, min, max in ms + the cited artifact filename (en-dash or hyphen)
_QUOTE_RE = re.compile(
    r"\*\*(?P<val>\d+(?:\.\d+)?) ms\*\* median of (?P<n>\d+) repeats\s+"
    r"\[(?P<min>\d+(?:\.\d+)?)[–-](?P<max>\d+(?:\.\d+)?) ms\]\s+"
    r"\(committed driver capture `(?P<artifact>BENCH_r\d+\.json)`\)",
    re.DOTALL,
)


def _load_artifact(name):
    path = os.path.join(ROOT, name)
    assert os.path.exists(path), f"docs cite {name} but it is not committed"
    with open(path) as fh:
        parsed = json.load(fh)["parsed"]
    assert parsed["metric"] == "dragon_registration_wall_time"
    return parsed


def _check_doc(doc):
    path = os.path.join(ROOT, doc)
    with open(path) as fh:
        text = fh.read()
    quotes = list(_QUOTE_RE.finditer(text))
    assert quotes, (
        f"{doc} has no pinned driver-capture quote — the dragon headline "
        "must cite its BENCH_rNN.json artifact in the pinned format"
    )
    for m in quotes:
        art = _load_artifact(m.group("artifact"))
        # artifact rounds to 4 decimals of a second = 0.1 ms granularity
        tol = 0.051
        for key, field in (("val", "value"), ("min", "min"), ("max", "max")):
            quoted = float(m.group(key))
            actual = art[field] * 1000.0
            assert abs(quoted - actual) <= tol, (
                f"{doc} quotes {key}={quoted} ms but {m.group('artifact')} "
                f"says {actual:.1f} ms — doc drifted from the committed "
                "driver capture"
            )
        assert int(m.group("n")) == art.get("n_repeats", int(m.group("n"))), (
            f"{doc} quotes a repeat count that disagrees with the artifact"
        )
        # the quoted median must lie inside the artifact's own spread
        assert art["min"] <= art["value"] <= art["max"]


@pytest.mark.parametrize("doc", ["README.md", "BENCHMARKS.md"])
def test_dragon_headline_matches_committed_bench_artifact(doc):
    _check_doc(doc)


def test_no_stale_session_medians_as_headline():
    """The README paragraph that carries the pinned quote must not ALSO
    present a bare session median in the driver-capture format (the exact
    drift pattern: both numbers present, reader quotes the flattering
    one). Bare session numbers are allowed only when labeled as such —
    the word 'session' within the same sentence."""
    with open(os.path.join(ROOT, "README.md")) as fh:
        text = fh.read()
    # any "NN.N ms — ... driver" claim outside the pinned format is drift
    for m in re.finditer(r"(\d+\.\d+) ms — [^.]*driver-captured", text):
        raise AssertionError(
            f"README labels a loose number as driver-captured: {m.group(0)!r}"
        )
