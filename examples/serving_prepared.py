"""Serving example: many movable clouds against ONE prepared fixed map.

A localization-style workload registers a stream of scans against the same
reference cloud. Without an overlap gate, the pipeline's fixed-side work —
correspondence selection (the reference formula) and normals at the
selected points — is movable-independent, so `prepare_fixed` computes it
once and every registration skips it (dragon: 4.2 ms of the 9.5 ms device
time, profile_trace_r5.json; the C=1e5 x 12.5M headline: ~10 s of its
~22 s). Results are bit-identical to self-contained runs
(tests/test_prepared.py). The reference recomputes selection + normals per
run (/root/reference/python/simpleicp/simpleicp.py:262-283).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from simpleicp_tpu import IcpConfig, icp_register, prepare_fixed
from simpleicp_tpu.utils.xyz_io import read_xyz

DATA = "/root/reference/data"


def main():
    X_fix = read_xyz(os.path.join(DATA, "dragon1.xyz"))
    X_mov = read_xyz(os.path.join(DATA, "dragon2.xyz"))

    cfg = IcpConfig()  # gate disabled — selection is movable-independent
    prep = prepare_fixed(X_fix, cfg)  # one-time, per fixed map
    # a deployment would persist it and load at serving startup:
    #   prep.save("map_prep.npz"); prep = load_fixed_prep("map_prep.npz")

    # a stream of scans (here: perturbed copies standing in for new frames)
    rng = np.random.default_rng(0)
    results = []
    for _ in range(4):
        scan = X_mov + rng.uniform(-1e-6, 1e-6, (1, 3))
        res = icp_register(X_fix, scan, cfg, fixed_prep=prep)
        assert int(res.error_code) == 0
        results.append(np.asarray(res.H))
        print(f"registered: {int(res.n_iterations)} iterations, "
              f"converged={bool(res.converged)}")
    return results


if __name__ == "__main__":
    main()
