"""Pallas dilation kernel vs the lax reference path: bit-identical grids.

Runs the Pallas kernel in interpret mode on CPU (tests/conftest.py forces
the CPU backend) against `_dilate_packed_multi` on small packed grids with
both synthetic and real plan stencils. Integer-only semantics means the
two must agree bit for bit at every word.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from simpleicp_tpu.ops.dilate_gate import (
    _dilate_packed_multi,
    plan_dilate_gate,
)
from simpleicp_tpu.ops.dilate_pallas import dilate_packed_multi_pallas


def _random_occ(rng, wz, nx, ny, density=0.02):
    words = rng.random((wz, nx, ny)) < density
    bits = rng.integers(0, 2**32, size=(wz, nx, ny), dtype=np.uint32)
    return jnp.asarray(np.where(words, bits, np.uint32(0)))


@pytest.mark.parametrize("shape", [(2, 40, 48), (3, 17, 33), (1, 64, 130)])
def test_pallas_matches_lax_synthetic_stencils(shape):
    rng = np.random.default_rng(7)
    occ = _random_occ(rng, *shape)
    # NB: the lax reference path's batch padding assumes the (0, 0) column
    # carries the stencil's maximal z-radius (true of every real IN/POSS
    # stencil; see _dilate_packed_multi), so synthetic stencils must
    # respect that precondition too.
    stencil_a = tuple(
        (int(dx), int(dy), 4 - max(abs(dx), abs(dy)))
        for dx in range(-2, 3)
        for dy in range(-2, 3)
    )
    stencil_b = ((0, 0, 3), (1, -1, 0), (-2, 0, 1))
    want = _dilate_packed_multi(occ, [stencil_a, stencil_b])
    got = dilate_packed_multi_pallas(
        occ, [stencil_a, stencil_b], interpret=True
    )
    assert got is not None
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_pallas_matches_lax_real_plan_stencils():
    # Real IN/POSS stencils from a coarse plan (cell_div=4 keeps the
    # interpret-mode runtime reasonable) over a synthetic cloud.
    rng = np.random.default_rng(3)
    pts = rng.random((500, 3)) * np.array([8.0, 6.0, 4.0])
    plan = plan_dilate_gate(None, pts, 1.0, cell_div=4)
    assert plan is not None
    from simpleicp_tpu.ops.dilate_gate import pack_occupancy

    occ = jnp.asarray(
        pack_occupancy(pts, plan, np.float64).reshape(
            plan.wz, plan.dims[0], plan.dims[1]
        )
    )
    want = _dilate_packed_multi(occ, [plan.in_offsets, plan.poss_offsets])
    got = dilate_packed_multi_pallas(
        occ, [plan.in_offsets, plan.poss_offsets], interpret=True
    )
    assert got is not None
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_pallas_empty_stencil_list_entries():
    rng = np.random.default_rng(11)
    occ = _random_occ(rng, 2, 20, 20)
    got = dilate_packed_multi_pallas(occ, [(), ()], interpret=True)
    assert got is not None
    for g in got:
        assert not np.asarray(g).any()
