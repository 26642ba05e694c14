"""Pallas TPU kernel for the packed-occupancy stencil dilation.

The lax dilation (`dilate_gate._dilate_packed_multi`) applies each of the
~1600 stencil offsets as a full-grid dynamic-slice window read: every
_ROLL_BATCH-sized fori step re-streams the 569 MB word grid from HBM, so
the pass is bandwidth-bound ~5x off the roofline (measured 2.26 s at the
12.5M tiled-dragon scale, scripts/diag_classify_fused.py). This kernel
restructures the computation the way the hardware wants it:

  - the grid is read from HBM ONCE per (x, y) block — a halo'd
    (wz, BX+2P, BY+2P) window DMA'd into VMEM;
  - the incremental z-expansion (packed bit-shift ORs) and every (dx, dy)
    window OR run entirely in VMEM as static slices — zero HBM traffic;
  - both stencils (the classify's IN + POSS pair) accumulate into their
    output blocks in the same pass, sharing the z-expansion exactly like
    the lax version.

Total HBM traffic drops from ~200 grid streams to ~2 reads + 2 writes of
the grid; the pass becomes VPU-compute-bound on the in-VMEM window
selection. Results are bit-identical to the lax path (integer ops only,
same shift/OR/window semantics; locked by tests/test_dilate_pallas.py in
interpret mode AND by on-hardware probes over the production geometries —
scripts/diag_dilate_bug*.py, which also pinned down a real Mosaic
lowering bug: dynamic_rotate with NEGATIVE shifts lands every bit a
constant (sublane-group, lane-group) offset away, so all dynamic shifts
here are normalized to [0, n).

Reference capability this accelerates: the KD-tree overlap gate
(/root/reference/python/simpleicp/pointcloud.py:161-171) at cloud sizes
the reference cannot reach.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM plan budget: headroom under the 16 MB scoped-VMEM limit (the
# estimate already counts rotate temporaries and double-buffered outputs,
# but Mosaic's stack allocation adds its own slack).
_VMEM_BUDGET = 13 << 20


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _vmem_est(wz: int, BX: int, BY: int, PX: int, PY: int,
              n_out: int) -> int:
    """VMEM footprint of one program: occ tile + oz tile + up to two live
    rotate temporaries (all halo'd tile sized), plus n_out output blocks
    double-buffered by the Pallas pipeline. Measured ground truth: the
    12.5M geometry (wz=52) at a 2-tile estimate requested 17.76M > 16M."""
    tile = (BX + 2 * PX) * (BY + 2 * PY)
    out = BX * BY
    return 4 * wz * (4 * tile + 2 * n_out * out)


def _plan_blocks(wz: int, nx: int, ny: int, PX: int, PY: int,
                 n_out: int) -> Optional[Tuple[int, int]]:
    """Pick the output block (BX, BY); the halo'd input tile is
    (BX + 2PX, BY + 2PY). The TPU lowering requires output block dims
    divisible by (8, 128) — and the dynamic rotates of the looped window
    form require every vector shape aligned — so BY is 128/256, BX walks
    multiples of 8, and the outputs are emitted grid-padded (sliced back
    by the caller). Among feasible plans, prefer the one with the best
    compute efficiency (output words per halo'd tile word), then the
    largest block."""
    # Blocks may exceed tiny grids (padding covers them) but never by more
    # than one alignment unit — oversize blocks only waste compute.
    by_opts = [128] if ny <= 128 else [128, 256]
    bx_max = _round_up(max(nx, 8), 8)
    bx_opts = list(range(8, min(bx_max, 2040) + 8, 8))
    best = None
    best_key = None
    for BY in by_opts:
        for BX in bx_opts:
            if _vmem_est(wz, BX, BY, PX, PY, n_out) > _VMEM_BUDGET:
                break
            eff = (BX * BY) / ((BX + 2 * PX) * (BY + 2 * PY))
            key = (round(eff, 3), BX * BY)
            if best_key is None or key > best_key:
                best, best_key = (BX, BY), key
    return best


def _group_by_z(offsets):
    by_z = {}
    for dx, dy, z in offsets:
        by_z.setdefault(z, []).append((dx, dy))
    return by_z


# Window ORs with at most this many total stencil entries are unrolled as
# static VMEM slices; larger stencils run as fori_loops over an SMEM offset
# table with dynamic slice starts. Fully unrolling the production
# cell_div=16 stencils (~1600 entries x ~200 vregs each) stalled the
# Mosaic compile for >25 minutes; the looped form compiles in normal time
# and keeps the same one-HBM-read structure.
_UNROLL_MAX = 128


@functools.lru_cache(maxsize=64)
def _build_call(offsets_list, wz: int, nx: int, ny: int,
                interpret: bool):
    """Build (and cache) the pallas_call for one (stencils, grid-geometry)
    combination. offsets_list is a tuple of offset tuples (hashable)."""
    by_zs = [_group_by_z(o) for o in offsets_list]
    live = [i for i, b in enumerate(by_zs) if b]
    z_max = max(max(b) for b in by_zs if b)
    P = max(
        max(abs(dx), abs(dy))
        for i in live
        for dx, dy, _ in offsets_list[i]
    )
    n_out = len(offsets_list)
    # Halos rounded so the halo'd tile is itself (8, 128)-aligned when the
    # output block is: Mosaic's dynamic_rotate (the looped window form)
    # rejects unaligned vector shapes.
    PX = _round_up(P, 4)
    PY = _round_up(P, 64)
    blocks = _plan_blocks(wz, nx, ny, PX, PY, n_out)
    if blocks is None:
        return None
    BX, BY = blocks
    TX, TY = BX + 2 * PX, BY + 2 * PY
    gx, gy = -(-nx // BX), -(-ny // BY)

    n_total = sum(len(offsets_list[i]) for i in live)
    unroll = n_total <= _UNROLL_MAX

    # Looped form: per live stencil, a flat (n_i, 2) int32 table of
    # (dx, dy) sorted by z-level, plus static per-level [start, end)
    # ranges resolved at trace time.
    tables = []
    ranges = []  # ranges[si][z] = (start, end)
    for si in range(n_out):
        rows = []
        rng = {}
        if si in live:
            for z in sorted(by_zs[si]):
                rng[z] = (len(rows), len(rows) + len(by_zs[si][z]))
                rows.extend(by_zs[si][z])
        tables.append(
            jnp.asarray(rows if rows else [(0, 0)], jnp.int32)
        )
        ranges.append(rng)

    def kernel(*refs):
        # refs: [tbl_0..tbl_{n_out-1}] (SMEM), occ_hbm, out_0..out_{n_out-1},
        #       occ_t, oz_t, rot_t, sem
        tbls = refs[:n_out]
        occ_hbm = refs[n_out]
        out_refs = refs[n_out + 1:2 * n_out + 1]
        occ_t, oz_t, sem = refs[2 * n_out + 1:]
        i = pl.program_id(0)
        j = pl.program_id(1)
        dma = pltpu.make_async_copy(
            occ_hbm.at[:, pl.ds(i * BX, TX), pl.ds(j * BY, TY)],
            occ_t, sem,
        )
        dma.start()
        dma.wait()
        for r in out_refs:
            r[:] = jnp.zeros_like(r)
        oz_t[:] = occ_t[:]
        for z in range(z_max + 1):
            if z > 0:
                o = occ_t[:]
                zero = jnp.zeros_like(o[:1])
                prev = jnp.concatenate([zero, o[:-1]], axis=0)
                nxt = jnp.concatenate([o[1:], zero], axis=0)
                up = (o << z) | (prev >> (32 - z))
                dn = (o >> z) | (nxt << (32 - z))
                oz_t[:] = oz_t[:] | up | dn
            for si in live:
                ents = by_zs[si].get(z)
                if not ents:
                    continue
                if unroll:
                    acc = None
                    for dx, dy in ents:
                        w = oz_t[:, PX - dx:PX - dx + BX,
                                 PY - dy:PY - dy + BY]
                        acc = w if acc is None else acc | w
                    out_refs[si][:] = out_refs[si][:] | acc
                else:
                    start, end = ranges[si][z]
                    tbl = tbls[si]

                    def body(t, _, si=si, tbl=tbl):
                        # Arbitrary dynamic (sublane, lane) slice starts
                        # are not provable for Mosaic; dynamic rotates are
                        # native (and the aligned halos keep every vector
                        # shape (8, 128)-tileable). Want
                        # w[a, b] = oz[a + PX - dx, b + PY - dy]: rotate by
                        # (dx - PX, dy - PY), read the static [0:BX, 0:BY]
                        # window (the source range stays inside the halo'd
                        # tile, so no wrapped lanes are read). Shifts are
                        # normalized to [0, n): Mosaic's dynamic_rotate
                        # miscomputes NEGATIVE shifts (single-bit probe,
                        # scripts/diag_dilate_bug5.py: every output bit
                        # lands a constant (sublane-group, lane-group)
                        # offset away — the trunc-vs-floor split of the
                        # shift into group/remainder parts), and rotation
                        # is modular, so adding the static extent is free.
                        # (An aligned-ds + 8-way-switch slab variant was
                        # tried to cut the full-tile rotates; its switch
                        # temporaries overflow Mosaic's VMEM stack at the
                        # production wz=52 geometry.)
                        dx = tbl[t, 0]
                        dy = tbl[t, 1]
                        r = pltpu.roll(oz_t[:], dx - PX + TX, 1)
                        r = pltpu.roll(r, dy - PY + TY, 2)
                        out_refs[si][:] = (
                            out_refs[si][:] | r[:, :BX, :BY]
                        )
                        return 0

                    jax.lax.fori_loop(start, end, body, 0)

    # Grid-padded outputs (sliced back in run()): keeps every output block
    # exactly divisible, which both the TPU lowering and the aligned-shape
    # rotate requirement want.
    out_shape = [
        jax.ShapeDtypeStruct((wz, gx * BX, gy * BY), jnp.uint32)
        for _ in range(n_out)
    ]
    call = pl.pallas_call(
        kernel,
        grid=(gx, gy),
        in_specs=(
            [
                pl.BlockSpec(memory_space=pltpu.SMEM)
                for _ in range(n_out)
            ]
            + [pl.BlockSpec(memory_space=pl.ANY)]
        ),
        out_specs=[
            pl.BlockSpec((wz, BX, BY), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM)
            for _ in range(n_out)
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((wz, TX, TY), jnp.uint32),
            pltpu.VMEM((wz, TX, TY), jnp.uint32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )

    pad = ((0, 0), (PX, gx * BX - nx + PX), (PY, gy * BY - ny + PY))

    def run(occ):
        outs = call(*tables, jnp.pad(occ, pad))
        return [o[:, :nx, :ny] for o in outs]

    return run


def dilate_packed_multi_pallas(
    occ: jnp.ndarray,
    offsets_list: Sequence[Tuple[Tuple[int, int, int], ...]],
    *,
    interpret: bool = False,
):
    """Pallas equivalent of dilate_gate._dilate_packed_multi on a
    (wz, nx, ny) packed grid. Returns None when no VMEM block plan fits
    (caller falls back to the lax path); otherwise a list of dilated
    grids, bit-identical to the lax results."""
    live = [o for o in offsets_list if o]
    if not live:
        return [jnp.zeros_like(occ) for _ in offsets_list]
    wz, nx, ny = occ.shape
    run = _build_call(
        tuple(tuple(o) for o in offsets_list), wz, nx, ny, interpret
    )
    if run is None:
        return None
    return run(occ)
