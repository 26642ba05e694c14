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
the grid; the pass becomes VPU-compute-bound on uint32 OR throughput.
Results are bit-identical to the lax path (integer ops only, same
shift/OR/window semantics; locked by tests/test_dilate_pallas.py in
interpret mode).

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

# VMEM plan budget: leave headroom under the ~16 MB/core limit for the
# compiler's own temporaries and the output blocks' double buffers.
_VMEM_BUDGET = 10 << 20


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _vmem_est(wz: int, BX: int, BY: int, P: int, n_out: int) -> int:
    """VMEM footprint of one program: occ tile + oz tile (halo'd) plus
    n_out output blocks, each padded to the (8, 128) uint32 tile grid."""
    tile = _round_up(BX + 2 * P, 8) * _round_up(BY + 2 * P, 128)
    out = _round_up(BX, 8) * _round_up(BY, 128)
    return 4 * wz * (2 * tile + n_out * out)


def _plan_blocks(wz: int, nx: int, ny: int, P: int,
                 n_out: int) -> Optional[Tuple[int, int]]:
    """Pick the output block (BX, BY); the halo'd input tile is
    (BX + 2P, BY + 2P). The TPU lowering requires output block dims
    divisible by (8, 128) — or equal to the full array dims — so BY is
    128/256 (or ny itself when small) and BX walks multiples of 8. Among
    feasible plans, prefer the one with the best compute efficiency
    (output words per padded tile word), then the largest block."""
    by_opts = [ny] if ny <= 128 else [128, 256]
    bx_opts = (
        [nx] if nx <= 8
        else [bx for bx in range(8, min(nx + 7, 2048), 8)]
    )
    best = None
    best_key = None
    for BY in by_opts:
        for BX in bx_opts:
            if _vmem_est(wz, BX, BY, P, n_out) > _VMEM_BUDGET:
                break
            eff = (BX * BY) / (
                _round_up(BX + 2 * P, 8) * _round_up(BY + 2 * P, 128)
            )
            key = (round(eff, 3), BX * BY)
            if best_key is None or key > best_key:
                best, best_key = (BX, BY), key
    return best


def _group_by_z(offsets):
    by_z = {}
    for dx, dy, z in offsets:
        by_z.setdefault(z, []).append((dx, dy))
    return by_z


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
    blocks = _plan_blocks(wz, nx, ny, P, n_out)
    if blocks is None:
        return None
    BX, BY = blocks
    TX, TY = BX + 2 * P, BY + 2 * P
    gx, gy = -(-nx // BX), -(-ny // BY)

    def kernel(occ_hbm, *refs):
        out_refs = refs[:n_out]
        occ_t, oz_t, sem = refs[n_out:]
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
                acc = None
                for dx, dy in ents:
                    w = oz_t[:, P - dx:P - dx + BX, P - dy:P - dy + BY]
                    acc = w if acc is None else acc | w
                out_refs[si][:] = out_refs[si][:] | acc

    out_shape = [
        jax.ShapeDtypeStruct((wz, nx, ny), jnp.uint32) for _ in range(n_out)
    ]
    call = pl.pallas_call(
        kernel,
        grid=(gx, gy),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
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

    pad = ((0, 0), (P, gx * BX - nx + P), (P, gy * BY - ny + P))

    def run(occ):
        return list(call(jnp.pad(occ, pad)))

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
