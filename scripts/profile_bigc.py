#!/usr/bin/env python
"""Per-program profile of the big-C registration path on real hardware.

The end-to-end numbers (bigc_tpu_r3b.json) leave time unaccounted for:
headline 58.9 s vs ~42 s modeled (7 brute iterations + grid-kNN prologue),
tight-radius grid 60.9 s vs ~25 s modeled. This times each dispatched
program separately — brute match sweep, grid build, grid match query,
grid-kNN prologue pieces, chunk program — to find where the model and the
hardware disagree. Timing per CLAUDE.md: forced readbacks, perturbed
inputs, medians of 3.
"""

from __future__ import annotations

import functools
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/root/reference/data"


def timed(tag, fn, repeats=3, perturb=None):
    vals = []
    for rep in range(repeats + 1):
        if perturb is not None:
            perturb(rep)
        t0 = time.perf_counter()
        out = fn(rep)
        dt = time.perf_counter() - t0
        if rep > 0:
            vals.append(dt)
    med = float(np.median(vals))
    print(f"{tag:44s} {med:8.3f} s  (reps {['%.3f' % v for v in vals]})",
          flush=True)
    return med, out


def main() -> int:
    import jax
    import jax.numpy as jnp

    from simpleicp_tpu import IcpConfig
    from simpleicp_tpu.ops.gridhash import (
        build_sorted_grid,
        grid_cell_cap,
        grid_query_sorted,
        knn_query_sorted,
    )
    from simpleicp_tpu.ops.knn import knn_search, nn_search
    from simpleicp_tpu.utils.xyz_io import read_xyz
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_bigc import tile_cloud

    N = int(float(sys.argv[1])) if len(sys.argv) > 1 else 12_500_000
    C = 100_000
    dtype = jnp.float32
    X1 = jnp.asarray(read_xyz(f"{DATA}/dragon1.xyz"), dtype)
    ext = float(jnp.max(X1[:, 0]) - jnp.min(X1[:, 0]))
    Xf = jax.block_until_ready(tile_cloud(X1, N, ext * 1.05))
    rng = np.random.default_rng(0)
    Q0 = Xf[:: N // C][:C]
    print(f"N={N}  C={C}  backend={jax.default_backend()}", flush=True)

    # --- 1. brute in-loop match sweep (the headline's per-iteration cost) ---
    rt = 1 << max(12, min(16, (N // 8).bit_length()))

    @jax.jit
    def brute_match(Q, refs):
        return nn_search(Q, refs, ref_tile=rt, query_tile=2048)

    def run_brute(rep):
        d2, idx = brute_match(Q0 + jnp.float32(1e-6 * rep), Xf)
        return np.asarray(d2[:1])

    med, _ = timed(f"brute 1-NN match C={C} (rt={rt})", run_brute)
    print(f"    -> {C * N / med:.3e} pairs/s (model 2.2e11)", flush=True)

    # --- 2. grid build at the tight match radius ---
    rm = 0.05
    cap = grid_cell_cap(np.asarray(Xf[:2_000_000], np.float64), rm)
    print(f"    match grid cell cap (2M sample): {cap}", flush=True)

    build = jax.jit(lambda refs: build_sorted_grid(refs, jnp.float32(rm)))

    def run_build(rep):
        out = build(Xf + jnp.float32(1e-7 * rep))
        jax.block_until_ready(out)
        return out

    med_b, grid = timed(f"grid build {N} pts (argsort+gathers)", run_build)
    print(f"    -> {N / med_b:.3e} elems/s (model 5.0e6)", flush=True)

    # --- 2b. build decomposition: argsort alone vs the gathers ---
    @jax.jit
    def argsort_only(refs):
        from simpleicp_tpu.ops.gridhash import _cell_of, _slot_of

        origin = jnp.min(refs, axis=0)
        slots = _slot_of(_cell_of(refs, origin, 1.0 / jnp.float32(rm)))
        return jnp.argsort(slots)

    med_s, _ = timed("  argsort(slots) alone", lambda rep: jax.block_until_ready(
        argsort_only(Xf + jnp.float32(1e-7 * rep))))

    # --- 3. grid match query at the real cap ---
    cap_full = grid_cell_cap(np.asarray(Xf, np.float64), rm)
    print(f"    match grid cell cap (full): {cap_full}", flush=True)
    s_pts, s_slots, s_order, s_origin, s_rend = (
        jax.block_until_ready(build(Xf)))

    # grid arrays as explicit jit ARGS: a closure constant of 12.5M points
    # embeds in the HLO and blows the remote-compile request limit (HTTP 413)
    gq_j = jax.jit(functools.partial(
        grid_query_sorted, cell_cap=cap_full), static_argnames=())

    def run_gq(rep):
        d2, pos = gq_j(Q0 + jnp.float32(1e-6 * rep), s_pts, s_slots,
                       s_origin, jnp.float32(rm), run_end=s_rend)
        return np.asarray(d2[:1])

    med_q, _ = timed(f"grid match query C={C} cap={cap_full}", run_gq)
    gathered = C * 27.0 * cap_full * 3
    print(f"    -> {gathered / med_q:.3e} gathered elems/s (model 1.0e8)",
          flush=True)

    # --- 4. grid-kNN prologue query (normals radius, k=10) ---
    d2k, _ = jax.jit(
        lambda Q: knn_search(Q[:1024], Xf, 10, ref_tile=rt, query_tile=2048)
    )(Q0)
    r_knn = 1.25 * float(np.sqrt(np.max(np.asarray(d2k[:, -1]))))
    cap_knn = grid_cell_cap(np.asarray(Xf, np.float64), r_knn)
    print(f"    knn radius {r_knn:.4f}, cap {cap_knn}", flush=True)
    bk = jax.jit(lambda refs: build_sorted_grid(refs, jnp.float32(r_knn)))
    med_bk, gk = timed(f"grid build {N} pts (knn radius)",
                       lambda rep: jax.block_until_ready(
                           bk(Xf + jnp.float32(1e-7 * rep))))
    k_pts, k_slots, k_order, k_origin, k_rend = jax.block_until_ready(bk(Xf))

    kq_j = jax.jit(lambda Q, pts, slots, order, origin, rend: (
        knn_query_sorted(Q, pts, slots, order, origin, jnp.float32(r_knn),
                         10, cell_cap=cap_knn, run_end=rend)))
    med_kq, _ = timed(
        f"grid kNN query C={C} cap={cap_knn}",
        lambda rep: np.asarray(kq_j(
            Q0 + jnp.float32(1e-6 * rep), k_pts, k_slots, k_order, k_origin,
            k_rend)[0][:1]),
    )
    print(f"    -> {C * 27.0 * cap_knn * 3 / med_kq:.3e} gathered elems/s",
          flush=True)

    # --- 4b. the d_k distribution: how much would a cascade radius save? ---
    d2s = np.asarray(d2k[:, -1])
    for q in (0.5, 0.75, 0.9, 1.0):
        rq = 1.25 * math.sqrt(float(np.quantile(d2s, q)))
        cq = grid_cell_cap(np.asarray(Xf[:2_000_000], np.float64), rq)
        print(f"    d_k q{int(q*100):3d}: radius {rq:.4f} cap(2M) {cq}",
              flush=True)

    # --- 5. uncertainty estimate + chunk overhead probe ---
    # one dispatch+readback of a trivial program through the tunnel
    @jax.jit
    def tiny(x):
        return x * 2.0

    med_t, _ = timed("tunnel roundtrip (tiny program)",
                     lambda rep: np.asarray(tiny(jnp.float32(rep))), repeats=5)
    return 0


if __name__ == "__main__":
    sys.exit(main())
