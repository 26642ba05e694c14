"""The ICP driver: the full registration pipeline as one jitted program.

The reference drivers run the pipeline as a host loop that rebuilds KD-trees,
compacts arrays after rejection, and calls a host optimizer every iteration
(/root/reference/python/simpleicp/simpleicp.py:75-324,
/root/reference/c++/src/simpleicp.cpp:8-128). The TPU design compiles the
*entire* algorithm — overlap gate, correspondence selection, normal
estimation, and the match -> reject -> solve -> converge iteration as a
`lax.while_loop` with statically shaped masked arrays — into a single XLA
program, so one device launch performs the whole registration with on-device
convergence.

Pipeline stages (contract per SURVEY.md §1):
  1. initial H from the observed rigid-body parameters (Q10: applied before
     the overlap gate, like reference Python);
  2. overlap gate: keep fixed points whose NN in the transformed movable
     cloud lies within max_overlap_distance;
  3. fixed-count selection: round(linspace) over the selected indices;
  4. normals: k-NN neighborhoods + batched 3x3 eigendecomposition
     (skipped when user-supplied normals exist — Q11);
  5. iterate: NN match -> planarity gate -> median/MAD rejection ->
     Gauss-Newton solve -> convergence on mean/std percent change.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import IcpConfig
from ..ops.knn import knn_search, nn_search, nn_search_auto
from ..ops.normals import estimate_normals_from_neighborhoods
from ..ops.stats import masked_mad, masked_mean, masked_median, masked_std, pct_change
from ..ops.transform import apply_H, rbp_to_H, rotation_matrix_to_euler_angles
from .solver import estimate_uncertainties, gn_solve, linearized_solve

# Error codes surfaced to the host (device code never raises).
ERR_OK = 0
ERR_NO_OVERLAP = 1
ERR_TOO_FEW_CORRESPONDENCES = 2

# Cached device constants for the dispatch path's dummy/zero arguments.
# Every jnp.zeros call dispatches a tiny XLA program on the default device;
# through the tunnel each enqueue adds milliseconds of latency to a ~50 ms
# small-dataset registration (round-4 small-path audit). The arrays are
# immutable and never donated, so one per (shape, dtype, backend) serves
# every registration in the process.
_zeros_cache: dict = {}


def _zeros_const(shape, dtype):
    # The x64 flag is part of the key: with x64 off, jnp.zeros silently
    # realizes float64 requests as float32 — caching that array under a
    # 'float64' key would serve a wrong-dtype constant after the user
    # enables x64 mid-process. The configured default device is part of the
    # key too: on a multi-device host a `with jax.default_device(...)` switch
    # mid-process would otherwise reuse constants committed to the old
    # device, turning every dispatch into an implicit cross-device transfer
    # (None = backend device 0, constant per backend, already keyed).
    default_dev = jax.config.jax_default_device
    key = (shape, jnp.dtype(dtype).name, jax.default_backend(),
           bool(jax.config.jax_enable_x64),
           None if default_dev is None else str(default_dev))
    arr = _zeros_cache.get(key)
    if arr is None:
        arr = _zeros_cache[key] = jnp.zeros(shape, dtype)
    return arr


class IcpResult(NamedTuple):
    """Raw (device-array) result of one registration run."""

    H: jnp.ndarray                  # (4,4) final homogeneous transform
    p: jnp.ndarray                  # (6,) alpha1..3 [rad], tx, ty, tz
    uncertainties: jnp.ndarray      # (6,) a-posteriori sigmas (NaN if frozen)
    covariance: jnp.ndarray         # (6,6) a-posteriori covariance (frozen
                                    # rows/cols zeroed)
    n_iterations: jnp.ndarray       # scalar int32: executed ICP iterations
    converged: jnp.ndarray          # scalar bool
    error_code: jnp.ndarray         # scalar int32 (ERR_*)
    iter_counts: jnp.ndarray        # (max_iterations,) int32 valid-corr counts
    iter_means: jnp.ndarray         # (max_iterations,) residual means
    iter_stds: jnp.ndarray          # (max_iterations,) residual stds
    orig_count: jnp.ndarray         # scalar int32: the "orig:0" row
    orig_mean: jnp.ndarray
    orig_std: jnp.ndarray
    residuals: jnp.ndarray          # (C,) final signed p2plane residuals
    residual_mask: jnp.ndarray      # (C,) validity of `residuals`
    distance_weight: jnp.ndarray    # resolved scalar distance weight
    sel_idx: jnp.ndarray            # (C,) indices of selected fixed points
    sel_valid: jnp.ndarray          # (C,) validity of sel_idx
    normals: jnp.ndarray            # (C,3) normals at the selected points
    planarity: jnp.ndarray          # (C,) planarity at the selected points
    iter_ps: jnp.ndarray            # (T,6) parameter trajectory
    iter_midx: jnp.ndarray          # (T,C) matched movable indices / iteration
    iter_masks: jnp.ndarray         # (T,C) post-rejection validity / iteration
    iter_dists: jnp.ndarray         # (T,C) pre-optim matched p2plane distances
    iter_gn_rel_steps: jnp.ndarray  # (T,) last inner-GN relative step per
                                    # iteration (0 for the linearized solver;
                                    # <= the 64*eps exit tol when the inner
                                    # loop certified convergence)


class _Carry(NamedTuple):
    it: jnp.ndarray
    p: jnp.ndarray
    H: jnp.ndarray
    dist_w: jnp.ndarray
    converged: jnp.ndarray
    error: jnp.ndarray
    prev_mean: jnp.ndarray
    prev_std: jnp.ndarray
    iter_counts: jnp.ndarray
    iter_means: jnp.ndarray
    iter_stds: jnp.ndarray
    orig_count: jnp.ndarray
    orig_mean: jnp.ndarray
    orig_std: jnp.ndarray
    residuals: jnp.ndarray
    residual_mask: jnp.ndarray
    m_idx: jnp.ndarray
    iter_ps: jnp.ndarray
    iter_midx: jnp.ndarray
    iter_masks: jnp.ndarray
    iter_dists: jnp.ndarray
    iter_gn: jnp.ndarray


def _bitlength(x: jnp.ndarray) -> jnp.ndarray:
    """Bit length of a non-negative int32 (scalar or vector); 0 for 0."""
    ln = jnp.zeros_like(x)
    v = x
    for s in (16, 8, 4, 2, 1):
        big = v >= (1 << s)
        ln = ln + jnp.where(big, s, 0)
        v = jnp.where(big, v >> s, v)
    return ln + (x > 0).astype(ln.dtype)


def round_linspace(n_sel: jnp.ndarray, n: int) -> jnp.ndarray:
    """np.round(np.linspace(0, n_sel - 1, n)) with a TRACED n_sel, bit-equal
    to numpy, in pure int32 arithmetic (device-safe with x64 off).

    This is the reference's fixed-count selection formula
    (/root/reference/python/simpleicp/pointcloud.py:141-147), whose exact
    values the gate path must reproduce on device where n_sel is dynamic.
    numpy's linspace computes fl64(i * fl64(span/div)) (step-based multiply,
    numpy 2.0 linspace source) and np.round rounds half-to-even, so the spec
    includes two float64 roundings. Strategy:

      * exact integer q = (i*span) // div, r = (i*span) % div via Horner's
        method over base-256 digits of i (all carries < 511*div, so plain
        int32 is exact for any n <= 2^22);
      * for non-tie slots (2r != div), round by comparing 2r vs div: the
        float64 value deviates from the exact rational i*span/div by at most
        2^-52 * span, which cannot cross a half-integer boundary while
        span*div < 2^51 — always true for n <= 2^20+1 with any n_sel < 2^31,
        and for 2^20+1 < n <= 2^22 whenever (n_sel-1)*(n-1) < 2^51
        (~5.4e8 points at n=2^22; icp_register enforces this bound
        host-side, so no silently-unproven configuration can dispatch);
      * for exact-tie slots (i*span/div = q + 1/2), emulate numpy's two
        roundings in integers: the step error e1 = fl64(span/div) - span/div
        has magnitude rho/(div*2^k) (rho, k from the 53-bit division
        remainder, computed by modular doubling), and the product rounding
        returns the value to exactly q+1/2 iff i*|e1| <= ulp(q+1/2)/2 —
        a pure integer comparison 2*i*rho vs div*2^(beta-a-2) done in
        15-bit limbs (lhs = 2*seq*rho < 2^45, rhs = div << s_sh with
        s_sh <= bitlength(div) <= 22, both within three 15-bit limbs for
        any n <= 2^22). Validated against numpy on 250 full sweeps plus 20k
        constructed tie slots (round-3 model check) and, for the extended
        2^20+1 < n <= 2^22 range, 45 sweeps incl. constructed cases with
        >1M exact ties each (round-5, zero mismatches).

    Domain: 6 <= n <= 2^22, 0 <= n_sel < 2^31, (n_sel-1)*(n-1) < 2^51.
    Returns (n,) int32.
    """
    div = n - 1  # static
    i32 = jnp.int32
    span = jnp.maximum(n_sel.astype(i32) - 1, 0)
    seq = jnp.arange(n, dtype=i32)

    # exact (seq * s_r) divmod div, Horner over base-256 digits of seq
    s_q = span // div
    s_r = span % div
    ndig = max(1, ((n - 1).bit_length() + 7) // 8)
    q_r = jnp.zeros_like(seq)
    r = jnp.zeros_like(seq)
    for kd in reversed(range(ndig)):
        dig = (seq >> (8 * kd)) & 0xFF
        t = r * 256 + dig * s_r  # < 511*div < 2^31
        q_r = q_r * 256 + t // div
        r = t % div
    q = seq * s_q + q_r  # <= span
    base = q + (2 * r > div).astype(i32)

    # ---- numpy-tie emulation (scalar precompute over span/div) ----
    # a = floor(log2(span/div)); k = 52 - a so span*2^k/div is in [2^52, 2^53)
    blD = div.bit_length()  # static
    blS = _bitlength(span)
    a0 = jnp.maximum(blS - blD, 0)  # span > div whenever ties can matter
    a = jnp.where((span >> a0) >= div, a0, a0 - 1)
    k = 52 - a
    twod = 2 * div  # static
    x = span % twod

    def dbl(j, xx):
        return jnp.where(j < k, (2 * xx) % twod, xx)

    x = jax.lax.fori_loop(0, 52, dbl, x)  # span*2^k mod 2*div
    rem = x % div  # 53-bit division remainder of span*2^k / div
    m_par = (x - rem) // div  # parity of the floor quotient
    two_rem = 2 * rem
    # fl64(span/div) rounds the quotient half-to-even: up iff 2rem > div or
    # an exact half with odd floor quotient; rho = |rounding residue|
    sign_pos = (two_rem > div) | ((two_rem == div) & (m_par == 1))
    rho = jnp.where(sign_pos, div - rem, rem)  # scalar, < div

    # ---- per-slot tie decision ----
    # beta = bitlength(2q+1) without forming 2q+1 (overflows int32)
    beta = _bitlength(q) + 1
    # compare i*|e1| vs ulp(q+1/2)/2  <=>  2*i*rho vs div * 2^(beta-a-2)
    s_sh = jnp.clip(beta - a - 2, 0, 30)  # >= 0 at genuine ties (beta>=a+2)
    # lhs = 2*seq*rho in base-2^15 limbs (seq < 2^22, rho < 2^22)
    a0_, a1_ = seq & 0x7FFF, seq >> 15
    b0_, b1_ = rho & 0x7FFF, rho >> 15
    p00 = a0_ * b0_                    # < 2^30
    pm = a0_ * b1_ + a1_ * b0_         # < 2^23
    m0 = p00 & 0x7FFF
    mid = pm + (p00 >> 15)
    m1 = mid & 0x7FFF
    m2 = (seq >> 15) * (rho >> 15) + (mid >> 15)
    l0 = (2 * m0) & 0x7FFF
    t1 = 2 * m1 + (m0 >> 14)
    l1 = t1 & 0x7FFF
    l2 = 2 * m2 + (t1 >> 15)
    # rhs = div << s_sh in the same limbs (div static, s_sh per-slot)
    def _rhs_limb(li):
        sh = s_sh - 15 * li
        pos = jnp.clip(sh, 0, 14)
        neg = jnp.clip(-sh, 0, 31)
        return jnp.where(
            sh >= 15,
            0,
            jnp.where(sh >= 0, (div & (0x7FFF >> pos)) << pos,
                      (div >> neg) & 0x7FFF),
        )

    r0, r1, r2 = _rhs_limb(0), _rhs_limb(1), _rhs_limb(2)
    w_gt = (l2 > r2) | ((l2 == r2) & ((l1 > r1) | ((l1 == r1) & (l0 > r0))))
    even_round = q + (q & 1)  # np.round(q + 0.5), half to even
    tie_res = jnp.where(
        rho == 0,
        even_round,
        jnp.where(sign_pos, jnp.where(w_gt, q + 1, even_round),
                  jnp.where(w_gt, q, even_round)),
    )
    return jnp.where(2 * r == div, tie_res, base)


def _check_round_linspace_domain(correspondences: int, nf: int) -> None:
    """Host-side guard of round_linspace's proven bit-exactness envelope.

    IcpConfig bounds correspondences <= 2^22; the extended range
    (2^20+1, 2^22] additionally needs (n_sel-1)*(C-1) < 2^51 for the
    non-tie rounding proof (round_linspace docstring). n_sel (the post-gate
    selected count) is dynamic, but n_sel <= nf, so checking against the
    fixed-cloud size is conservative and static. Raising here (instead of
    silently leaving the proven envelope) keeps the framework's standard:
    every dispatched selection is proof-covered, not spot-checked."""
    C = int(correspondences)
    if C > 2**20 + 1 and (nf - 1) * (C - 1) >= 2**51:
        raise ValueError(
            f"correspondences={C} with a {nf}-point fixed cloud leaves the "
            "proven bit-exactness domain of the reference selection formula "
            "((n_points-1)*(correspondences-1) must stay below 2^51 when "
            "correspondences exceeds 2^20+1). Reduce `correspondences` or "
            "pre-select fewer fixed points."
        )


def _select_n(sel_mask: jnp.ndarray, n: int):
    """Fixed-count equidistant selection over the *indices* of selected points.

    Reproduces select_n_points (/root/reference/python/simpleicp/pointcloud.py:132-147):
    when more than n points are selected, pick round(linspace(0, n_sel-1, n))
    positions among the compacted selected indices (bit-equal to numpy via
    round_linspace); otherwise keep all selected points (validity-masked).

    Returns (sel_idx (n,), valid (n,) bool).
    """
    nf = sel_mask.shape[0]
    n_sel = jnp.sum(sel_mask)
    compacted = jnp.nonzero(sel_mask, size=nf, fill_value=0)[0]
    need_subsample = n_sel > n
    seq = jnp.arange(n, dtype=jnp.int32)
    lin = round_linspace(n_sel, n) if n > 1 else jnp.zeros((n,), jnp.int32)
    pos = jnp.where(need_subsample, lin, jnp.minimum(seq, nf - 1))
    valid = jnp.where(need_subsample, jnp.ones(n, bool), seq < n_sel)
    sel_idx = compacted[jnp.clip(pos, 0, nf - 1)]
    return sel_idx, valid


def make_carry_init(cfg: IcpConfig, dtype, obs_vals, H0, error0) -> _Carry:
    """The loop-entry carry (iteration 0, nothing executed) — shared by the
    monolithic drivers (run_icp_loop without carry_in) and the host-chunked
    dispatcher, so a chunked run starts from the bit-identical state."""
    C = cfg.correspondences
    T = cfg.max_iterations
    auto_dw = cfg.distance_weights is None
    dist_w0 = jnp.asarray(1.0 if auto_dw else cfg.distance_weights, dtype)
    return _Carry(
        it=jnp.int32(0),
        p=obs_vals.astype(dtype),
        H=H0,
        dist_w=dist_w0,
        converged=jnp.bool_(False),
        error=error0,
        prev_mean=jnp.asarray(jnp.inf, dtype),
        prev_std=jnp.asarray(jnp.inf, dtype),
        iter_counts=jnp.zeros((T,), jnp.int32),
        iter_means=jnp.zeros((T,), dtype),
        iter_stds=jnp.zeros((T,), dtype),
        orig_count=jnp.int32(0),
        orig_mean=jnp.asarray(0.0, dtype),
        orig_std=jnp.asarray(0.0, dtype),
        residuals=jnp.zeros((C,), dtype),
        residual_mask=jnp.zeros((C,), bool),
        m_idx=jnp.zeros((C,), jnp.int32),
        # Trajectory buffers shrink to one slot when recording is off (the
        # .at[it] writes then clamp to slot 0 — dead weight removed from
        # the carry without a structural branch).
        iter_ps=jnp.zeros((T if cfg.record_trajectory else 1, 6), dtype),
        iter_midx=jnp.zeros((T if cfg.record_trajectory else 1, C), jnp.int32),
        iter_masks=jnp.zeros((T if cfg.record_trajectory else 1, C), bool),
        iter_dists=jnp.zeros((T if cfg.record_trajectory else 1, C), dtype),
        iter_gn=jnp.zeros((T,), dtype),
    )


def run_icp_loop(Q, normals, planarity, sel_valid, obs_vals, obs_w,
                 cfg: IcpConfig, dtype, error0, H0, match_fn, gather_fn,
                 mov_planarity_fn=None, carry_in=None, it_hi=None):
    """The match -> reject -> solve -> converge iteration as a
    `lax.while_loop`, shared by the single-chip and sharded (shard_map)
    drivers. `match_fn(Ht) -> (m_idx, m_t, m_orig, m_valid)` performs the NN
    matching against the movable cloud transformed by Ht (with collectives in
    the sharded case); `m_valid` marks rows where a match exists (always true
    for the unbounded brute matcher; the radius-bounded grid matcher drops
    rows whose NN lies beyond its radius). `gather_fn(m_idx) -> (C,3)`
    fetches original-frame movable points for the post-loop uncertainty
    estimate.

    Host-chunked dispatch (the scale path — bounded-size device programs):
    `carry_in` resumes the loop from a previous call's carry, and `it_hi`
    (traced int32) stops after iteration index it_hi-1 even when not yet
    converged. The loop body is identical either way, so K iterations per
    program compose bit-exactly to the monolithic while_loop; the
    uncertainty estimate depends only on the final carry, so the last
    chunk's value is the monolithic one.

    Returns (final_carry, uncertainties, covariance).
    """
    T = cfg.max_iterations
    auto_dw = cfg.distance_weights is None
    min_planarity = jnp.asarray(cfg.min_planarity, dtype)
    nonlinear = cfg.solver == "nonlinear"
    hi = jnp.int32(T) if it_hi is None else jnp.minimum(
        jnp.asarray(it_hi, jnp.int32), T
    )

    # Numerical noise floor of the residual statistics: point-to-plane
    # distances are differences of transformed coordinates, so their rounding
    # error scales with eps(dtype) * |coords|. Once the mean/std change
    # between iterations falls below this floor, the signal is pure rounding
    # jitter — the reference's purely relative min_change criterion can then
    # stall for tens of iterations in f32 (measured: dragon 41 iterations vs
    # 7 in f64). Changes at or below the floor count as converged. In f64 the
    # floor is ~1e-14 * |coords| and never fires, preserving exact reference
    # semantics (/root/reference/python/simpleicp/simpleicp.py:355-379).
    noise_floor = (
        cfg.convergence_floor_scale * jnp.finfo(dtype).eps
        * jnp.max(jnp.abs(Q))
    )

    def crit_met(new, old):
        return (pct_change(new, old) < cfg.min_change) | (
            jnp.abs(new - old) <= noise_floor
        )

    def cond(c: _Carry):
        return (c.it < hi) & (~c.converged) & (c.error == ERR_OK)

    def body(c: _Carry) -> _Carry:
        Ht = rbp_to_H(c.p) if nonlinear else c.H
        m_idx, m_t, m_orig, m_valid = match_fn(Ht)
        d = jnp.sum((m_t - Q) * normals, axis=1)  # signed p2plane distances

        # Reject (staging per SURVEY.md Q5 / cfg.rejection_staging):
        #   "python": planarity gate first, median/MAD band computed on the
        #       survivors (reference Python). When the movable cloud carries
        #       planarity, both sides gate, like reference corrpts.py:151-163.
        #   "joint": median/MAD on ALL matched distances, both criteria
        #       applied jointly (C++/Rust/Julia/MATLAB,
        #       /root/reference/c++/src/corrpts.cpp:59-89).
        matched = sel_valid & m_valid
        mask_p = matched & (planarity >= min_planarity)
        if mov_planarity_fn is not None:
            mask_p = mask_p & (mov_planarity_fn(m_idx) >= min_planarity)
        mad_base = matched if cfg.rejection_staging == "joint" else mask_p
        med = masked_median(d, mad_base)
        sigma = 3.0 * masked_mad(d, mad_base, scale=cfg.mad_scale)
        mask = mask_p & (jnp.abs(d - med) <= sigma)

        count = jnp.sum(mask).astype(jnp.int32)
        err = jnp.where(count < 6, jnp.int32(ERR_TOO_FEW_CORRESPONDENCES), c.error)

        is_first = c.it == 0
        orig_count = jnp.where(is_first, count, c.orig_count)
        orig_mean = jnp.where(is_first, masked_mean(d, mask), c.orig_mean)
        orig_std = jnp.where(
            is_first, masked_std(d, mask, ddof=cfg.std_ddof), c.orig_std
        )

        if auto_dw:
            # 1/std^2 of the matched distances, estimated once in iteration 0
            # and frozen (/root/reference/python/simpleicp/simpleicp.py:229-234).
            dw = jnp.where(is_first, 1.0 / jnp.maximum(masked_std(d, mask), 1e-30) ** 2,
                           c.dist_w)
        else:
            dw = c.dist_w

        if nonlinear:
            p_new, residuals, gn_rel = gn_solve(
                c.p, m_orig, Q, normals, mask, dw, obs_vals, obs_w,
                n_steps=cfg.gn_iterations,
            )
            H_new = rbp_to_H(p_new)
        else:
            # single-increment solve by design (native family): the inner
            # stationarity measure does not apply
            gn_rel = jnp.asarray(0.0, dtype)
            dH, residuals, _ = linearized_solve(m_t, Q, normals, mask)
            H_new = dH @ c.H  # dH * H composition (SURVEY.md Q2)
            a1, a2, a3 = rotation_matrix_to_euler_angles(H_new)
            p_new = jnp.concatenate(
                [jnp.stack([a1, a2, a3]), H_new[:3, 3]]
            )

        mean = masked_mean(residuals, mask)
        std = masked_std(residuals, mask, ddof=cfg.std_ddof)
        converged = (
            (c.it > 0)
            & crit_met(mean, c.prev_mean)
            & crit_met(std, c.prev_std)
        )

        # On error keep previous state (the reference raises before solving).
        bad = err != ERR_OK
        p_new = jnp.where(bad, c.p, p_new)
        H_new = jnp.where(bad, c.H, H_new)

        return _Carry(
            it=c.it + 1,
            p=p_new,
            H=H_new,
            dist_w=dw,
            converged=converged & ~bad,
            error=err,
            prev_mean=mean,
            prev_std=std,
            iter_counts=c.iter_counts.at[c.it].set(count),
            iter_means=c.iter_means.at[c.it].set(mean),
            iter_stds=c.iter_stds.at[c.it].set(std),
            orig_count=orig_count,
            orig_mean=orig_mean,
            orig_std=orig_std,
            residuals=jnp.where(bad, c.residuals, residuals),
            residual_mask=jnp.where(bad, c.residual_mask, mask),
            m_idx=jnp.where(bad, c.m_idx, m_idx),
            iter_ps=c.iter_ps.at[c.it].set(p_new),
            iter_midx=c.iter_midx.at[c.it].set(m_idx),
            iter_masks=c.iter_masks.at[c.it].set(mask),
            iter_dists=c.iter_dists.at[c.it].set(d),
            iter_gn=c.iter_gn.at[c.it].set(gn_rel),
        )

    init = (make_carry_init(cfg, dtype, obs_vals, H0, error0)
            if carry_in is None else carry_in)

    final = jax.lax.while_loop(cond, body, init)

    # A-posteriori uncertainties at the optimum on the last iteration's
    # correspondences (/root/reference/python/simpleicp/optimization.py:126-170).
    uncertainties, covariance = estimate_uncertainties(
        final.p, gather_fn(final.m_idx), Q, normals, final.residual_mask,
        final.dist_w, obs_vals, obs_w,
    )
    return final, uncertainties, covariance


def _gate_select_stages(Xf, Xm, obs_vals, ext_sel_mask, *, cfg: IcpConfig,
                        has_ext_sel: bool):
    """Stages 1-3 (initial H, overlap gate, fixed-count selection).

    Returns (Q, sel_idx, sel_valid, error, H0).
    """
    dtype = Xf.dtype
    C = cfg.correspondences
    qt, rt = cfg.query_tile, (cfg.ref_tile or 4096)

    H0 = rbp_to_H(obs_vals)
    error = jnp.int32(ERR_OK)

    # ---- Stage 2: overlap gate (static branch — cfg is trace-time) ----
    if cfg.overlap_enabled:
        if has_ext_sel:
            # Mask precomputed by the dilated-occupancy gate prologue
            # (ops/dilate_gate.py) — exact, gather-free at scale.
            sel_mask = ext_sel_mask
        else:
            Xm0 = apply_H(Xm, H0)
            if cfg.gate_method == "grid":
                from ..ops.gridhash import min_dist_sq_grid

                d2 = min_dist_sq_grid(
                    Xf, Xm0, cfg.max_overlap_distance,
                    cell_cap=max(cfg.grid_cell_cap, 1),
                )
            else:
                d2, _ = nn_search_auto(
                    Xf, Xm0, ref_tile=rt, query_tile=qt,
                    use_pallas=cfg.use_pallas,
                )
            sel_mask = d2 <= jnp.asarray(cfg.max_overlap_distance, dtype) ** 2
        error = jnp.where(jnp.any(sel_mask), error, jnp.int32(ERR_NO_OVERLAP))
        # keep the device program well-defined even when empty:
        sel_mask = jnp.where(jnp.any(sel_mask), sel_mask, jnp.ones_like(sel_mask))
        # ---- Stage 3: fixed-count correspondence selection (dynamic) ----
        sel_idx, sel_valid = _select_n(sel_mask, C)
    else:
        # No gate: the selection depends only on static shapes — resolve it
        # with numpy at trace time.
        host_idx, valid_np = _static_ungated_selection(Xf.shape[0], C)
        sel_idx = jnp.asarray(host_idx)
        sel_valid = jnp.asarray(valid_np)
    Q = Xf[sel_idx]  # (C,3) fixed-side correspondence queries
    return Q, sel_idx, sel_valid, error, H0


def _static_ungated_selection(nf: int, C: int):
    """Stage-3 fixed-count selection without a gate, resolved host-side
    (exact np.round/np.linspace semantics of
    /root/reference/python/simpleicp/pointcloud.py:141-147). ONE
    implementation shared by the in-register prologue and prepare_fixed —
    the serving bit-parity contract depends on them never diverging.

    Returns numpy (host_idx int32 (C,), valid bool (C,))."""
    if nf > C:
        host_idx = np.round(np.linspace(0, nf - 1, C)).astype(np.int32)
        valid = np.ones(C, bool)
    else:
        host_idx = np.minimum(np.arange(C, dtype=np.int32), nf - 1)
        valid = np.arange(C) < nf
    return host_idx, valid


def _normals_stage(Q, Xf, sel_idx, normals_fix, planarity_fix,
                   *, cfg: IcpConfig, has_normals: bool):
    """Stage 4: normals at the selected points (user-supplied gather or
    k-NN + batched eigendecomposition). Returns (normals, planarity)."""
    qt, rt = cfg.query_tile, (cfg.ref_tile or 4096)
    if has_normals:
        return normals_fix[sel_idx], planarity_fix[sel_idx]
    _, idxk = knn_search(
        Q, Xf, cfg.neighbors, ref_tile=rt, query_tile=qt,
        approx=cfg.approx_knn,
    )
    neigh = Xf[idxk]  # (C, k, 3)
    normals, planarity, _ = estimate_normals_from_neighborhoods(neigh)
    return normals, planarity


def _prologue_stages(Xf, Xm, obs_vals, normals_fix, planarity_fix,
                     ext_sel_mask, *, cfg: IcpConfig, has_normals: bool,
                     has_ext_sel: bool):
    """Stages 1-4 of the pipeline — traced inline by the monolithic
    `_icp_run` and as its own program by the host-chunked dispatcher.

    Returns (Q, normals, planarity, sel_idx, sel_valid, error, H0).
    """
    Q, sel_idx, sel_valid, error, H0 = _gate_select_stages(
        Xf, Xm, obs_vals, ext_sel_mask, cfg=cfg, has_ext_sel=has_ext_sel,
    )
    normals, planarity = _normals_stage(
        Q, Xf, sel_idx, normals_fix, planarity_fix,
        cfg=cfg, has_normals=has_normals,
    )
    return Q, normals, planarity, sel_idx, sel_valid, error, H0


def _build_match_grid(Xm, cfg: IcpConfig, dtype):
    """The static-grid matcher's cell list over the ORIGINAL movable cloud
    (built once — rigid motion preserves distances, so one grid serves every
    iteration; see _make_match_fn). Returns the 5-tuple of grid arrays."""
    from ..ops.gridhash import build_sorted_grid

    rm = cfg.match_radius if cfg.match_radius > 0 else cfg.max_overlap_distance
    return build_sorted_grid(Xm, jnp.asarray(rm, dtype))


def _make_match_fn(Q, Xm, cfg: IcpConfig, dtype, grid=None):
    """The per-iteration NN matcher: match_fn(Ht) -> (m_idx, m_t, m_orig,
    m_valid). `grid` is the _build_match_grid 5-tuple for
    match_method='grid' (passed explicitly so the host-chunked dispatcher
    can build it once in the prologue program and reuse it every chunk)."""
    qt, rt = cfg.query_tile, (cfg.ref_tile or 4096)

    if cfg.match_method == "grid":
        from ..ops.gridhash import grid_query_sorted

        # Static-grid matcher: ONE cell list over the ORIGINAL movable cloud
        # serves every iteration. Rigid motion preserves distances, so the
        # NN of q among Ht-transformed movable points is the NN of
        # Ht^-1 q = R^T (q - t) among the static points — the loop never
        # touches the full cloud again (the reference rebuilds its KD-tree
        # over the moved cloud every iteration,
        # /root/reference/python/simpleicp/corrpts.py:131-132). Exact within
        # `match_radius`: rows whose NN lies farther are dropped via m_valid.
        # (With the linearized solver H is only approximately orthogonal —
        # see IcpConfig.match_method for the near-tie caveat.)
        rm = cfg.match_radius if cfg.match_radius > 0 else cfg.max_overlap_distance
        rm = jnp.asarray(rm, dtype)
        g_pts, g_slots, g_order, g_origin, g_run_end = grid

        def match_fn(Ht):
            R, t = Ht[:3, :3], Ht[:3, 3]
            qb = (Q - t) @ R  # R^T (q - t): exact rigid inverse transform
            d2, pos = grid_query_sorted(
                qb, g_pts, g_slots, g_origin, rm,
                cell_cap=max(cfg.match_cell_cap, 1), run_end=g_run_end,
            )
            # Beyond the cell radius the 27-cell scan may miss the true NN;
            # keep only certain-exact matches.
            m_valid = d2 <= rm * rm
            m_idx = jnp.where(m_valid, g_order[pos].astype(jnp.int32), 0)
            m_orig = Xm[m_idx]
            return m_idx, apply_H(m_orig, Ht), m_orig, m_valid
    else:
        def match_fn(Ht):
            Xm_t = apply_H(Xm, Ht)
            # NN of each selected fixed point among transformed movable points
            # (KD-tree rebuilt per iteration in the reference,
            # /root/reference/python/simpleicp/corrpts.py:131-132 — here a fresh
            # pass of the tiled distance kernel over the moved cloud). The lax
            # kernel is deliberate: inside the while_loop XLA fuses the
            # transform -> distance -> argmin chain end to end, whereas a
            # pallas_call boundary forces materializing the transformed cloud
            # and its coordinate planes every iteration (measured 7x slower).
            _, m_idx = nn_search(Q, Xm_t, ref_tile=rt, query_tile=qt)
            return m_idx, Xm_t[m_idx], Xm[m_idx], jnp.ones_like(m_idx, bool)

    return match_fn


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "has_normals", "has_mov_planarity", "has_ext_sel"),
)
def _icp_run(Xf, Xm, obs_vals, obs_w, normals_fix, planarity_fix,
             planarity_mov, ext_sel_mask,
             *, cfg: IcpConfig, has_normals: bool,
             has_mov_planarity: bool = False,
             has_ext_sel: bool = False) -> IcpResult:
    dtype = Xf.dtype

    Q, normals, planarity, sel_idx, sel_valid, error, H0 = _prologue_stages(
        Xf, Xm, obs_vals, normals_fix, planarity_fix, ext_sel_mask,
        cfg=cfg, has_normals=has_normals, has_ext_sel=has_ext_sel,
    )

    grid = (_build_match_grid(Xm, cfg, dtype)
            if cfg.match_method == "grid" else None)
    match_fn = _make_match_fn(Q, Xm, cfg, dtype, grid)

    def gather_fn(m_idx):
        return Xm[m_idx]

    mov_planarity_fn = (
        (lambda m_idx: planarity_mov[m_idx]) if has_mov_planarity else None
    )

    final, uncertainties, covariance = run_icp_loop(
        Q, normals, planarity, sel_valid, obs_vals, obs_w, cfg, dtype,
        error, H0, match_fn, gather_fn, mov_planarity_fn=mov_planarity_fn,
    )

    return _result_from_carry(
        final, uncertainties, covariance, sel_idx, sel_valid, normals,
        planarity,
    )


def _result_from_carry(c: _Carry, uncertainties, covariance, sel_idx,
                       sel_valid, normals, planarity) -> IcpResult:
    """Assemble the public IcpResult from a final loop carry — shared by the
    monolithic, prepared, and host-chunked drivers (trace-safe: a pure
    NamedTuple rearrangement)."""
    return IcpResult(
        H=c.H,
        p=c.p,
        uncertainties=uncertainties,
        covariance=covariance,
        n_iterations=c.it,
        converged=c.converged,
        error_code=c.error,
        iter_counts=c.iter_counts,
        iter_means=c.iter_means,
        iter_stds=c.iter_stds,
        orig_count=c.orig_count,
        orig_mean=c.orig_mean,
        orig_std=c.orig_std,
        residuals=c.residuals,
        residual_mask=c.residual_mask,
        distance_weight=c.dist_w,
        sel_idx=sel_idx,
        sel_valid=sel_valid,
        normals=normals,
        planarity=planarity,
        iter_ps=c.iter_ps,
        iter_midx=c.iter_midx,
        iter_masks=c.iter_masks,
        iter_dists=c.iter_dists,
        iter_gn_rel_steps=c.iter_gn,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "has_normals", "has_ext_sel", "build_grid"),
)
def _icp_prologue_jit(Xf, Xm, obs_vals, normals_fix, planarity_fix,
                      ext_sel_mask, *, cfg: IcpConfig, has_normals: bool,
                      has_ext_sel: bool, build_grid: bool):
    """Chunked dispatch program 1: pipeline stages 1-4 plus (optionally) the
    grid matcher's one-time cell-list build, so no chunk ever re-sorts the
    movable cloud."""
    out = _prologue_stages(
        Xf, Xm, obs_vals, normals_fix, planarity_fix, ext_sel_mask,
        cfg=cfg, has_normals=has_normals, has_ext_sel=has_ext_sel,
    )
    grid = _build_match_grid(Xm, cfg, Xf.dtype) if build_grid else ()
    return out + (grid,)


@functools.partial(
    jax.jit, static_argnames=("cfg", "has_ext_sel", "build_grid"),
)
def _icp_gate_select_jit(Xf, Xm, obs_vals, ext_sel_mask,
                         *, cfg: IcpConfig, has_ext_sel: bool,
                         build_grid: bool):
    """Split-prologue program 1a: stages 1-3 only (+ optional grid build) —
    used when the normals kNN alone would exceed the program budget and
    must run as separate query-block programs (1b)."""
    out = _gate_select_stages(
        Xf, Xm, obs_vals, ext_sel_mask, cfg=cfg, has_ext_sel=has_ext_sel,
    )
    grid = _build_match_grid(Xm, cfg, Xf.dtype) if build_grid else ()
    return out + (grid,)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _icp_knn_block_jit(Q_block, Xf, *, cfg: IcpConfig):
    """Split-prologue program 1b: normals for ONE query block. Bounded by
    block_rows * nf kNN pairs; results are bit-identical to the monolithic
    stage-4 kNN because per-query top-k is independent of the query batch
    (the kernel tiles queries internally anyway)."""
    dummy = jnp.zeros((1, 3), Xf.dtype)
    return _normals_stage(
        Q_block, Xf, jnp.zeros((1,), jnp.int32), dummy, dummy[:, 0],
        cfg=cfg, has_normals=False,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _knn_sample_radius_jit(Q_s, Xf, *, cfg: IcpConfig):
    """Split-prologue program 1c: the k-th-NN squared distance of a SAMPLE
    of queries — sizes the grid-kNN cell radius host-side."""
    d2k, _ = knn_search(
        Q_s, Xf, cfg.neighbors, ref_tile=(cfg.ref_tile or 4096),
        query_tile=cfg.query_tile, approx=cfg.approx_knn,
    )
    return d2k[:, -1]


@jax.jit
def _grid_build_cap_jit(Xf, radius):
    """Split-prologue program 1d: the normals grid (sorted cell list over
    the FIXED cloud) plus its exact max slot occupancy (device-binned, so
    no host/device boundary slack is needed — unlike grid_cell_cap)."""
    from ..ops.gridhash import build_sorted_grid

    s = build_sorted_grid(Xf, radius)
    run_end = s[4]
    n = run_end.shape[0]
    cap = jnp.max(run_end - jnp.arange(n, dtype=jnp.int32))
    return s, cap


@functools.partial(jax.jit, static_argnames=("cfg", "cell_cap"))
def _icp_knn_grid_jit(Q, Xf, sorted_pts, sorted_slots, order, origin,
                      run_end, radius, *, cfg: IcpConfig, cell_cap: int):
    """Split-prologue program 1e: normals for ALL queries from the grid
    kNN (27-cell candidates, dense-kernel tie-break parity), plus the
    per-query exactness certificate. Certified rows are bit-identical to
    the dense kNN normals; uncertified rows get recomputed densely by the
    driver (_icp_run_chunked) and patched."""
    from ..ops.gridhash import knn_query_sorted

    _, ik, cert = knn_query_sorted(
        Q, sorted_pts, sorted_slots, order, origin, radius, cfg.neighbors,
        cell_cap=cell_cap, run_end=run_end,
    )
    neigh = Xf[ik]  # (C, k, 3)
    normals, planarity, _ = estimate_normals_from_neighborhoods(neigh)
    return normals, planarity, cert


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "has_mov_planarity", "use_grid"),
)
def _icp_chunk_jit(carry: _Carry, it_hi, Q, normals, planarity, sel_valid,
                   obs_vals, obs_w, Xm, planarity_mov, grid,
                   *, cfg: IcpConfig, has_mov_planarity: bool,
                   use_grid: bool):
    """Chunked dispatch program 2 (compiled ONCE, re-dispatched per chunk):
    resume the ICP while_loop from `carry`, stop at iteration `it_hi` (a
    traced scalar, so every chunk reuses this executable), return the carry
    plus the uncertainty estimate of its final state (only the last chunk's
    is used — it depends on nothing but the final carry)."""
    dtype = Q.dtype
    match_fn = _make_match_fn(Q, Xm, cfg, dtype, grid if use_grid else None)

    def gather_fn(m_idx):
        return Xm[m_idx]

    mov_planarity_fn = (
        (lambda m_idx: planarity_mov[m_idx]) if has_mov_planarity else None
    )
    return run_icp_loop(
        Q, normals, planarity, sel_valid, obs_vals, obs_w, cfg, dtype,
        jnp.int32(ERR_OK), jnp.eye(4, dtype=dtype),  # unused: carry_in given
        match_fn, gather_fn, mov_planarity_fn=mov_planarity_fn,
        carry_in=carry, it_hi=it_hi,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "has_mov_planarity"),
)
def _icp_run_prepared(Xm, obs_vals, obs_w, Q, normals, planarity, sel_idx,
                      sel_valid, planarity_mov,
                      *, cfg: IcpConfig,
                      has_mov_planarity: bool = False) -> IcpResult:
    """Monolithic registration against a PREPARED fixed cloud: stages 1-4
    (selection + normals) come in precomputed (prepare_fixed), so the
    program is the grid build (if any) plus the ICP loop — the serving path
    when many movable clouds register against one fixed map. Bit-identical
    to `_icp_run` on the same inputs: the prologue is movable-independent
    without an overlap gate (prepare_fixed enforces that), and the loop is
    the shared `run_icp_loop`."""
    dtype = Q.dtype
    H0 = rbp_to_H(obs_vals)
    grid = (_build_match_grid(Xm, cfg, dtype)
            if cfg.match_method == "grid" else None)
    match_fn = _make_match_fn(Q, Xm, cfg, dtype, grid)

    def gather_fn(m_idx):
        return Xm[m_idx]

    mov_planarity_fn = (
        (lambda m_idx: planarity_mov[m_idx]) if has_mov_planarity else None
    )
    final, uncertainties, covariance = run_icp_loop(
        Q, normals, planarity, sel_valid, obs_vals, obs_w, cfg, dtype,
        jnp.int32(ERR_OK), H0, match_fn, gather_fn,
        mov_planarity_fn=mov_planarity_fn,
    )
    return _result_from_carry(
        final, uncertainties, covariance, sel_idx, sel_valid, normals,
        planarity,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "build_grid"))
def _prep_chunk_prologue_jit(Xm, obs_vals, *, cfg: IcpConfig,
                             build_grid: bool):
    """Chunked-dispatch prologue when the fixed side is PREPARED: only the
    initial transform (and the grid matcher's one-time cell-list build)
    remain — selection and normals arrive precomputed."""
    H0 = rbp_to_H(obs_vals)
    grid = _build_match_grid(Xm, cfg, Xm.dtype) if build_grid else ()
    return H0, jnp.int32(ERR_OK), grid


# Certificate margin of the grid-kNN prologue (knn_query_sorted default).
_KNN_CERT_MARGIN = 1e-3


def _knn_cascade_radius(d2_sample: np.ndarray, r_hi: float) -> float:
    """Pick the round-1 radius of the cascaded grid kNN from the SAMPLED
    k-th-NN distance distribution.

    A radius sized by the sample MAX certifies ~every query in one pass but
    pays 27*cap(r_hi) gathers per query — and cap grows ~r^3, so one distant
    outlier (sparse region, tiled seam) inflates the cost for ALL queries
    (measured: cap 147 vs ~tens typical at 12.5M, ~12 s of the big-C
    headline). Instead, round 1 runs at a quantile radius r_q and only the
    uncertified tail re-runs at r_hi; expected relative cost under the
    density-cube cap model (cap(r) ~ r^3) is

        cost(q) ~ (r_q / r_hi)^3 + fail(q)

    with fail(q) estimated from the same sample. Returns the argmin radius
    (== r_hi when a single round is already optimal, e.g. tight unimodal
    spacing)."""
    best_r, best_cost = r_hi, 1.0
    for q in (0.5, 0.75, 0.9):
        rq = 1.25 * float(np.sqrt(np.quantile(d2_sample, q)))
        if rq <= 0.0:
            continue
        fail = float(np.mean(
            d2_sample > ((1.0 - _KNN_CERT_MARGIN) * rq) ** 2
        ))
        cost = (rq / r_hi) ** 3 + fail
        if cost < best_cost:
            best_r, best_cost = rq, cost
    return best_r


def _knn_grid_normals(Q, Xf, cfg: IcpConfig, knn_block: int):
    """Grid-accelerated normals for a big-C chunked prologue, host-driven:

      1. SAMPLE the k-th-NN distance on 1024 strided queries (one bounded
         dense program); size the guaranteed radius r_hi = 1.25 * max and a
         cheaper round-1 radius r_lo from the distribution
         (_knn_cascade_radius);
      2. build the sorted cell list over the fixed cloud ON DEVICE and read
         back its exact max slot occupancy (the static cell_cap);
      3. round 1: one grid-kNN program at r_lo — 27-cell candidates, dense
         tie-break parity, per-query exactness certificates
         (ops/gridhash.knn_query_sorted);
      4. round 2 (cascade): rows round 1 could not certify re-run through a
         SECOND grid at r_hi (builds are cheap — 0.24 s at 12.5M — and the
         big cap is paid only for the failed tail, not all C queries);
      5. recompute rows still uncertified with the dense kernel in
         failure-count-sized programs and patch — so the final normals are
         bit-identical to the dense kNN for every row (certified rows by
         the certificate, patched rows by construction).

    Returns (normals, planarity) or (None, None) when the grid plan is
    uneconomical (degenerate radius, or a dense cluster making the
    per-query candidate cost exceed the dense-block cost) — the caller
    then falls back to dense query blocks. ~27*cap*3 gathered elements per
    query instead of a k-maintaining sweep over all of Xf: ~2-5 s vs ~80 s
    at C=1e5 x 12.5M (round-3 calibration + profile_bigc.py)."""
    C = cfg.correspondences
    if C < 4096:
        return None, None
    dtype = Q.dtype
    stride = max(1, C // 1024)
    Qs = Q[::stride][:1024]
    if Qs.shape[0] < 1024:
        Qs = jnp.concatenate([Qs, jnp.zeros((1024 - Qs.shape[0], 3), dtype)])
    d2_last = np.asarray(_knn_sample_radius_jit(Qs, Xf, cfg=cfg))
    d2_ok = d2_last[np.isfinite(d2_last)]
    d2_max = float(np.max(d2_ok, initial=0.0))
    if d2_max <= 0.0:
        return None, None
    r_hi = 1.25 * float(np.sqrt(d2_max))
    r = _knn_cascade_radius(d2_ok, r_hi)

    (sorted_pts, sorted_slots, order, origin, run_end), cap_dev = (
        _grid_build_cap_jit(Xf, jnp.asarray(r, dtype))
    )
    # round up to a multiple of 8: over-cap only adds masked slots, and a
    # stable cap keeps the query program's compile cache warm across runs
    cap = -(-int(cap_dev) // 8) * 8
    # economics: candidate gathers per query vs the dense-block sweep (the
    # cascade's round-2 tail is priced by the cube-model cap at r_hi)
    from ..utils.device_policy import (
        TPU_GATHER_ELEMS_PER_SEC,
        TPU_KNN10_PAIRS_PER_SEC,
        TPU_SORT_ELEMS_PER_SEC,
    )

    exp_fail = float(np.mean(
        d2_ok > ((1.0 - _KNN_CERT_MARGIN) * r) ** 2
    )) if r < r_hi else 0.0
    cap_hi_est = cap * (r_hi / r) ** 3
    grid_cost = (C * 27.0 * (cap + exp_fail * cap_hi_est) * 3.0
                 / TPU_GATHER_ELEMS_PER_SEC)
    dense_cost = (float(C) * Xf.shape[0]
                  / (TPU_KNN10_PAIRS_PER_SEC * 10.0 / cfg.neighbors))
    if grid_cost > min(
        dense_cost, max(cfg.program_budget_s, 30.0) * 0.9
    ):
        return None, None

    normals, planarity, cert = _icp_knn_grid_jit(
        Q, Xf, sorted_pts, sorted_slots, order, origin, run_end,
        jnp.asarray(r, dtype), cfg=cfg, cell_cap=cap,
    )
    failed = np.nonzero(~np.asarray(cert))[0]
    nrm_h = pla_h = Q_h = None
    if failed.size:
        # np.array (copy): np.asarray of a jax array is READ-ONLY, and the
        # recompute rounds patch rows in place (first tripped on TPU —
        # CPU x64 runs certify every row, so tests need the forced-failure
        # paths of test_chunked.py to cover this).
        nrm_h = np.array(normals)
        pla_h = np.array(planarity)
        Q_h = np.asarray(Q)
    if failed.size and r < r_hi:
        # ---- cascade round 2: the uncertified tail at the full radius ----
        # Priced against skipping straight to the dense patch: the r_hi
        # grid's cap grows with cell VOLUME ((r_hi/r)^3, ~7-8x here), so a
        # several-thousand-row tail can be cheaper as dense query blocks
        # than as padded 27*cap_hi gathers (measured at the big-C headline:
        # 7270 failed rows priced 7.1 s regrid vs 5.3 s dense). Both paths
        # produce bit-identical rows (certificates / by construction).
        import logging

        blk2_est = max(512, 1 << (int(failed.size) - 1).bit_length())
        regrid_est = (
            Xf.shape[0] / TPU_SORT_ELEMS_PER_SEC
            + blk2_est * 27.0 * cap_hi_est * 3.0 / TPU_GATHER_ELEMS_PER_SEC
        )
        # Price dense as the dense patch actually executes: the patch loop
        # below splits `failed` into knn_block-sized sub-blocks, each padded
        # to its own power of two — one blk2_est-sized block would
        # under-price dense near the decision boundary whenever
        # failed.size > knn_block (both paths stay bit-identical; pricing
        # only picks the faster one).
        _blk_cap = knn_block if knn_block > 0 else C
        dense_rows = sum(
            max(512, 1 << (min(_blk_cap, int(failed.size) - s) - 1)
                .bit_length())
            for s in range(0, int(failed.size), _blk_cap)
        )
        dense_est = (
            dense_rows * float(Xf.shape[0])
            / (TPU_KNN10_PAIRS_PER_SEC * 10.0 / cfg.neighbors)
        )
        if dense_est < regrid_est:
            logging.getLogger(__name__).info(
                "grid-kNN prologue: %d/%d uncertified at r=%.4g -> dense "
                "patch directly (priced %.1f s vs %.1f s regrid)",
                failed.size, C, r, dense_est, regrid_est,
            )
            r = r_hi  # skip the regrid branch; dense patch handles the tail
    if failed.size and r < r_hi:
        import logging

        logging.getLogger(__name__).info(
            "grid-kNN prologue: %d/%d uncertified at r=%.4g -> regrid at "
            "r_hi=%.4g", failed.size, C, r, r_hi,
        )
        (s2_pts, s2_slots, o2, org2, re2), cap2_dev = (
            _grid_build_cap_jit(Xf, jnp.asarray(r_hi, dtype))
        )
        cap2 = -(-int(cap2_dev) // 8) * 8
        blk2 = max(512, 1 << (int(failed.size) - 1).bit_length())
        Qb = np.zeros((blk2, 3), Q_h.dtype)
        Qb[: failed.size] = Q_h[failed]
        nb, pb, cb = _icp_knn_grid_jit(
            jnp.asarray(Qb), Xf, s2_pts, s2_slots, o2, org2, re2,
            jnp.asarray(r_hi, dtype), cfg=cfg, cell_cap=cap2,
        )
        ok2 = np.asarray(cb)[: failed.size]
        rows2 = failed[ok2]
        nrm_h[rows2] = np.asarray(nb)[: failed.size][ok2]
        pla_h[rows2] = np.asarray(pb)[: failed.size][ok2]
        failed = failed[~ok2]
    if failed.size:
        import logging

        logging.getLogger(__name__).info(
            "grid-kNN prologue: %d/%d uncertified rows -> dense recompute",
            failed.size, C,
        )
        blk_cap = knn_block if knn_block > 0 else C
        for s in range(0, failed.size, blk_cap):
            rows = failed[s:s + blk_cap]
            blk = max(512, 1 << (int(rows.size) - 1).bit_length())
            Qb = np.zeros((blk, 3), Q_h.dtype)
            Qb[: rows.size] = Q_h[rows]
            nb, pb = _icp_knn_block_jit(jnp.asarray(Qb), Xf, cfg=cfg)
            nrm_h[rows] = np.asarray(nb)[: rows.size]
            pla_h[rows] = np.asarray(pb)[: rows.size]
    if nrm_h is not None:
        normals = jnp.asarray(nrm_h)
        planarity = jnp.asarray(pla_h)
    return normals, planarity


def _dense_knn_blocks(Q, Xf, cfg: IcpConfig, knn_block: int):
    """Stage-4 normals as bounded dense query-block programs — bit-identical
    to the monolithic kNN because per-query top-k is independent of the
    query batch (shared by the chunked prologue and prepare_fixed)."""
    C, dtype = Q.shape[0], Q.dtype
    blk = knn_block if knn_block > 0 else C
    nb = -(-C // blk)
    Q_pad = jnp.concatenate(
        [Q, jnp.zeros((nb * blk - C, 3), dtype)]
    ) if nb * blk != C else Q
    parts = [
        _icp_knn_block_jit(Q_pad[b * blk:(b + 1) * blk], Xf, cfg=cfg)
        for b in range(nb)
    ]
    normals = jnp.concatenate([p[0] for p in parts])[:C]
    planarity = jnp.concatenate([p[1] for p in parts])[:C]
    return normals, planarity


def _icp_run_chunked(Xf, Xm, obs_vals, obs_w, normals_fix, planarity_fix,
                     planarity_mov, ext_sel_mask,
                     *, cfg: IcpConfig, has_normals: bool,
                     has_mov_planarity: bool, has_ext_sel: bool,
                     chunk_iters: int, knn_block: int = 0,
                     knn_grid: bool = False, prep=None) -> IcpResult:
    """Host-chunked registration: the same pipeline as `_icp_run`, executed
    as a prologue program plus K-iteration loop programs re-dispatched from
    the host with the carry staying on device.

    This is how big-correspondence exact configs RUN on watchdog-guarded
    accelerators instead of being refused: each program's device time is
    bounded by ~K * per-iteration cost (icp_register sizes K from
    program_budget_s), while the math is bit-identical to the monolithic
    while_loop — the loop body is shared and the chunk boundary only moves
    WHERE the loop condition is evaluated (tests/test_chunked.py pins
    field-for-field equality). Per-chunk cost beyond the compute is one
    carry re-dispatch (device-resident) and a 3-scalar readback.

    knn_block > 0 additionally splits the PROLOGUE: the normals kNN — at
    k=10 a ~14x slower kernel than the 1-NN sweep (round-3 calibration),
    so at C=1e5 x 12.5M it alone is ~80 s of device time — runs as
    ceil(C/knn_block) separate query-block programs of bounded size
    (bit-identical: per-query top-k is batch-independent).
    """
    dtype = Xf.dtype
    use_grid = cfg.match_method == "grid"
    T = cfg.max_iterations
    K = max(1, int(chunk_iters))

    import logging as _logging
    import time as _time

    _dlog = _logging.getLogger(__name__)

    # The per-stage barriers below exist ONLY to attribute wall time to
    # prologue stages for the DEBUG timing lines; each is a host sync
    # (~30 ms through the tunnel). Gate them on the logger level so
    # non-debug runs keep the async dispatch pipeline (round-4 advisor).
    _dbg = _dlog.isEnabledFor(_logging.DEBUG)
    if prep is not None:
        # Prepared fixed side (prepare_fixed): selection + normals arrive
        # precomputed, so the prologue program shrinks to the initial
        # transform + the grid matcher's one-time build.
        Q, normals, planarity, sel_idx, sel_valid = prep
        H0, error, grid = _prep_chunk_prologue_jit(
            Xm, obs_vals, cfg=cfg, build_grid=use_grid,
        )
    elif (knn_block > 0 or knn_grid) and not has_normals:
        _tp = _time.perf_counter()
        Q, sel_idx, sel_valid, error, H0, grid = _icp_gate_select_jit(
            Xf, Xm, obs_vals, ext_sel_mask,
            cfg=cfg, has_ext_sel=has_ext_sel, build_grid=use_grid,
        )
        if _dbg:
            jax.block_until_ready(Q)
            _dlog.debug(
                "timing: chunked prologue gate/select %.2f s",
                _time.perf_counter() - _tp,
            )
        C = cfg.correspondences
        normals = planarity = None
        if knn_grid:
            _tp = _time.perf_counter()
            normals, planarity = _knn_grid_normals(Q, Xf, cfg, knn_block)
            if _dbg:
                if normals is not None:
                    jax.block_until_ready(normals)
                _dlog.debug(
                    "timing: chunked prologue grid-kNN normals %.2f s%s",
                    _time.perf_counter() - _tp,
                    "" if normals is not None
                    else " (uneconomical, fallback)",
                )
        if normals is None:
            # dense kNN in bounded query-block programs
            _tp = _time.perf_counter()
            normals, planarity = _dense_knn_blocks(Q, Xf, cfg, knn_block)
            if _dbg:
                jax.block_until_ready(normals)
                _dlog.debug(
                    "timing: chunked prologue dense-kNN blocks %.2f s",
                    _time.perf_counter() - _tp,
                )
    else:
        (Q, normals, planarity, sel_idx, sel_valid, error, H0, grid
         ) = _icp_prologue_jit(
            Xf, Xm, obs_vals, normals_fix, planarity_fix, ext_sel_mask,
            cfg=cfg, has_normals=has_normals, has_ext_sel=has_ext_sel,
            build_grid=use_grid,
        )
    carry = make_carry_init(cfg, dtype, obs_vals.astype(dtype), H0, error)

    # Stall-window detection (round-4 finding: the SAME cached chunk
    # program intermittently runs 2-13x its healthy time inside a degraded
    # worker window — gated 50M reps of 25.6 vs 106.4 s, a 48 s headline
    # rep at 1298 s). The chunk boundary is the natural detection point:
    # compare each chunk's wall against the calibrated per-iteration model.
    # Policy (cfg.stall_policy): "warn" diagnoses the window live; "wait"
    # additionally holds the next dispatch until a fresh-shape subprocess
    # probe answers healthy — the device-resident carry makes waiting free
    # and correct, so a degraded window no longer silently multiplies a
    # production run's wall time (round-4 verdict item 2).
    per_iter_est = _chunk_per_iter_estimate(cfg, Xf.shape[0], Xm.shape[0],
                                            has_normals)
    _slog = _dlog
    stall_wait_total = 0.0

    first_chunk = True
    while True:
        it_before = int(carry.it)
        hi = min(T, it_before + K)
        _t0 = _time.perf_counter()
        carry, uncertainties, covariance = _icp_chunk_jit(
            carry, jnp.int32(hi), Q, normals, planarity, sel_valid,
            obs_vals, obs_w, Xm, planarity_mov, grid,
            cfg=cfg, has_mov_planarity=has_mov_planarity, use_grid=use_grid,
        )
        done = bool(carry.converged) or int(carry.error) != ERR_OK \
            or int(carry.it) >= T
        chunk_wall = _time.perf_counter() - _t0
        n_ran = max(int(carry.it) - it_before, 1)
        _dlog.debug(
            "timing: chunk iterations %d-%d %.2f s",
            it_before, int(carry.it), chunk_wall,
        )
        est = n_ran * per_iter_est
        if (per_iter_est > 0 and est > _STALL_MIN_EST_S
                and not first_chunk
                and chunk_wall > _STALL_FACTOR * est + _STALL_SLACK_S):
            # first_chunk excluded: a cold process compiles the chunk
            # program INLINE on its first call (minutes through the remote
            # compiler) — timing it against the run-only estimate is the
            # same compile/run conflation calibrate_guard had to fix.
            if cfg.stall_policy == "wait":
                action = ("Holding the next chunk until a probe answers "
                          "healthy (stall_policy='wait')." if not done else
                          "Final chunk — nothing left to hold "
                          "(stall_policy='wait').")
            else:
                action = ("The run continues and stays correct "
                          "(stall_policy='warn').")
            _slog.warning(
                "chunk of %d iterations took %.1f s against a calibrated "
                "estimate of %.1f s (%.0fx) — the worker is likely in a "
                "degraded window (post-big-job stall; CLAUDE.md). "
                "%s Wall times measured now are not representative.",
                n_ran, chunk_wall, est, chunk_wall / max(est, 1e-9),
                action,
            )
            if cfg.stall_policy == "wait" and not done:
                waited = _wait_for_healthy_window(_slog)
                stall_wait_total += waited
                _slog.warning(
                    "stall_policy='wait': held dispatch %.0f s "
                    "(cumulative stall-wait %.0f s this run); resuming "
                    "at iteration %d with the device-resident carry.",
                    waited, stall_wait_total, int(carry.it),
                )
        first_chunk = False
        if done:
            break
    if stall_wait_total > 0:
        _slog.warning(
            "registration finished; total stall-wait %.0f s across "
            "degraded windows (stall_policy='wait').", stall_wait_total,
        )

    return _result_from_carry(
        carry, uncertainties, covariance, sel_idx, sel_valid, normals,
        planarity,
    )


# match_method="auto" crossover: below this many matched pairs per iteration
# the dense brute sweep wins (at the reference's C=1000 it beats the grid
# 4.8x even against a 12.5M-point cloud — random candidate gathers are the
# grid's cost); far above it the brute sweep is not just slower but DANGEROUS:
# a C=1e5 x 12.5M brute match (1.25e12 pairs/iteration, 9+ iterations inside
# one while_loop program) tripped the TPU runtime watchdog and crashed the
# worker (2026-08-19, BENCHMARKS.md kernel notes). 2^38 ~ 2.7e11 keeps whole
# programs under the observed hazard with margin.
MATCH_AUTO_PAIR_BUDGET = 2**38

# Chunk stall detection margins (_icp_run_chunked): warn when a chunk's
# wall exceeds _STALL_FACTOR x its calibrated estimate plus
# _STALL_SLACK_S of dispatch slack, for estimates above _STALL_MIN_EST_S
# (sub-second chunks are dispatch-latency-bound and would false-positive).
_STALL_FACTOR = 4.0
_STALL_SLACK_S = 5.0
_STALL_MIN_EST_S = 0.5
# stall_policy="wait" probe loop: each probe is a fresh-shape subprocess
# compile+run under _STALL_WAIT_PROBE_TIMEOUT_S (cached programs still run
# on a degraded worker — only a FRESH shape proves health); failed probes
# retry every _STALL_WAIT_SLEEP_S until _STALL_WAIT_BUDGET_S, then the run
# proceeds into the window rather than deadlock (workers usually heal in
# 5-10 min after a crash, up to ~an hour after very large jobs — CLAUDE.md).
_STALL_WAIT_PROBE_TIMEOUT_S = 120.0
_STALL_WAIT_SLEEP_S = 30.0
_STALL_WAIT_BUDGET_S = 1800.0


def _chunk_per_iter_estimate(cfg: IcpConfig, nf: int, nm: int,
                             has_normals: bool) -> float:
    """Calibrated per-iteration seconds for the chunk stall check.

    Returns 0.0 on CPU backends (no degraded windows there), which
    disables detection. Module-level so tests can monkeypatch a synthetic
    estimate and drive the stall paths on CPU."""
    if jax.default_backend() == "cpu":
        return 0.0
    from ..utils.device_policy import estimate_tpu_stage_seconds

    _, _, _, per_iter = estimate_tpu_stage_seconds(
        nf, nm,
        correspondences=cfg.correspondences,
        neighbors=cfg.neighbors,
        match_method=cfg.match_method,
        match_cell_cap=cfg.match_cell_cap,
        has_normals=has_normals,
    )
    return per_iter


def _wait_for_healthy_window(log) -> float:
    """stall_policy="wait": block until the default backend answers a
    fresh-shape subprocess probe (utils/device_policy.probe_default_backend
    — safe to call mid-run: the probe is a SUBPROCESS, so a hung worker
    cannot wedge this process), or until the wait budget runs out.

    Returns seconds spent waiting. The chunk carry is device-resident HBM
    state, untouched by waiting, so this is free and bit-neutral."""
    import time as _t

    from ..utils.device_policy import probe_default_backend

    t0 = _t.monotonic()
    deadline = t0 + _STALL_WAIT_BUDGET_S
    attempt = 0
    while True:
        attempt += 1
        status, _backend, psec = probe_default_backend(
            _STALL_WAIT_PROBE_TIMEOUT_S
        )
        log.info(
            "stall probe %d: %s in %.1f s", attempt, status, psec,
        )
        if status == "ok":
            return _t.monotonic() - t0
        # budget the NEXT attempt too (sleep + a full probe timeout): a
        # never-healing worker must not overrun the documented give-up
        # bound by a trailing 120 s probe
        if (_t.monotonic() + _STALL_WAIT_SLEEP_S
                + _STALL_WAIT_PROBE_TIMEOUT_S >= deadline):
            log.warning(
                "stall_policy='wait': no healthy probe within the %.0f s "
                "budget; proceeding into the degraded window.",
                _STALL_WAIT_BUDGET_S,
            )
            return _t.monotonic() - t0
        _t.sleep(_STALL_WAIT_SLEEP_S)


def resolve_match_method(cfg: IcpConfig, n_queries: int, n_mov: int) -> IcpConfig:
    """Resolve match_method="auto" to a concrete engine, host-side.

    Picks "grid" only when the per-iteration brute pair count exceeds
    MATCH_AUTO_PAIR_BUDGET AND a radius is available (match_radius or the
    overlap gate — the grid matcher needs one, IcpConfig.__post_init__);
    otherwise "brute". Explicit settings pass through untouched.
    """
    if cfg.match_method != "auto":
        return cfg
    import dataclasses

    has_radius = cfg.match_radius > 0 or cfg.overlap_enabled
    big = n_queries * n_mov > MATCH_AUTO_PAIR_BUDGET
    return dataclasses.replace(
        cfg, match_method="grid" if (big and has_radius) else "brute"
    )


def plan_warm_start(
    X_fix,
    X_mov,
    cfg: IcpConfig,
    *,
    rbp_observed_values=None,
    rbp_observation_weights=None,
    normals_fix=None,
    planarity_fix=None,
    planarity_mov=None,
    dtype=None,
):
    """Coarse-to-fine warm start (host-side planning; opt-in), shared by the
    single-chip and sharded drivers.

    A big-correspondence exact registration pays a ~C*nm pair sweep per
    iteration, and most iterations just walk H toward the basin. A cheap
    coarse registration on stride-subsampled clouds (same geometry) lands
    H near the optimum first, so the expensive run spends iterations on
    refinement only. The coarse parameter vector feeds the existing
    initial-values machinery (obs_vals with zero weights, SURVEY.md Q10),
    so it also sharpens the overlap gate's H0. The reference has no
    analog (its KD-tree match is cheap per iteration; our per-iteration
    cost at C=1e5 x 12.5M is ~5.6 s of exact sweep — BENCHMARKS.md).

    Returns (cfg with warm_start cleared, possibly-updated
    rbp_observed_values). The coarse pass runs single-device; clouds
    at/below warm_start_points skip it entirely.
    """
    import dataclasses as _dc
    import logging as _logging

    w_np = (np.zeros(6) if rbp_observation_weights is None
            else np.asarray(rbp_observation_weights, np.float64))
    if np.any((w_np > 0) & np.isfinite(w_np)):
        raise ValueError(
            "warm_start cannot be combined with finite-weight rbp "
            "observations: the warm start replaces the parameters' "
            "INITIAL values, and a finite observation weight makes the "
            "observed value part of the objective. Freeze parameters "
            "with weight=inf, or disable warm_start."
        )
    cfg = _dc.replace(cfg, warm_start=False)
    # Slicing keeps a host-origin (numpy) cloud host-origin for the coarse
    # run's gate planning; device arrays slice on device.
    Xf_s = X_fix if hasattr(X_fix, "shape") else np.asarray(X_fix)
    Xm_s = X_mov if hasattr(X_mov, "shape") else np.asarray(X_mov)
    n_ws = cfg.warm_start_points
    if max(Xf_s.shape[0], Xm_s.shape[0]) <= n_ws:
        return cfg, rbp_observed_values
    sf = -(-Xf_s.shape[0] // n_ws)
    sm = -(-Xm_s.shape[0] // n_ws)
    # Subsampled NN spacing grows with the stride — ~s^(1/2) for surface
    # (LiDAR-like) data, ~s^(1/3) volumetric — so a gate radius tuned to
    # full-resolution spacing would starve the coarse overlap gate
    # (ERR_NO_OVERLAP at exactly the scales warm_start targets). Widen by
    # the surface-law factor: over-widening merely admits a few extra
    # coarse pairs (the seed's cost is negligible either way);
    # under-widening degrades warm_start to a logged cold fallback.
    spacing_factor = float(max(sf, sm)) ** 0.5
    mod_ws = cfg.max_overlap_distance
    if np.isfinite(mod_ws) and mod_ws > 0:
        mod_ws = mod_ws * spacing_factor
    ws_cfg = _dc.replace(
        cfg,
        correspondences=min(
            cfg.correspondences, cfg.warm_start_correspondences
        ),
        # Exact brute match with no radius cap: the subsampled cloud's NN
        # spacing is ~s^(1/3) larger, so a match_radius tuned to the full
        # cloud could starve the coarse matches.
        match_method="brute", match_radius=0.0, match_cell_cap=0,
        ref_tile=0, grid_cell_cap=0, gate_method="auto",
        max_overlap_distance=mod_ws,
    )
    res_ws = icp_register(
        Xf_s[::sf], Xm_s[::sm], ws_cfg,
        rbp_observed_values=rbp_observed_values,
        rbp_observation_weights=rbp_observation_weights,
        # Slice array-likes directly (device arrays stay on device — an
        # np.asarray here would be a hidden full device->host fetch at
        # exactly the 10M+-point scales warm_start targets); only coerce
        # list-like inputs.
        normals_fix=(None if normals_fix is None
                     else (normals_fix if hasattr(normals_fix, "shape")
                           else np.asarray(normals_fix))[::sf]),
        planarity_fix=(None if planarity_fix is None
                       else (planarity_fix
                             if hasattr(planarity_fix, "shape")
                             else np.asarray(planarity_fix))[::sf]),
        planarity_mov=(None if planarity_mov is None
                       else (planarity_mov
                             if hasattr(planarity_mov, "shape")
                             else np.asarray(planarity_mov))[::sm]),
        dtype=dtype,
    )
    log = _logging.getLogger(__name__)
    if int(res_ws.error_code) == 0 and bool(res_ws.converged):
        obs_np = (np.zeros(6) if rbp_observed_values is None
                  else np.asarray(rbp_observed_values, np.float64))
        p_ws = np.asarray(res_ws.p, np.float64)
        # weight=inf (frozen) components keep the user's exact values
        rbp_observed_values = np.where(np.isinf(w_np), obs_np, p_ws)
        log.info(
            "warm start: coarse registration on %d x %d subsampled "
            "points, %d iterations, converged=True",
            -(-Xf_s.shape[0] // sf), -(-Xm_s.shape[0] // sm),
            int(res_ws.n_iterations),
        )
    elif int(res_ws.error_code) == 0:
        # A coarse pass that hit max_iterations while still drifting can
        # seed the full-resolution run FARTHER from the basin than a cold
        # start — adopt only converged seeds.
        log.warning(
            "warm start: coarse registration did not converge in %d "
            "iterations — starting cold", int(res_ws.n_iterations)
        )
    else:
        log.warning(
            "warm start: coarse registration failed with error "
            "code %d — starting cold", int(res_ws.error_code)
        )
    return cfg, rbp_observed_values


class FixedPrep(NamedTuple):
    """Precomputed fixed-cloud state for repeated registrations
    (prepare_fixed -> icp_register(fixed_prep=...)).

    Without an overlap gate, pipeline stages 1-4 — fixed-count selection
    (static, reference formula) and normals at the selected points — depend
    only on the FIXED cloud and the config, so a serving workload that
    registers many movable clouds against one fixed map (localization
    against a reference scan) can pay them once. Measured weight of what
    this skips: ~4.2 ms of dragon's 9.5 ms device time (the prologue kNN
    fusion, profile_trace_r5.json) and the ~10 s certified grid-kNN
    prologue of the C=1e5 x 12.5M headline. The reference recomputes both
    per run (/root/reference/python/simpleicp/simpleicp.py:262-283).

    Treat as opaque: pass the SAME fixed cloud (and a config with equal
    correspondences/neighbors/approx_knn and no overlap gate) to the
    consuming icp_register call — mismatches raise."""

    Q: jnp.ndarray           # (C,3) selected fixed-side query points
    normals: jnp.ndarray     # (C,3) normals at Q (dense-kNN bit parity)
    planarity: jnp.ndarray   # (C,) planarity at Q
    sel_idx: jnp.ndarray     # (C,) int32 indices into the fixed cloud
    sel_valid: jnp.ndarray   # (C,) bool validity (nf < C padding)
    n_fix: int               # fixed-cloud row count (consistency check)
    correspondences: int     # cfg fingerprint: selection count
    neighbors: int           # cfg fingerprint: kNN k
    approx_knn: bool         # cfg fingerprint: candidate engine

    def save(self, path) -> None:
        """Persist to an ``.npz`` so a serving deployment can compute the
        preparation offline and `load_fixed_prep` it at startup. Exact:
        the arrays round-trip bit-for-bit through numpy."""
        np.savez(
            path,
            Q=np.asarray(self.Q), normals=np.asarray(self.normals),
            planarity=np.asarray(self.planarity),
            sel_idx=np.asarray(self.sel_idx),
            sel_valid=np.asarray(self.sel_valid),
            meta=np.asarray([self.n_fix, self.correspondences,
                             self.neighbors, int(self.approx_knn)],
                            np.int64),
        )


def load_fixed_prep(path) -> FixedPrep:
    """Load a `FixedPrep.save` file. The preparation is dtype-bound: a
    float64 preparation cannot be faithfully restored with jax x64
    disabled (jnp.asarray would silently round it to float32 and the
    consuming registration would accept values that no longer match the
    f64 prologue bit-for-bit), so that combination is refused."""
    with np.load(path) as z:
        if z["Q"].dtype == np.float64 and not jax.config.jax_enable_x64:
            raise ValueError(
                "this preparation was computed in float64 but jax x64 is "
                "disabled — loading would silently round it to float32. "
                "Enable x64, or re-run prepare_fixed under the serving "
                "dtype."
            )
        meta = z["meta"]
        return FixedPrep(
            jnp.asarray(z["Q"]), jnp.asarray(z["normals"]),
            jnp.asarray(z["planarity"]), jnp.asarray(z["sel_idx"]),
            jnp.asarray(z["sel_valid"]),
            int(meta[0]), int(meta[1]), int(meta[2]), bool(meta[3]),
        )


def prepare_fixed(
    X_fix,
    cfg: IcpConfig = IcpConfig(),
    *,
    normals_fix: Optional[np.ndarray] = None,
    planarity_fix: Optional[np.ndarray] = None,
    dtype=None,
) -> FixedPrep:
    """Precompute the movable-independent pipeline stages for a fixed cloud.

    Requires the overlap gate disabled (``max_overlap_distance=inf``): with
    a gate, which fixed points get selected depends on the movable cloud
    and cannot be precomputed. Results are bit-identical to the in-register
    prologue — selection uses the same host-side reference formula
    (np.round/np.linspace of
    /root/reference/python/simpleicp/pointcloud.py:141-147) and the kNN
    kernels are tile- and batch-invariant (index-stable tie-breaks), which
    tests/test_prepared.py pins field-for-field. Big-C preparations reuse
    the chunked prologue's planning: the certified grid-kNN cascade when
    the dense kNN alone would exceed ``program_budget_s``, bounded dense
    query blocks otherwise.

    Args:
        X_fix: (nf, 3) fixed cloud (the SAME array must go to the
            consuming icp_register calls).
        cfg: the config the consuming registrations will use (selection
            and kNN fields are fingerprinted and enforced at use).
        normals_fix / planarity_fix: optional user-supplied per-point
            normals/planarity for the full fixed cloud (SURVEY.md Q11) —
            gathered at the selected rows instead of running the kNN.
        dtype: computation dtype; defaults like icp_register.

    Returns:
        FixedPrep for ``icp_register(..., fixed_prep=prep)``.
    """
    import dataclasses

    if cfg.overlap_enabled:
        raise ValueError(
            "prepare_fixed requires the overlap gate disabled "
            "(max_overlap_distance=inf/negative): a gated selection "
            "depends on the movable cloud and cannot be precomputed"
        )
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    Xf = jnp.asarray(X_fix, dtype)
    if Xf.ndim != 2 or Xf.shape[1] != 3:
        raise ValueError("point clouds must have shape (n, 3)")
    nf, C = Xf.shape[0], cfg.correspondences
    _check_round_linspace_domain(C, nf)
    # dispatch/warm-start fields never reach the kNN traces; normalize them
    # like icp_register's run_cfg so a preparation's programs share the
    # compile cache with the chunked prologue's (identical math, identical
    # hash)
    cfg = dataclasses.replace(
        cfg, dispatch="auto", chunk_iterations=0, warm_start=False,
        warm_start_points=1_000_000, warm_start_correspondences=1000,
        # the kNN traces never consult the matcher either; pin the "auto"
        # sentinel to the big-C resolution so the preparation's programs
        # hash-match the chunked prologue's
        match_method=("brute" if cfg.match_method == "auto"
                      else cfg.match_method),
    )
    if cfg.ref_tile == 0:
        # the kNN's reference side is the fixed cloud; bit-parity with any
        # in-register tile choice is guaranteed by the kernels' index-stable
        # tie-breaks (ops/knn.py), pinned by tests/test_prepared.py
        rt_auto = 1 << max(12, min(16, (nf // 8).bit_length()))
        cfg = dataclasses.replace(cfg, ref_tile=rt_auto)

    # Stage 3, ungated: static selection resolved host-side — the SAME
    # implementation the in-register prologue uses (bit-parity contract).
    host_idx, valid_np = _static_ungated_selection(nf, C)
    sel_idx = jnp.asarray(host_idx)
    sel_valid = jnp.asarray(valid_np)
    Q = Xf[sel_idx]

    if normals_fix is not None:
        normals = jnp.asarray(normals_fix, dtype)[sel_idx]
        planarity = (jnp.ones(C, dtype) if planarity_fix is None
                     else jnp.asarray(planarity_fix, dtype)[sel_idx])
        return FixedPrep(Q, normals, planarity, sel_idx, sel_valid, nf,
                         C, cfg.neighbors, cfg.approx_knn)

    # Stage 4: normals kNN, sized like icp_register's dispatch planner —
    # one bounded program when it fits the watchdog budget, the chunked
    # prologue's grid-kNN cascade / dense query blocks beyond it.
    knn_block, knn_grid = 0, False
    budget = cfg.program_budget_s
    if budget > 0 and jax.default_backend() != "cpu":
        from ..utils.device_policy import estimate_tpu_stage_seconds

        _, knn_s, _, _ = estimate_tpu_stage_seconds(
            nf, 1,
            correspondences=C, neighbors=cfg.neighbors,
            gate_pairs=0.0, match_method="brute", match_cell_cap=0,
            has_normals=False,
        )
        # same indivisible-program refusal as icp_register's dispatch
        # planner: one MINIMAL 2048-row kNN block over budget means no
        # block split can make the preparation watchdog-safe (over-long
        # programs crash TPU workers)
        knn_atom_s = min(knn_s, knn_s * 2048.0 / max(C, 1))
        if knn_atom_s > budget * 0.9:
            raise ValueError(
                f"preparing this fixed cloud is estimated at "
                f"~{knn_atom_s:.0f} s of device time for ONE minimal kNN "
                f"query block — over the program_budget_s={budget:g} "
                "watchdog guard (over-long programs crash TPU workers). "
                "Reduce `neighbors`, prepare on --device cpu, or "
                "raise/disable program_budget_s if your runtime allows "
                "long programs."
            )
        if knn_s > budget * 0.9:
            rows_per_budget = (budget * 0.5) / max(knn_s, 1e-9) * C
            knn_block = max(2048, int(rows_per_budget) // 2048 * 2048)
            knn_block = min(knn_block, -(-C // 2048) * 2048)
            knn_grid = knn_s > budget * 0.5
    normals = planarity = None
    if knn_grid:
        normals, planarity = _knn_grid_normals(Q, Xf, cfg, knn_block)
    if normals is None:
        normals, planarity = _dense_knn_blocks(Q, Xf, cfg, knn_block)
    return FixedPrep(Q, normals, planarity, sel_idx, sel_valid, nf,
                     C, cfg.neighbors, cfg.approx_knn)


def _validate_fixed_prep(fixed_prep: FixedPrep, nf: int, cfg: IcpConfig,
                         dtype, normals_fix, caller: str) -> None:
    """Consistency checks shared by every fixed_prep-consuming driver: the
    preparation must have been computed for THIS cloud, config, and dtype,
    and cannot be combined with inputs it replaces."""
    if cfg.overlap_enabled:
        raise ValueError(
            "fixed_prep cannot be combined with the overlap gate "
            "(max_overlap_distance): a gated selection depends on the "
            "movable cloud — prepare_fixed refuses such configs too"
        )
    if normals_fix is not None:
        raise ValueError(
            f"pass normals_fix to prepare_fixed, not to the consuming "
            f"{caller} call — the preparation already contains the "
            "selected normals"
        )
    stamp = (fixed_prep.n_fix, fixed_prep.correspondences,
             fixed_prep.neighbors, fixed_prep.approx_knn)
    want = (nf, cfg.correspondences, cfg.neighbors, cfg.approx_knn)
    if stamp != want:
        raise ValueError(
            f"fixed_prep was computed for (n_fix, correspondences, "
            f"neighbors, approx_knn)={stamp}, but this call needs "
            f"{want} — re-run prepare_fixed with the matching cloud "
            "and config"
        )
    if fixed_prep.Q.dtype != jnp.dtype(dtype):
        raise ValueError(
            f"fixed_prep dtype {fixed_prep.Q.dtype} does not match "
            f"this call's dtype {jnp.dtype(dtype)}"
        )


def icp_register(
    X_fix,
    X_mov,
    cfg: IcpConfig = IcpConfig(),
    *,
    rbp_observed_values: Optional[np.ndarray] = None,
    rbp_observation_weights: Optional[np.ndarray] = None,
    normals_fix: Optional[np.ndarray] = None,
    planarity_fix: Optional[np.ndarray] = None,
    planarity_mov: Optional[np.ndarray] = None,
    fixed_prep: Optional[FixedPrep] = None,
    dtype=None,
) -> IcpResult:
    """Functional entry point: register X_mov onto X_fix.

    Args:
        X_fix: (nf, 3) fixed cloud.
        X_mov: (nm, 3) movable cloud.
        cfg: static pipeline configuration.
        rbp_observed_values: (6,) observed parameter values — angles in
            RADIANS here (the class API converts from degrees, mirroring
            /root/reference/python/simpleicp/simpleicp.py:145-148).
        rbp_observation_weights: (6,) weights; 0 free, finite>0 observed,
            inf frozen.
        normals_fix / planarity_fix: optional user-supplied per-point normals
            (nf,3) and planarity (nf,) for the fixed cloud; when given,
            normal estimation is skipped (SURVEY.md Q11).
        planarity_mov: optional (nm,) movable-cloud planarity; when given,
            correspondences whose matched movable point falls below
            min_planarity are also rejected (both-cloud gating of
            /root/reference/python/simpleicp/corrpts.py:151-163, Q5).
        dtype: computation dtype; defaults to f64 when jax x64 is enabled
            (CPU parity runs) else f32 (TPU fast path).

    Returns:
        IcpResult of device arrays. Check `.error_code` (the class API raises
        SimpleICPException for you).
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    Xf = jnp.asarray(X_fix, dtype)
    Xm = jnp.asarray(X_mov, dtype)
    if Xf.ndim != 2 or Xf.shape[1] != 3 or Xm.ndim != 2 or Xm.shape[1] != 3:
        raise ValueError("point clouds must have shape (n, 3)")
    _check_round_linspace_domain(cfg.correspondences, Xf.shape[0])

    if fixed_prep is not None:
        # A prepared fixed side replaces stages 1-4; the preparation must
        # have been computed for THIS cloud, config, and dtype.
        _validate_fixed_prep(fixed_prep, Xf.shape[0], cfg, dtype,
                             normals_fix, "icp_register")

    warm_requested = cfg.warm_start
    if cfg.warm_start:
        cfg, rbp_observed_values = plan_warm_start(
            X_fix, X_mov, cfg,
            rbp_observed_values=rbp_observed_values,
            rbp_observation_weights=rbp_observation_weights,
            normals_fix=normals_fix, planarity_fix=planarity_fix,
            planarity_mov=planarity_mov, dtype=dtype,
        )

    # Auto-scale the reference tile to the movable-cloud size (static,
    # host-side; ref_tile=0 is the "auto" sentinel so an explicit 4096 is
    # honored): the NN sweep is a lax.scan over n_r/ref_tile sequential
    # steps, and per-step overhead dominates once clouds pass ~100k points
    # (measured: dragon 61ms->48.5ms with 16384-tiles; 12.5M 2.83s->1.16s
    # with 65536).
    if cfg.ref_tile == 0:
        import dataclasses

        rt_auto = 1 << max(12, min(16, (Xm.shape[0] // 8).bit_length()))
        cfg = dataclasses.replace(cfg, ref_tile=rt_auto)

    cfg = resolve_match_method(cfg, cfg.correspondences, Xm.shape[0])

    # Grid matcher: resolve the static slot-occupancy cap (the grid is
    # built over the ORIGINAL movable cloud, which never moves, so the cap
    # is exact for every iteration). Host-resident input: numpy count with
    # dual-dtype slack (grid_cell_cap). DEVICE-resident input: bin and
    # count on device, read back ONE scalar — np.asarray(X_mov) would fetch
    # 3*nm floats through the tunnel, which measured as ~40 s hidden
    # per-repeat cost in the big-C grid benchmark (the post-program
    # degraded transfer window, profile_bigc round 3). The device count is
    # exact for the in-program build (identical dtype arithmetic).
    if cfg.match_method == "grid" and cfg.match_cell_cap == 0:
        import dataclasses

        rm = cfg.match_radius if cfg.match_radius > 0 else cfg.max_overlap_distance
        if isinstance(X_mov, np.ndarray):
            from ..ops.gridhash import grid_cell_cap

            cap_m = grid_cell_cap(np.asarray(X_mov, np.float64), rm)
        else:
            _, cap_dev = _grid_build_cap_jit(Xm, jnp.asarray(rm, dtype))
            cap_m = -(-int(cap_dev) // 8) * 8
        cfg = dataclasses.replace(cfg, match_cell_cap=cap_m)

    # Resolve the overlap-gate engine (static choice, host-side). The dense
    # sweep runs at ~1e12 distance-pairs/s on the VPU, so brute wins below
    # ~1e12 pairs (TPU random gathers are slow: bunny grid 427ms vs brute
    # 47ms). Past that the gather-free dilated-occupancy gate
    # (ops/dilate_gate.py) takes over whenever a dense cell grid fits;
    # the hash-grid cell list remains the fallback for extreme volumetric
    # extents (its O(27*cap) per-query gathers are the slow path —
    # measured ~8-10 ns per gathered element).
    ext_sel_mask = None
    if cfg.overlap_enabled:
        from ..ops.transform import rbp_to_H as _rbp_to_H

        # H0 for gate PLANNING, computed lazily: only the big-cloud paths
        # (dilate bbox, device-side grid cap, dilate mask) consume it. The
        # brute gate — every small dataset — must not pay an extra device
        # program per run: each tiny dispatch through the test tunnel costs
        # milliseconds of latency on a ~50 ms job (round-4 small-path
        # audit). The in-program Q10 gate H0 is built inside _icp_run.
        _H0_cache = []

        def H0_dev_fn():
            if not _H0_cache:
                obs_host = (
                    _zeros_const((6,), dtype) if rbp_observed_values is None
                    else jnp.asarray(rbp_observed_values, dtype)
                )
                _H0_cache.append(_rbp_to_H(obs_host))
            return _H0_cache[0]

        resolved = cfg.gate_method
        plan = None
        if resolved in ("auto", "dilate"):
            from ..ops.dilate_gate import bbox_of, plan_dilate_gate

            want = resolved == "dilate" or (
                Xf.shape[0] * Xm.shape[0] > 2**40
            )
            if want:
                # bbox on device: planning never fetches full clouds
                lo, hi = bbox_of(Xf, Xm, H0_dev_fn())
                plan = plan_dilate_gate(
                    None, None, cfg.max_overlap_distance,
                    bbox=(np.asarray(lo), np.asarray(hi)),
                )
            if resolved == "dilate" and plan is None:
                raise ValueError(
                    "gate_method='dilate' needs a dense cell grid over the "
                    "joint bounding box; this cloud pair exceeds the cell "
                    "budget — use 'grid' or 'auto'."
                )
            if plan is not None:
                resolved = "dilate"
            elif resolved == "auto":
                resolved = (
                    "grid" if Xf.shape[0] * Xm.shape[0] > 2**41 else "brute"
                )
        cap = cfg.grid_cell_cap
        if resolved == "grid" and cap == 0:
            if isinstance(X_mov, np.ndarray):
                from ..models.solver import RigidBodyParameters
                from ..ops.gridhash import grid_cell_cap

                # gate-time (initial-transformed) movable cloud, host-side
                Xm_np = np.asarray(X_mov, np.float64)
                if rbp_observed_values is not None and np.any(
                    np.asarray(rbp_observed_values)
                ):
                    rbp = RigidBodyParameters()
                    rbp.set_parameter_attributes_from_list(
                        "estimated_value", np.asarray(rbp_observed_values)
                    )
                    H0_np = rbp.H
                    Xm_np = Xm_np @ H0_np[:3, :3].T + H0_np[:3, 3]
                cap = grid_cell_cap(Xm_np, cfg.max_overlap_distance)
            else:
                # device-resident cloud: count on device (one-scalar
                # readback) instead of fetching 3*nm floats through the
                # tunnel — see the match_cell_cap note above.
                _, cap_dev = _grid_build_cap_jit(
                    apply_H(Xm, H0_dev_fn().astype(dtype)),
                    jnp.asarray(cfg.max_overlap_distance, dtype),
                )
                cap = -(-int(cap_dev) // 8) * 8
        if resolved == "dilate":
            from ..ops.dilate_gate import overlap_mask_dilate

            # A host-resident input (the normal case: clouds loaded from
            # disk) lets the gate pack occupancy from a host-side transform
            # instead of fetching the device-transformed cloud through the
            # tunnel (~seconds at 10M+ points).
            ext_sel_mask = jnp.asarray(
                overlap_mask_dilate(
                    Xf, Xm, H0_dev_fn(), cfg.max_overlap_distance, plan,
                    Xm_host=X_mov if isinstance(X_mov, np.ndarray) else None,
                )
            )
        if (resolved, cap) != (cfg.gate_method, cfg.grid_cell_cap):
            import dataclasses

            cfg = dataclasses.replace(
                cfg, gate_method=resolved, grid_cell_cap=cap
            )

    obs_vals = (_zeros_const((6,), dtype) if rbp_observed_values is None
                else jnp.asarray(rbp_observed_values, dtype))
    obs_w = (_zeros_const((6,), dtype) if rbp_observation_weights is None
             else jnp.asarray(rbp_observation_weights, dtype))

    has_normals = normals_fix is not None
    if has_normals:
        normals_arr = jnp.asarray(normals_fix, dtype)
        planarity_arr = (jnp.ones(Xf.shape[0], dtype) if planarity_fix is None
                         else jnp.asarray(planarity_fix, dtype))
    else:
        normals_arr = _zeros_const((1, 3), dtype)
        planarity_arr = _zeros_const((1,), dtype)

    has_mov_planarity = planarity_mov is not None
    planarity_mov_arr = (
        jnp.asarray(planarity_mov, dtype) if has_mov_planarity
        else _zeros_const((1,), dtype)
    )

    has_ext_sel = ext_sel_mask is not None
    if not has_ext_sel:
        ext_sel_mask = _zeros_const((1,), bool)

    # ---- Dispatch planning (host-side): monolithic vs host-chunked ----
    # Within program_budget_s the whole registration runs as ONE program
    # (fastest: one launch, full fusion). Over budget, dispatch="auto"
    # routes to the chunked driver — bounded-size programs, bit-identical
    # math — sized so each chunk stays well under the watchdog. Only a
    # config whose PROLOGUE or single ITERATION alone exceeds the budget is
    # refused (no program shape can run it).
    import dataclasses

    from ..utils.device_policy import estimate_tpu_stage_seconds

    dispatch = cfg.dispatch
    chunk_k = cfg.chunk_iterations
    knn_block = 0
    knn_grid = False
    budget = cfg.program_budget_s
    guarded = budget > 0 and jax.default_backend() != "cpu"
    if guarded:
        nf_, nm_ = Xf.shape[0], Xm.shape[0]
        gate_pairs = (
            float(nf_) * nm_
            if cfg.overlap_enabled and not has_ext_sel
            and cfg.gate_method == "brute"
            else 0.0
        )
        gate_s, knn_s, build_s, per_iter_s = estimate_tpu_stage_seconds(
            nf_, nm_,
            correspondences=cfg.correspondences,
            neighbors=cfg.neighbors,
            gate_pairs=gate_pairs,
            match_method=cfg.match_method,
            match_cell_cap=cfg.match_cell_cap,
            # a prepared fixed side skips the normals kNN like supplied
            # normals do
            has_normals=has_normals or fixed_prep is not None,
        )
        # the monolithic program runs up to max_iterations; guard on the
        # typical converged count like round 2 (healthy runs finish in ~10)
        est = gate_s + knn_s + build_s + min(10, cfg.max_iterations) * per_iter_s
        # atoms that no dispatch shape can split: the gate+select(+build)
        # program (they share one program even under the split prologue),
        # one loop iteration, one MINIMAL kNN query block
        knn_atom_s = min(knn_s, knn_s * 2048.0 / max(cfg.correspondences, 1))
        atom_s = max(gate_s + build_s, per_iter_s, knn_atom_s)
        if atom_s > budget * 0.9:
            raise ValueError(
                f"this configuration is estimated at ~{atom_s:.0f} s of "
                f"device time for its largest indivisible program (gate "
                f"~{gate_s:.0f} s, grid build ~{build_s:.0f} s, "
                f"~{per_iter_s:.0f} s per iteration) — even chunked "
                f"dispatch would exceed the program_budget_s={budget:g} "
                "watchdog guard (over-long programs crash TPU workers). "
                "Reduce `correspondences`, set a small `match_radius` "
                "(grid-matcher cells shrink with it), run sharded across "
                "chips, use --device cpu, or raise/disable "
                "program_budget_s if your runtime allows long programs."
            )
        if dispatch == "monolithic" and est > budget:
            raise ValueError(
                f"this configuration is estimated at ~{est:.0f} s of device "
                f"time in ONE program, over the program_budget_s="
                f"{budget:g} watchdog guard (over-long programs crash TPU "
                "workers). Use dispatch='auto'/'chunked' (bounded-size "
                "programs, identical math), reduce `correspondences`, or "
                "raise/disable program_budget_s if your runtime allows "
                "long programs."
            )
        if dispatch == "auto":
            dispatch = "monolithic" if est <= budget else "chunked"
        if dispatch == "chunked":
            if chunk_k == 0:
                # half the budget per chunk: 2x headroom on measured rates
                chunk_k = max(1, int((budget * 0.5) / max(per_iter_s, 1e-9)))
            if gate_s + build_s + knn_s > budget * 0.9:
                # the combined prologue program would be over budget: split
                # out the normals kNN into query blocks of ~half budget
                # (multiples of the kernel's query tile keep results
                # bit-identical trivially; they are anyway)
                rows_per_budget = (budget * 0.5) / max(knn_s, 1e-9) \
                    * cfg.correspondences
                knn_block = max(2048, int(rows_per_budget) // 2048 * 2048)
                # never pad beyond C rounded to the next block quantum
                knn_block = min(
                    knn_block, -(-cfg.correspondences // 2048) * 2048
                )
                # when the dense kNN dominates, try the grid-kNN prologue
                # first (certificates + dense patching keep it bit-exact;
                # _knn_grid_normals falls back to the blocks if the grid
                # plan is uneconomical)
                knn_grid = knn_s > budget * 0.5
        import logging

        logging.getLogger(__name__).info(
            "dispatch plan: %s (est %.1f s = gate %.1f + knn %.1f + build "
            "%.1f + %.2f s/iter%s%s; budget %g s)",
            dispatch, est, gate_s, knn_s, build_s, per_iter_s,
            f", K={chunk_k}" if dispatch == "chunked" else "",
            f", knn_block={knn_block}" if knn_block else "", budget,
        )
        if (dispatch == "chunked" and not warm_requested
                and per_iter_s > 1.0
                and (rbp_observed_values is None
                     or not np.any(np.asarray(rbp_observed_values)))
                and (rbp_observation_weights is None
                     or not np.any(np.asarray(rbp_observation_weights)))):
            # Iterations dominate this run's cost, and a coarse-to-fine
            # seed typically removes half of them (measured: C=1e5 x
            # 12.5M, 48.4 s cold -> 26.3 s warm, BENCHMARKS.md). Only
            # hinted when no rbp observations exist (a finite-weight
            # observation is incompatible; an initial-value observation
            # means the user already seeds H).
            logging.getLogger(__name__).info(
                "hint: this registration runs ~%.1f s per full-resolution "
                "iteration; warm_start=True (coarse-to-fine) typically "
                "halves the iteration count at identical convergence "
                "basin.", per_iter_s,
            )
    else:
        if dispatch == "auto":
            dispatch = "monolithic"
        if chunk_k == 0:
            chunk_k = 8

    # dispatch/warm-start fields never reach the trace; normalize them out
    # of the jit static argument so plan changes don't recompile identical
    # programs
    run_cfg = dataclasses.replace(
        cfg, dispatch="auto", chunk_iterations=0, warm_start=False,
        warm_start_points=1_000_000, warm_start_correspondences=1000,
    )
    if fixed_prep is not None:
        prep5 = (fixed_prep.Q, fixed_prep.normals, fixed_prep.planarity,
                 fixed_prep.sel_idx, fixed_prep.sel_valid)
        if dispatch == "chunked":
            return _icp_run_chunked(
                Xf, Xm, obs_vals, obs_w, normals_arr, planarity_arr,
                planarity_mov_arr, ext_sel_mask,
                cfg=run_cfg, has_normals=has_normals,
                has_mov_planarity=has_mov_planarity,
                has_ext_sel=has_ext_sel, chunk_iters=chunk_k,
                prep=prep5,
            )
        return _icp_run_prepared(
            Xm, obs_vals, obs_w, *prep5, planarity_mov_arr,
            cfg=run_cfg, has_mov_planarity=has_mov_planarity,
        )
    if dispatch == "chunked":
        return _icp_run_chunked(
            Xf, Xm, obs_vals, obs_w, normals_arr, planarity_arr,
            planarity_mov_arr, ext_sel_mask,
            cfg=run_cfg, has_normals=has_normals,
            has_mov_planarity=has_mov_planarity,
            has_ext_sel=has_ext_sel, chunk_iters=chunk_k,
            knn_block=knn_block, knn_grid=knn_grid,
        )
    return _icp_run(
        Xf, Xm, obs_vals, obs_w, normals_arr, planarity_arr,
        planarity_mov_arr, ext_sel_mask,
        cfg=run_cfg, has_normals=has_normals,
        has_mov_planarity=has_mov_planarity,
        has_ext_sel=has_ext_sel,
    )


# Largest vmapped distance-block footprint (batch * query_tile * ref_tile
# elements) measured SAFE on the TPU worker: B=2 at the default 2048x4096
# tiles ran; B=8 at the same tiles (4x this budget) crashed the worker
# with a kernel fault (round 5, serving_batch_r5.json). icp_register_batch
# shrinks tiles to stay inside this and warns when the floors prevent it.
_BATCH_FOOTPRINT_BUDGET = 2 * 2048 * 4096


def icp_register_batch(
    X_fix,
    X_mov,
    cfg: IcpConfig = IcpConfig(),
    *,
    rbp_observed_values: Optional[np.ndarray] = None,
    rbp_observation_weights: Optional[np.ndarray] = None,
    dtype=None,
) -> IcpResult:
    """Register a BATCH of cloud pairs in one device program (vmap over the
    full pipeline — gate, selection, normals, and the masked while_loop all
    batch cleanly because nothing in the design has dynamic shapes).

    The reference has no analog: it registers one pair per process. On TPU
    this is the serving-throughput path — launch overhead and pipeline
    bubbles amortize across the batch, so registering B small pairs costs
    far less than B separate launches.

    Args:
        X_fix: (B, nf, 3) fixed clouds; X_mov: (B, nm, 3) movable clouds.
        rbp_observed_values / rbp_observation_weights: optional (B, 6)
            per-pair observations (angles in radians).
        cfg: shared static configuration. gate_method="grid" is not
            supported in batch mode (its candidate cap is per-cloud static);
            the dense gate and all other features work unchanged.

    Returns:
        IcpResult with a leading batch axis on every field.
    """
    if cfg.overlap_enabled and cfg.gate_method in ("grid", "dilate"):
        raise ValueError(
            f"gate_method={cfg.gate_method!r} is not supported in batch mode"
        )
    if cfg.match_method == "auto":
        # batch pairs are serving-sized; the grid matcher is per-cloud
        # static so auto always resolves to brute here
        import dataclasses

        cfg = dataclasses.replace(cfg, match_method="brute")
    if cfg.match_method != "brute":
        raise ValueError(
            "match_method='grid' is not supported in batch mode (its cell "
            "cap is per-cloud static)"
        )
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    Xf = jnp.asarray(X_fix, dtype)
    Xm = jnp.asarray(X_mov, dtype)
    if Xf.ndim != 3 or Xf.shape[2] != 3 or Xm.ndim != 3 or Xm.shape[2] != 3:
        raise ValueError("batched clouds must have shape (B, n, 3)")
    if Xf.shape[0] != Xm.shape[0]:
        raise ValueError("batch sizes of fixed and movable clouds differ")
    _check_round_linspace_domain(cfg.correspondences, Xf.shape[1])
    B = Xf.shape[0]

    import dataclasses

    # Batch mode always runs the lax kernels: vmap adds a batch dimension
    # that Pallas block specs cannot absorb, and the gate falls back to the
    # dense sweep (both vmap cleanly; XLA fuses across the batch).
    if (cfg.overlap_enabled and cfg.gate_method == "auto") or cfg.use_pallas:
        cfg = dataclasses.replace(
            cfg,
            gate_method=("brute" if cfg.overlap_enabled and
                         cfg.gate_method == "auto" else cfg.gate_method),
            use_pallas=False,
        )

    obs_vals = (jnp.zeros((B, 6), dtype) if rbp_observed_values is None
                else jnp.asarray(rbp_observed_values, dtype))
    obs_w = (jnp.zeros((B, 6), dtype) if rbp_observation_weights is None
             else jnp.asarray(rbp_observation_weights, dtype))

    # vmap multiplies every per-tile intermediate of the distance kernels
    # by B, so the (query_tile x ref_tile) block that is proven on TPU for
    # a single pair becomes B x that under batching — measured on hardware
    # (round 5): a B=8 gated bunny batch at the default tiles (footprint
    # 8 x 2048 x 4096) CRASHES the TPU worker with a kernel fault, while
    # B=2 (2x the single-pair product) runs. Shrink the tiles until the
    # ABSOLUTE footprint B*qt*rt is back inside the measured-safe budget;
    # results are tile-invariant (the kernels' tie handling is
    # index-based, locked by test_batch), so this only changes scheduling.
    # Halving stops at the efficiency floors (qt>=256, rt>=1024 — the
    # guards require >= 2*floor BEFORE halving so a non-power-of-two
    # explicit tile never lands below its floor).
    qt = cfg.query_tile
    rt = cfg.ref_tile or 4096
    if jax.default_backend() != "cpu":
        # accelerators only: the budget guards a TPU-worker kernel fault
        # that cannot occur on CPU, and shrinking there would just add
        # lax.scan steps (the per-step overhead regime past ~100k points)
        while B * qt * rt > _BATCH_FOOTPRINT_BUDGET and rt >= 2 * 1024:
            rt //= 2
        while B * qt * rt > _BATCH_FOOTPRINT_BUDGET and qt >= 2 * 256:
            qt //= 2
    if (qt, rt) != (cfg.query_tile, cfg.ref_tile or 4096):
        cfg = dataclasses.replace(cfg, query_tile=qt, ref_tile=rt)
    if B * qt * rt > _BATCH_FOOTPRINT_BUDGET \
            and jax.default_backend() != "cpu":
        import logging

        logging.getLogger(__name__).warning(
            "icp_register_batch: batch=%d at tiles (%d x %d) has a vmapped "
            "distance-block footprint %.1fx the measured-safe budget even "
            "after shrinking to the efficiency floors — a footprint 4x the "
            "budget faulted the TPU worker (round-5 measurement). Prefer "
            "pipelined single-pair dispatch for large batches "
            "(BENCHMARKS.md serving A/B: it is also faster).",
            B, qt, rt, B * qt * rt / _BATCH_FOOTPRINT_BUDGET,
        )

    dummy_n = jnp.zeros((B, 1, 3), dtype)
    dummy_p = jnp.zeros((B, 1), dtype)
    dummy_sel = jnp.zeros((B, 1), bool)
    run = functools.partial(
        _icp_run, cfg=cfg, has_normals=False, has_mov_planarity=False,
        has_ext_sel=False,
    )
    return jax.vmap(run)(
        Xf, Xm, obs_vals, obs_w, dummy_n, dummy_p, dummy_p, dummy_sel
    )
