"""Fused Pallas kernel for the euler_step hot loop: advection RHS + limiter.

This is the TPU counterpart of the reference's own accelerator fusion
(reference: cuda_mod.F90:767-832 `euler_step_kernel1` computes the advection
RHS on device, :863-913 the limiter kernel, :917-928 the rspheremp scale —
dispatched from prim_advection_mod.F90:715-718).  One kernel invocation per
element computes, entirely VMEM-resident:

    Vstar   = vn0 / dp                                (euler_step :845-852)
    gradQ   = Vstar * Qdp
    Qtens   = Qdp - dt * divergence_sphere(gradQ)     (:873-876)
            + hyperviscosity on stage 2 (:878): either a precomputed
              tendency (bih_mode=1) or, given the DSS'd first Laplacian,
              the second weak Laplacian computed in-kernel (bih_mode=2 —
              the back half of viscosity_mod.F90:289-351)
    limited = limiter_optim_iter_full(Qtens/dp_star)  (:886, :976-1094)
    out     = spheremp * limited                      (:901)

leaving only the DSS (cross-element) and the neighbor min/max outside.  The
XLA pipeline needs ~10 HBM round trips of the [E,q,k,16] field for the same
stage; this kernel needs 2 (read Qdp, write out).

Layouts: the grid is the element axis.  Per element, tracer x level (q*k)
lies in lanes and the 16 GLL points in sublanes (the T layout; see
model/core.py euler_step_t).  The spectral derivative acts on the point
axis as 4-term weighted sublane rolls on the VPU (see the roll-coefficient
comment below — a [16,16] matmul would run the MXU at ~1.5% utilization
and dominated the kernel).  Per-element metric factors ([16] vectors)
broadcast along lanes; per-level fields ([16,k]) broadcast over tracers
with an in-VMEM tile repeat.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import RREARTH

import os as _os
# relative limiter convergence tolerance (|addmass| <= tol*|mass|).
# 5e-14 is the reference's f64-grade criterion (prim_advection_mod.F90
# limiter_optim_iter_full); in the f32 kernel it forces iteration to an
# exact-zero residual far past f32 precision — TSE_LIM_TOL loosens it
# (mass is preserved at ANY exit: every loop exit redistributes the clip
# residual; the tolerance only bounds the residual left on the bounds,
# which at 1e-7 is f32-roundoff-sized).  Audited by scripts/audit_limcap.
TOL_LIMITER = float(_os.environ.get("TSE_LIM_TOL", "5e-14"))
MAX_ITER = int(_os.environ.get("TSE_MAX_ITER", "15"))  # np*np-1; env
# override is a PROFILING knob only (lower caps give wrong results)
N2 = 16
# v3 limiter lane-group width (128-aligned); 0 = one group (whole tile).
# Smaller groups exit the data-dependent limiter loop earlier on smooth
# lanes at the cost of more unrolled loop bodies.
LIM_GROUP_LANES = int(_os.environ.get("TSE_LIM_GROUP_LANES", "512"))
# v3 limiter: two clip-redistribute updates per while_loop trip (bitwise
# identical for EVEN iteration caps; auto-disabled otherwise) — halves
# the per-trip convergence-reduction/branch syncs
LIM_UNROLL2 = _os.environ.get("TSE_LIM_UNROLL2", "0") not in ("0", "",
                                                              "off")
# v3 limiter: fully unroll the iteration loop (no while_loop, no scalar
# convergence reduction or branch at all) when the cap is small.  Bitwise
# identical to the while_loop: converged columns are fixed points of the
# body (clip is idempotent once x = xcl and the conv mask zeroes the
# redistribution), so running the body exactly max_iter times gives the
# same result whether or not the group would have exited early — the
# while_loop exists purely as an early-exit optimization, and measured
# NE30 groups almost never exit early (bench: unroll2 +3.7%).  Audited
# bitwise on hardware by scripts/audit_unroll.py --full.
LIM_FULL_UNROLL_CAP = int(_os.environ.get("TSE_LIM_FULL_UNROLL_CAP", "6"))
# v3 MXU matmul precision: "highest" = 6-pass bf16 (f32-equivalent,
# 1.6e-7 vs rolls), "default" = 1-pass bf16 (4.8e-3 — profiling only).
# "high" (3-pass) is NOT lowerable by Mosaic inside Pallas kernels
# (NotImplementedError: Unsupported dot precision, measured r4) — the
# only in-kernel choices are highest and the rhs_bf16 flag's default.
MXU_PRECISION = {"default": jax.lax.Precision.DEFAULT,
                 "high": jax.lax.Precision.HIGH,
                 "highest": jax.lax.Precision.HIGHEST}[
                     _os.environ.get("TSE_MXU_PREC", "highest")]
# weak-Laplacian derivative form inside the fused kernels (the DSS lap1
# epilogue, the euler kernel's in-kernel lap2, laplace_wk_t):
#   "roll"  = cyclic sublane rolls (v1 form; ~10-16 full-width ops per
#             derivative application)
#   "bcast" = sublane-group broadcast FMAs on the (.., 4, 4, L) view
#             (v2 form; ~7 ops per application on paper — the reshape
#             relayout cost is the open question, A/B on hardware)
LAP_FORM = _os.environ.get("TSE_LAP_FORM", "roll")
KERNEL_VERSION = int(_os.environ.get("TSE_EULER_KERNEL", "3"))
# 3 = MXU kernel (default): point-axis derivatives as block-diagonal
#     [128,128] matmuls over the [eb*16, L] view (requires eb = 8, else
#     falls back to v1) + lane-group-decoupled limiter.  Measured
#     NE30/35tr advection stage: 26.0 ms vs 35.2 ms for v1
#     (scripts/bench_euler_ab.py, pull-fenced).
# 1 = roll-based kernel (previous default; all-VPU)
# 2 = broadcast/tree kernel (fewer full-width VPU ops on paper; kept as a
#     tested alternative — the (eb,4,4,L) reshapes relayout in Mosaic)


def _repeat_lanes(x, q):
    """[..., 16, k] -> [..., 16, q*k] tiling along lanes (tracer
    broadcast)."""
    if q == 1:
        return x
    return pltpu.repeat(x, q, axis=x.ndim - 1)


def _rep_to(x, L):
    """[..., 16, k] -> [..., 16, L] by lane tiling + slice: the tracer
    broadcast for (possibly 128-padded) lane widths L >= k."""
    k = x.shape[-1]
    if L == k:
        return x
    t = -(-L // k)
    y = pltpu.repeat(x, t, axis=x.ndim - 1)
    return y if t * k == L else y[..., :L]


# ---------------------------------------------------------------------------
# Point-axis spectral derivatives as sublane rolls (VPU).
#
# A [16,16] x [16,L] matmul runs the MXU at 16x16/128x128 ~ 1.5%
# utilization — it dominated the kernel.  Each derivative is really a
# 4-term weighted sum along one index of the (i,j) point grid, which maps
# to 4 cyclic sublane shifts with per-row constant coefficients:
#   d/dx:  out[(l,j)] = sum_d  deriv[l,(l+d)%4] * X[((l+d)%4, j)]
#          X[((l+d)%4, j)] = roll(X, -4d) along sublanes
#   d/dy:  out[(i,l)] = sum_d  deriv[l,(l+d)%4] * X[(i, (l+d)%4)]
#          intra-group-of-4 cyclic shift = two rolls + a row select
# The transposed contractions (weak-form divergence) use the same rolls
# with transposed coefficient vectors.
# ---------------------------------------------------------------------------

def _roll_coeffs(deriv: np.ndarray, transpose: bool):
    """Coefficient matrices [16, 4] (column d = roll distance) for d/dx
    and d/dy.  Passed to the kernels as inputs (Pallas forbids captured
    array constants)."""
    n = deriv.shape[0]
    cx = np.zeros((n * n, n))
    cy = np.zeros((n * n, n))
    for d in range(n):
        for l in range(n):
            src = (l + d) % n
            w = deriv[src, l] if transpose else deriv[l, src]
            for j in range(n):
                cx[l * n + j, d] = w
                cy[j * n + l, d] = w
    return cx, cy


def _mxu_weights(deriv: np.ndarray, m: int = 128) -> np.ndarray:
    """Block-diagonal MXU derivative weights, stacked [2*m, m].

    With eb elements per grid step the [eb, 16, L] operand views as
    [m = eb*16, L] (m a multiple of 128), and a point-axis derivative
    over all eb elements is ONE m-contraction matmul with a
    block-diagonal weight — full MXU utilization (the 16x16 per-element
    blocks are dense on the diagonal; the zeros off-diagonal cost nothing
    on a systolic array).  Per-element blocks: d/dx = D (x) I4 (contract
    the i index of the (i,j) point raster), d/dy = I4 (x) D (contract j).
    Precision HIGHEST keeps the result within f32 roundoff of the roll
    path (measured 1.6e-7 max rel, scripts/microbench_deriv.py)."""
    n = deriv.shape[0]
    n2 = n * n
    blocks = [np.kron(deriv, np.eye(n)), np.kron(np.eye(n), deriv)]
    w = np.zeros((len(blocks) * m, m))
    for s, blk in enumerate(blocks):
        for b in range(m // n2):
            r = s * m + b * n2
            w[r:r + n2, b * n2:(b + 1) * n2] = blk
    return w


def _ddy_mask_mat():
    """[16, 4] mask, column d: 1.0 where l < 4-d (no group wrap)."""
    m = np.zeros((16, 4))
    for d in range(4):
        for i in range(4):
            for l in range(4):
                m[i * 4 + l, d] = 1.0 if l < 4 - d else 0.0
    return m


def _ddx_rolls(X, cx):
    """Contract the i-index (stride-4 sublane groups): 4 rolls.
    X: [..., 16, L]; cx: [16, 4] coefficient ref value."""
    ax = X.ndim - 2
    out = cx[:, 0:1] * X
    for d in range(1, 4):
        out = out + cx[:, d:d + 1] * pltpu.roll(X, (16 - 4 * d) % 16,
                                                axis=ax)
    return out


def _ddy_rolls(X, cy, masks):
    """Contract the j-index (within sublane groups of 4): rolls + 2 FMAs.
    X: [..., 16, L]; cy, masks: [16, 4].  The per-row coefficient*mask
    products are tiny [16,1] values, so each distance costs two full-width
    FMAs instead of a select chain."""
    ax = X.ndim - 2
    out = cy[:, 0:1] * X
    for d in range(1, 4):
        ca = cy[:, d:d + 1] * masks[:, d:d + 1]
        cb = cy[:, d:d + 1] - ca
        a = pltpu.roll(X, (16 - d) % 16, axis=ax)       # X[p+d]
        b = pltpu.roll(X, (16 - d + 4) % 16, axis=ax)   # X[p+d-4]
        out = out + ca * a + cb * b
    return out


# ---------------------------------------------------------------------------
# v2 kernel: the same fusion with ~2.5x fewer full-width VPU ops.
#   * per-level factors (Vstar, metric transform, metdet) fold BEFORE the
#     tracer broadcast: c1 = rep((Dinv^T vn0)*metdet/dp) * qdp instead of
#     transforming the full [16, q*k] gradQ
#   * spectral derivatives as sublane-group broadcast sums on the
#     [eb, 4, 4, L] view (7 full-width FMAs per application vs 29 roll ops
#     for the fused pair)
#   * sublane-16 reductions as an explicit (4, 4) pairwise tree (~1
#     full-width-op equivalent vs a generic cross-sublane reduce)
#   * limiter body in clip-residual form (15 full-width ops/iteration)
# ---------------------------------------------------------------------------

def _sum16(x):
    """Pairwise tree sum over the 16-point sublane axis.

    x: [eb, 16, L] -> [eb, 1, L].  Exact zeros stay exact (the limiter
    convergence argument needs only that); ordering differs from a naive
    left fold by association only.
    """
    eb_, _, L_ = x.shape
    x4 = x.reshape(eb_, 4, 4, L_)
    s = (x4[:, 0] + x4[:, 1]) + (x4[:, 2] + x4[:, 3])        # [eb, 4, L]
    return ((s[:, 0:1] + s[:, 1:2]) + (s[:, 2:3] + s[:, 3:4]))


def _ddxy_bcast(x1, x2, d):
    """ddx(x1) + ddy(x2) via sublane-group broadcasts.

    x1, x2: [eb, 16, L] in the (i, j) point raster (slot = i*4 + j);
    d: [4, 4] GLL derivative, d[l, i] = ell_i'(x_l).
      ddx: out[(l, j)] = sum_i d[l, i] x1[(i, j)]
      ddy: out[(i, l)] = sum_s d[l, s] x2[(i, s)]
    """
    eb_, _, L_ = x1.shape
    a = x1.reshape(eb_, 4, 4, L_)
    b = x2.reshape(eb_, 4, 4, L_)
    out = None
    for s in range(4):
        cl = d[:, s].reshape(1, 4, 1, 1)          # d[l, s] along l
        t = cl * a[:, s:s + 1, :, :] + cl.reshape(1, 1, 4, 1) \
            * b[:, :, s:s + 1, :]
        out = t if out is None else out + t
    return out.reshape(eb_, 16, L_)


def _ddx_bcast(x, d):
    """ddx alone: out[(l, j)] = sum_i d[l, i] x[(i, j)]."""
    eb_, _, L_ = x.shape
    a = x.reshape(eb_, 4, 4, L_)
    out = None
    for s in range(4):
        t = d[:, s].reshape(1, 4, 1, 1) * a[:, s:s + 1, :, :]
        out = t if out is None else out + t
    return out.reshape(eb_, 16, L_)


def _ddy_bcast(x, d):
    """ddy alone: out[(i, l)] = sum_s d[l, s] x[(i, s)]."""
    eb_, _, L_ = x.shape
    a = x.reshape(eb_, 4, 4, L_)
    out = None
    for s in range(4):
        t = d[:, s].reshape(1, 1, 4, 1) * a[:, :, s:s + 1, :]
        out = t if out is None else out + t
    return out.reshape(eb_, 16, L_)


def _dmat_np(deriv_np):
    """[16, 4] packed derivative: rows 0-3 = D, 4-7 = D^T, 8-15 zero
    (the _euler_kernel2 dmat convention, shared by the bcast lap form)."""
    return np.concatenate([deriv_np, deriv_np.T, np.zeros((8, 4))])


def _smet(d00, d01, d10, d11, spm):
    """Symmetric folded lap metric S = spm * Dinv Dinv^T: (S00, S01, S11).

    Host-side companion of _lap_wk — fold the two metric applications of
    laplace_sphere_wk (w = spm * Dinv (Dinv^T v)) into one static
    3-coefficient table so the kernels' full-width metric stage is 6 FMAs
    instead of ~13 (same math, reassociated at roundoff level — the
    XLA-path parity tests carry the tolerance).  Computing S *in-kernel*
    from d00..d11 was measured WORSE (16.4 vs 13.9 ms at NE30 — the
    [.., 16, 1] narrow ops are not free); precompute host-side.
    """
    return ((d00 * d00 + d01 * d01) * spm,
            (d00 * d10 + d01 * d11) * spm,
            (d10 * d10 + d11 * d11) * spm)


def _lap_wk(q, s00, s01, s11, cx, cy, cxt, cyt, masks, dmat):
    """laplace_sphere_wk on a kernel block q [..., 16, L].

    The weak Laplacian shared by the DSS lap1 epilogue
    (viscosity_mod.F90:289-351 first half), the euler kernel's in-kernel
    lap2 (back half), and laplace_wk_t.  s00/s01/s11 are the _smet folded
    metric, broadcastable against q ([..., 16, 1]).  Derivative
    applications follow LAP_FORM: rolls (cx/cy/cxt/cyt [16,4] roll
    coefficients) or sublane-group broadcasts (dmat [16,4]: rows 0-3 D,
    4-7 D^T).  The two forms differ by summation association only
    (roundoff-level).

    r5 hardware A/B (NE30 dss_scale_minmax_t+lap, fenced): roll 13.9 ms
    vs bcast 29.3 ms — the (.., 4, 4, L) views relayout in Mosaic exactly
    as the v2 kernel comment warned; roll stays the default.
    """
    f = q.dtype
    if LAP_FORM == "bcast":
        sh = q.shape
        L = sh[-1]
        q3 = q.reshape(-1, N2, L)
        r3 = lambda a: jnp.broadcast_to(a, sh[:-1] + (1,)) \
            .reshape(-1, N2, 1)
        d = dmat[0:4]
        dT = dmat[4:8]
        e00, e01, e11 = r3(s00), r3(s01), r3(s11)
        v1 = _ddx_bcast(q3, d)
        v2 = _ddy_bcast(q3, d)
        w1 = e00 * v1 + e01 * v2
        w2 = e01 * v1 + e11 * v2
        t2 = _ddxy_bcast(w1, w2, dT)
        return (-jnp.asarray(RREARTH * RREARTH, f) * t2).reshape(sh)
    v1 = _ddx_rolls(q, cx)
    v2 = _ddy_rolls(q, cy, masks)
    w1 = s00 * v1 + s01 * v2
    w2 = s01 * v1 + s11 * v2
    t2 = _ddx_rolls(w1, cxt) + _ddy_rolls(w2, cyt, masks)
    return -jnp.asarray(RREARTH * RREARTH, f) * t2


def _euler_kernel2(nq, dt, rhs_viss, bih_mode, nu_coef, max_iter,
                   qdp_ref, u_ref, v_ref, dp_ref, divdp_ref, met_ref,
                   qmin_ref, qmax_ref, dmat_ref, dp0_ref, bih_ref,
                   out_ref, qmin_out_ref, qmax_out_ref):
    f = qdp_ref.dtype
    one = jnp.asarray(1.0, f)
    dmat = dmat_ref[:]                  # [16, 4]: rows 0-3 deriv, 4-7 T
    d = dmat[0:4]                       # [4, 4] deriv
    dT = dmat[4:8]                      # [4, 4] deriv^T

    qdp = qdp_ref[...]                  # [eb, 16, L]
    L = qdp.shape[-1]

    met = met_ref[...]                  # [eb, 7, 16] packed metric vectors
    sw = lambda i: jnp.swapaxes(met[:, i:i + 1, :], -1, -2)  # [eb,16,1]
    d00 = sw(0)
    d01 = sw(1)
    d10 = sw(2)
    d11 = sw(3)
    metdet = sw(4)
    rmetdet = sw(5)
    spheremp = sw(6)

    # per-level ([eb,16,k]) precomputation — nq x cheaper than full width
    dpk = dp_ref[...]
    divk = divdp_ref[...]
    rcp_dpk = one / dpk
    uk = u_ref[...]                     # vn0 components (dp-weighted)
    vk = v_ref[...]
    mdd = metdet * rcp_dpk              # one 1/dp: Vstar = vn0/dp
    A1k = (d00 * uk + d01 * vk) * mdd   # contravariant*metdet/dp factors
    A2k = (d10 * uk + d11 * vk) * mdd
    dp_star_k = dpk - jnp.asarray(dt, f) * divk
    c_k = spheremp * dp_star_k
    sumc_k = _sum16(c_k)                # [eb, 1, k]

    A1 = _rep_to(A1k, L)
    A2 = _rep_to(A2k, L)
    c = _rep_to(c_k, L)
    rcp_star = _rep_to(one / dp_star_k, L)

    # advection RHS: qtens = qdp - dt*rr*rmetdet * (ddx(A1*qdp)+ddy(A2*qdp))
    div2 = _ddxy_bcast(A1 * qdp, A2 * qdp, d)
    srm = jnp.asarray(dt * RREARTH, f) * rmetdet
    qtens = qdp - srm * div2
    if bih_mode == 1:
        qtens = qtens + bih_ref[...]
    elif bih_mode == 2:
        # second weak Laplacian of the DSS'd first Laplacian, in-kernel
        # (viscosity_mod.F90:289-351 back half)
        b = bih_ref[...]
        v1 = _ddx_bcast(b, d)
        v2 = _ddy_bcast(b, d)
        g1 = d00 * v1 + d10 * v2
        g2 = d01 * v1 + d11 * v2
        w1 = (d00 * g1 + d01 * g2) * spheremp
        w2 = (d10 * g1 + d11 * g2) * spheremp
        lap2 = -jnp.asarray(RREARTH * RREARTH, f) * _ddxy_bcast(w1, w2, dT)
        dp0lane = dp0_ref[:]            # [1, L]
        qtens = qtens + (jnp.asarray(nu_coef, f) * dp0lane) \
            * lap2 * (one / spheremp)

    # ---- limiter 8 on Q = qtens/dp_star (prim_advection_mod.F90:976) ----
    x = qtens * rcp_star
    minp = qmin_ref[...][:, None, :]    # [eb, 1, L]
    maxp = qmax_ref[...][:, None, :]

    sumc = _rep_to(sumc_k, L)
    mass = _sum16(c * x)
    validf = (sumc > 0).astype(f)
    safe_sumc = jnp.where(sumc > 0, sumc, one)
    minp = jnp.where(mass < minp * safe_sumc, mass / safe_sumc, minp)
    maxp = jnp.where(mass > maxp * safe_sumc, mass / safe_sumc, maxp)
    qmin_out_ref[...] = minp[:, 0, :]
    qmax_out_ref[...] = maxp[:, 0, :]
    # f32 convergence: the 5e-14 tolerance passes only when the explicit
    # clip-residual sum is exactly 0 (nothing clips) — bitwise mass
    # preservation; see the v1 kernel comment history
    tol = jnp.asarray(TOL_LIMITER, f) * jnp.abs(mass)

    def body(state):
        # xcl via clip (exact bound values) and resid = x - xcl (exact
        # zeros when nothing clips) — the f32 convergence argument needs
        # both exactness properties; see the v1 kernel comment
        it, x, _ = state
        xcl = jnp.clip(x, minp, maxp)
        resid = x - xcl
        addmass = _sum16(resid * c)
        conv = jnp.abs(addmass) <= tol
        pos = (addmass > 0).astype(f)
        free = (pos * (xcl < maxp).astype(f)
                + (one - pos) * (xcl > minp).astype(f))
        wsum = _sum16(free * c)
        add = jnp.where(wsum > 0,
                        addmass / jnp.where(wsum > 0, wsum, one), 0.0)
        x_next = xcl + jnp.where(conv, 0.0, free * add)
        return it + 1, x_next, jnp.maximum(conv.astype(f), one - validf)

    def cond(state):
        it, _, convf = state
        return (it < max_iter) & (jnp.min(convf) < 0.5)

    _, x, _ = jax.lax.while_loop(cond, body, (0, x, validf * 0.0))
    # out = spheremp * limited; limited = x*dp_star on valid columns, so
    # spheremp*x*dp_star = x*c — no dp_star broadcast needed
    out_ref[...] = validf * (x * c) + (one - validf) * (qtens * spheremp)


def _euler_kernel(nq, dt, rhs_viss, bih_mode, nu_coef, max_iter,
                  qdp_ref, u_ref, v_ref, dp_ref, divdp_ref, met_ref,
                  qmin_ref, qmax_ref, cx_ref, cy_ref, mask_ref,
                  cxt_ref, cyt_ref, dp0_ref, bih_ref,
                  out_ref, qmin_out_ref, qmax_out_ref):
    f = qdp_ref.dtype
    one = jnp.asarray(1.0, f)
    cxj = cx_ref[:]
    cyj = cy_ref[:]
    masks = mask_ref[:]

    qdp = qdp_ref[...]                 # [eb, 16, L] (point-major; L may
                                       #  be the 128-padded lane width)
    L = qdp.shape[-1]

    # all 7 per-element metric vectors arrive packed as one [eb,7,16]
    # block (one DMA instead of seven tiny ones)
    met = met_ref[...]
    sw = lambda i: jnp.swapaxes(met[:, i:i + 1, :], -1, -2)  # [eb,16,1]
    d00 = sw(0)
    d01 = sw(1)
    d10 = sw(2)
    d11 = sw(3)
    metdet = sw(4)
    rmetdet = sw(5)
    spheremp = sw(6)

    # everything that only depends on level (not tracer) is computed on
    # the small [eb,16,k] arrays, then tiled across tracers once — the
    # divisions in particular are nq x cheaper this way
    dpk = dp_ref[...]                  # [eb, 16, k]
    divk = divdp_ref[...]
    rcp_dpk = one / dpk
    u = _rep_to(u_ref[...] * rcp_dpk, L)  # Vstar zonal  [eb,16,L]
    v = _rep_to(v_ref[...] * rcp_dpk, L)  # Vstar meridional
    dp_star_k = dpk - jnp.asarray(dt, f) * divk
    c_k = spheremp * dp_star_k                   # [eb, 16, k]
    sumc_k = jnp.sum(c_k, axis=-2, keepdims=True)
    c = _rep_to(c_k, L)                          # [eb, 16, L]
    rcp_star = _rep_to(one / dp_star_k, L)
    dp_star = _rep_to(dp_star_k, L)

    gu = u * qdp                       # gradQ components
    gv = v * qdp
    c1 = (d00 * gu + d01 * gv) * metdet
    c2 = (d10 * gu + d11 * gv) * metdet
    div = (_ddx_rolls(c1, cxj) + _ddy_rolls(c2, cyj, masks)) \
        * rmetdet * jnp.asarray(RREARTH, f)

    qtens = qdp - jnp.asarray(dt, f) * div
    if bih_mode == 1:
        # precomputed hyperviscosity tendency
        qtens = qtens + bih_ref[...]
    elif bih_mode == 2:
        # second weak Laplacian of the DSS'd first Laplacian, in-kernel
        # (biharmonic_wk_scalar second half, viscosity_mod.F90:289-351):
        # bih input = rspheremp*DSS(laplace(Q)); tendency =
        # nu_coef * dp0(k) * laplace(bih) / spheremp
        b = bih_ref[...]
        cxtj = cxt_ref[:]
        cytj = cyt_ref[:]
        v1 = _ddx_rolls(b, cxj)
        v2 = _ddy_rolls(b, cyj, masks)
        g1 = d00 * v1 + d10 * v2
        g2 = d01 * v1 + d11 * v2
        w1 = (d00 * g1 + d01 * g2) * spheremp
        w2 = (d10 * g1 + d11 * g2) * spheremp
        lap2 = -jnp.asarray(RREARTH * RREARTH, f) \
            * (_ddx_rolls(w1, cxtj) + _ddy_rolls(w2, cytj, masks))
        dp0lane = dp0_ref[:]           # [1, qk]
        qtens = qtens + jnp.asarray(nu_coef, f) * dp0lane \
            * lap2 * (one / spheremp)

    # ---- limiter 8 on Q = qtens/dp_star (prim_advection_mod.F90:976) ----
    x = qtens * rcp_star
    # bounds travel as 2D [E, L] arrays in HBM (a [E,1,L] layout would
    # tile-pad the unit sublane 8x in storage and traffic)
    minp = qmin_ref[...][:, None, :]   # [eb, 1, L]
    maxp = qmax_ref[...][:, None, :]

    sumc = _rep_to(sumc_k, L)
    mass = jnp.sum(c * x, axis=-2, keepdims=True)
    validf = (sumc > 0).astype(f)
    safe_sumc = jnp.where(sumc > 0, sumc, one)
    minp = jnp.where(mass < minp * safe_sumc, mass / safe_sumc, minp)
    maxp = jnp.where(mass > maxp * safe_sumc, mass / safe_sumc, maxp)
    qmin_out_ref[...] = minp[:, 0, :]
    qmax_out_ref[...] = maxp[:, 0, :]
    # convergence tolerance: the reference's 5e-14 (f64,
    # prim_advection_mod.F90:1009).  In f32 this below-resolution value
    # only passes once addmass underflows to exactly 0 — i.e. the clip
    # finds nothing outside bounds — which preserves column mass to the
    # bit (a looser f32 tolerance was tried and drifted total mass by
    # ~1e-4 relative over a 12-day NE8 run; conservation wins)
    tol = jnp.asarray(TOL_LIMITER, f) * jnp.abs(mass)

    def body(state):
        # No separate `done` mask: a converged column has addmass == 0
        # exactly (nothing outside bounds after its clip), so conv stays
        # true and x_next == xcl == x — freezing is automatic.
        # addmass MUST be the sum of the explicit clip residuals (exact
        # zeros when nothing clips -> exact convergence); a
        # mass-difference formulation leaves reduction roundoff that
        # never passes the f32 tolerance and forces max iterations.
        it, x, _ = state
        over = x > maxp
        under = x < minp
        addmass = jnp.sum(jnp.where(over, (x - maxp) * c, 0.0)
                          + jnp.where(under, (x - minp) * c, 0.0),
                          axis=-2, keepdims=True)
        xcl = jnp.clip(x, minp, maxp)
        conv = jnp.abs(addmass) <= tol
        pos = (addmass > 0).astype(f)
        free = (pos * (xcl < maxp).astype(f)
                + (one - pos) * (xcl > minp).astype(f))
        wsum = jnp.sum(free * c, axis=-2, keepdims=True)
        add = jnp.where(wsum > 0,
                        addmass / jnp.where(wsum > 0, wsum, one), 0.0)
        x_next = xcl + jnp.where(conv, 0.0, free * add)
        # degenerate (sumc<=0) columns count as converged for the exit
        # test — their values are discarded by the validity blend below
        return it + 1, x_next, jnp.maximum(conv.astype(f), one - validf)

    def cond(state):
        it, _, convf = state
        return (it < max_iter) & (jnp.min(convf) < 0.5)

    _, x, _ = jax.lax.while_loop(cond, body, (0, x, validf * 0.0))
    limited = validf * (x * dp_star) + (one - validf) * qtens
    out_ref[...] = spheremp * limited


def _euler_kernel3(nq, dt, rhs_viss, bih_mode, nu_coef, prec, max_iter,
                   qdp_ref, u_ref, v_ref, dp_ref, divdp_ref, met_ref,
                   qmin_ref, qmax_ref, w_ref, cx_ref, cy_ref, mask_ref,
                   cxt_ref, cyt_ref, dm_ref, dp0_ref, bih_ref,
                   out_ref, qmin_out_ref, qmax_out_ref):
    """v1 fusion with the advection divergence on the MXU.

    The advection RHS and (on stage 2) the in-kernel second Laplacian are
    the only cross-point operations; everything else is lane-local.  The
    divergence's two derivative applications run as [128,128] x [128,L]
    matmuls against a block-diagonal weight (_mxu_weights) on the
    [eb*16, L] view — the MXU does them while the VPU keeps the limiter.
    The stage-2 Laplacian pair stays on VPU rolls: its four applications
    at HIGHEST matmul precision (6 bf16 passes each) cost more MXU time
    than the rolls cost VPU time (measured: v3-all-MXU bih stage 38.9 ms
    vs v1 38.8; rolls-lap2 hybrid keeps the 9 ms advection win)."""
    f = qdp_ref.dtype
    one = jnp.asarray(1.0, f)

    qdp = qdp_ref[...]                 # [eb, 16, L]
    eb_, _, L = qdp.shape

    def mm(w, x):
        xf = x.reshape(eb_ * 16, L)
        o = jax.lax.dot_general(w, xf, (((1,), (0,)), ((), ())),
                                precision=prec,
                                preferred_element_type=f)
        return o.reshape(eb_, 16, L)

    w_all = w_ref[...]
    M = eb_ * 16
    wx = w_all[0:M]
    wy = w_all[M:2 * M]

    met = met_ref[...]
    sw = lambda i: jnp.swapaxes(met[:, i:i + 1, :], -1, -2)  # [eb,16,1]
    d00 = sw(0)
    d01 = sw(1)
    d10 = sw(2)
    d11 = sw(3)
    metdet = sw(4)
    rmetdet = sw(5)
    spheremp = sw(6)

    dpk = dp_ref[...]                  # [eb, 16, k]
    divk = divdp_ref[...]
    rcp_dpk = one / dpk
    u = _rep_to(u_ref[...] * rcp_dpk, L)
    v = _rep_to(v_ref[...] * rcp_dpk, L)
    dp_star_k = dpk - jnp.asarray(dt, f) * divk
    c_k = spheremp * dp_star_k
    sumc_k = jnp.sum(c_k, axis=-2, keepdims=True)
    c = _rep_to(c_k, L)
    rcp_star = _rep_to(one / dp_star_k, L)

    gu = u * qdp
    gv = v * qdp
    c1 = (d00 * gu + d01 * gv) * metdet
    c2 = (d10 * gu + d11 * gv) * metdet
    div = (mm(wx, c1) + mm(wy, c2)) * rmetdet * jnp.asarray(RREARTH, f)

    qtens = qdp - jnp.asarray(dt, f) * div
    if bih_mode == 1:
        qtens = qtens + bih_ref[...]
    elif bih_mode == 2:
        # second weak Laplacian of the DSS'd first Laplacian
        # (viscosity_mod.F90:289-351 back half) on the VPU — see the
        # kernel docstring for why not MXU
        lap2 = _lap_wk(bih_ref[...], sw(7), sw(8), sw(9),
                       cx_ref[:], cy_ref[:], cxt_ref[:], cyt_ref[:],
                       mask_ref[:], dm_ref[:])
        dp0lane = dp0_ref[:]
        qtens = qtens + jnp.asarray(nu_coef, f) * dp0lane \
            * lap2 * (one / spheremp)

    # ---- limiter 8, lane-group decoupled ----
    # The limiter is lane-local (each (tracer, level) column iterates over
    # its own 16 points), so the lane axis splits exactly into independent
    # while_loops over 128-aligned groups: a group whose columns all
    # converge (smooth tracers — most of them) exits after one iteration
    # instead of riding along for the tile's worst column.  Same math,
    # same results, bitwise.
    x_all = qtens * rcp_star
    minp_all = qmin_ref[...][:, None, :]
    maxp_all = qmax_ref[...][:, None, :]
    sumc_all = _rep_to(sumc_k, L)
    group = LIM_GROUP_LANES if LIM_GROUP_LANES > 0 else L
    for g0 in range(0, L, group):
        g1 = min(g0 + group, L)
        sl = slice(g0, g1)
        x = x_all[..., sl]
        c_g = c[..., sl]
        minp = minp_all[..., sl]
        maxp = maxp_all[..., sl]
        sumc = sumc_all[..., sl]

        # pairwise-tree sublane sums (_sum16) throughout the limiter: the
        # generic cross-sublane reduce lowers ~5x worse in Mosaic (the v2
        # kernel's discovery, finally adopted in v3 — r5).  Exact zeros
        # stay exact, so the convergence/fixed-point arguments hold.
        mass = _sum16(c_g * x)
        validf = (sumc > 0).astype(f)
        safe_sumc = jnp.where(sumc > 0, sumc, one)
        minp = jnp.where(mass < minp * safe_sumc, mass / safe_sumc, minp)
        maxp = jnp.where(mass > maxp * safe_sumc, mass / safe_sumc, maxp)
        qmin_out_ref[:, sl] = minp[:, 0, :]
        qmax_out_ref[:, sl] = maxp[:, 0, :]
        tol = jnp.asarray(TOL_LIMITER, f) * jnp.abs(mass)

        def body(state, minp=minp, maxp=maxp, c_g=c_g, tol=tol,
                 validf=validf):
            # clip-residual form (see the v1/v2 kernel comments: the
            # explicit residual sum is exactly 0 when nothing clips,
            # which is the f32 convergence argument)
            it, x, _ = state
            xcl = jnp.clip(x, minp, maxp)
            resid = x - xcl
            addmass = _sum16(resid * c_g)
            conv = jnp.abs(addmass) <= tol
            pos = addmass > 0
            free = jnp.where(pos, (xcl < maxp).astype(f),
                             (xcl > minp).astype(f))
            fc = free * c_g
            wsum = _sum16(fc)
            add = jnp.where(wsum > 0,
                            addmass / jnp.where(wsum > 0, wsum, one), 0.0)
            x_next = xcl + free * jnp.where(conv, 0.0, add)
            return it + 1, x_next, jnp.maximum(conv.astype(f),
                                               one - validf)

        def cond(state):
            it, _, convf = state
            return (it < max_iter) & (jnp.min(convf) < 0.5)

        if 0 < max_iter <= LIM_FULL_UNROLL_CAP:
            # fully unrolled: exactly max_iter body applications, no
            # scalar convergence sync (see LIM_FULL_UNROLL_CAP above)
            state = (0, x, validf * 0.0)
            for _ in range(max_iter):
                state = body(state)
            _, x, _ = state
        elif LIM_UNROLL2 and max_iter % 2 == 0:
            # two clip-redistribute updates per loop trip: halves the
            # cond-reduction/scalar-branch syncs.  Results are bitwise
            # unchanged — converged columns are fixed points of the body
            # (clip is idempotent once x = xcl), and capped columns see
            # exactly max_iter updates either way (even cap required).
            def body2(state, body=body):
                return body(body(state))

            def cond2(state, cond=cond):
                return cond(state)

            _, x, _ = jax.lax.while_loop(cond2, body2,
                                         (0, x, validf * 0.0))
        else:
            _, x, _ = jax.lax.while_loop(cond, body, (0, x, validf * 0.0))
        # spheremp*x*dp_star = x*c — skips the dp_star lane-rep
        out_ref[:, :, sl] = validf * (x * c_g) \
            + (one - validf) * (qtens[..., sl] * spheremp)


def _laplace_kernel(eb, s_ref, s00_ref, s01_ref, s11_ref,
                    cx_ref, cy_ref, cxt_ref, cyt_ref,
                    mask_ref, dm_ref, out_ref):
    """Weak Laplacian in the [eb, 16, qk] T layout: one VMEM round trip.

    laplace_sphere_wk = divergence_sphere_wk(gradient_sphere(s))
    (derivative_mod.F90:2418; sphere_ops.py laplace_sphere_wk):
      v1 = ddx s; v2 = ddy s                     (covariant derivative)
      g1 = Dinv00 v1 + Dinv10 v2; g2 = Dinv01 v1 + Dinv11 v2   (grad)
      c1 = Dinv00 g1 + Dinv01 g2; c2 = Dinv10 g1 + Dinv11 g2   (contra)
      out = -rrearth^2 (ddx^T (sp c1) + ddy^T (sp c2))
    """
    s = s_ref[...]                     # [eb, 16, qk]
    sw = lambda r: jnp.swapaxes(r[...], -1, -2)   # [eb, 16, 1]
    out_ref[...] = _lap_wk(s, sw(s00_ref), sw(s01_ref), sw(s11_ref),
                           cx_ref[:], cy_ref[:], cxt_ref[:], cyt_ref[:],
                           mask_ref[:], dm_ref[:])


def laplace_wk_t(s_t, model_arrays, interpret=None, eb=4):
    """Weak Laplacian on T-layout fields s_t [E, 16, B] (B = q*k lanes)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    E, _, B = s_t.shape
    f = s_t.dtype
    if E % eb:
        eb = 1
    deriv = np.asarray(model_arrays["deriv"])
    cx, cy = _roll_coeffs(deriv, transpose=False)
    cxt, cyt = _roll_coeffs(deriv, transpose=True)
    Dinv = model_arrays["Dinv"]
    s00, s01, s11 = _smet(Dinv[..., 0, 0], Dinv[..., 0, 1],
                          Dinv[..., 1, 0], Dinv[..., 1, 1],
                          model_arrays["spheremp"])
    flat = lambda a: a.reshape(E, 1, N2)
    be = lambda s2: pl.BlockSpec((eb, N2, s2), lambda e: (e, 0, 0),
                                 memory_space=pltpu.VMEM)
    bmet = pl.BlockSpec((eb, 1, N2), lambda e: (e, 0, 0),
                        memory_space=pltpu.VMEM)
    bcoef = lambda w: pl.BlockSpec((N2, w), lambda e: (0, 0),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_laplace_kernel, eb),
        grid=(E // eb,),
        in_specs=[be(B), bmet, bmet, bmet,
                  bcoef(4), bcoef(4), bcoef(4), bcoef(4), bcoef(4),
                  bcoef(4)],
        out_specs=be(B),
        out_shape=jax.ShapeDtypeStruct((E, N2, B), f),
        interpret=interpret,
    )(s_t, flat(s00), flat(s01), flat(s11),
      jnp.asarray(cx, f), jnp.asarray(cy, f),
      jnp.asarray(cxt, f), jnp.asarray(cyt, f),
      jnp.asarray(_ddy_mask_mat(), f), jnp.asarray(_dmat_np(deriv), f))


def fused_advect_limit(Qdp, vn0, dp, divdp, qmin, qmax, model_arrays,
                       dt, rhs_viss=0, bih=None, interpret=None,
                       transposed=False, nq=None, eb=1,
                       bih_mode=None, nu_coef=0.0, dp0=None,
                       rhs_bf16=False, max_iter=0):
    """Fused advection RHS + limiter over all elements.

    Args (standard layout, transposed=False):
      Qdp:    [E, q, k, 4, 4] tracer mass at stage start
      vn0:    [E, k, 2, 4, 4] mean-flux velocity*dp
      dp:     [E, k, 4, 4]    stage layer thickness
      divdp:  [E, k, 4, 4]    un-projected div(vn0)
      qmin/qmax: [E, q, k]    limiter bounds (post neighbor-minmax)
      model_arrays: dict with Dinv, metdet, rmetdet, spheremp, deriv
      dt: stage timestep (static float)
      bih: optional [E, q, k, 4, 4] hyperviscosity tendency (stage 2)

    With transposed=True the field operands are already in kernel layout
    ([E,16,qk] / vn0 as (u,v) tuple of [E,16,k] / dp,divdp [E,16,k] /
    bounds [E,1,qk]) and the output stays in it — the T-layout pipeline
    (euler_step_t) avoids all per-stage relayouts.  `nq` is required then.

    Hyperviscosity: bih_mode=1 adds `bih` as a precomputed tendency;
    bih_mode=2 treats `bih` as the DSS'd FIRST Laplacian and computes the
    second Laplacian in-kernel (tendency = nu_coef*dp0(k)*lap2/spheremp),
    saving the separate lap2 kernel round trip.  `dp0` [nlev] required for
    mode 2 (transposed path only).

    max_iter caps the limiter iteration count (0 = MAX_ITER, the
    reference's np*np-1).  Any cap is mass-preserving — every loop exit
    path redistributes the clip residual — at the cost of a small bound
    overshoot on columns that have not converged (audited by
    scripts/audit_limcap.py; converged columns are bitwise unaffected).

    Returns (spheremp*Qtens_limited, qmin', qmax') — feed the first output
    to dss_sum then rspheremp (the pack/exchange/unpack).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    max_iter = max_iter or MAX_ITER
    if transposed:
        E = Qdp.shape[0]
        qk = Qdp.shape[2]            # lane width; may be 128-padded
        nk = dp.shape[-1]
    else:
        E, nq, nk = Qdp.shape[:3]
        qk = nq * nk
    f = Qdp.dtype
    deriv_np = np.asarray(model_arrays["deriv"])
    cx, cy = _roll_coeffs(deriv_np, transpose=False)
    cxt, cyt = _roll_coeffs(deriv_np, transpose=True)
    L = Qdp.shape[-1] if transposed else qk
    if dp0 is not None:
        reps = -(-L // nk)
        dp0lane = jnp.tile(jnp.asarray(dp0, f), reps)[:L].reshape(1, L)
    else:
        dp0lane = jnp.zeros((1, L), f)

    Dinv = model_arrays["Dinv"]        # [E, 4, 4, 2, 2]
    flat = lambda a: a.reshape(E, 1, N2)
    s00, s01, s11 = _smet(Dinv[..., 0, 0], Dinv[..., 0, 1],
                          Dinv[..., 1, 0], Dinv[..., 1, 1],
                          model_arrays["spheremp"])
    met_pack = jnp.concatenate(
        [flat(Dinv[..., 0, 0]), flat(Dinv[..., 0, 1]),
         flat(Dinv[..., 1, 0]), flat(Dinv[..., 1, 1]),
         flat(model_arrays["metdet"]), flat(model_arrays["rmetdet"]),
         flat(model_arrays["spheremp"]),
         flat(s00), flat(s01), flat(s11)], axis=1)      # [E, 10, 16]

    # operand layout: point axis in sublanes, (q*k) in lanes — keeps the
    # minor HBM dim a near-multiple of 128 (a [.., qk, 16] layout would be
    # lane-padded 16 -> 128, an 8x memory and bandwidth blow-up)
    has_bih = bih is not None
    if bih_mode is None:
        bih_mode = 1 if has_bih else 0
    if transposed:
        qdp_r = Qdp
        u_r, v_r = vn0
        dp_r = dp
        divdp_r = divdp
        qmin_r = qmin.reshape(E, -1)
        qmax_r = qmax.reshape(E, -1)
        bih_r = bih if has_bih else jnp.zeros((E, N2, 1), f)
    else:
        tp = lambda a, inner: jnp.moveaxis(a.reshape(E, inner, N2), -1, 1)
        qdp_r = tp(Qdp, qk)            # [E, 16, qk]
        u_r = tp(vn0[:, :, 0], nk)     # [E, 16, k]
        v_r = tp(vn0[:, :, 1], nk)
        dp_r = tp(dp, nk)
        divdp_r = tp(divdp, nk)
        qmin_r = qmin.reshape(E, qk)
        qmax_r = qmax.reshape(E, qk)
        bih_r = tp(bih, qk) if has_bih else jnp.zeros((E, N2, 1), f)

    # Mosaic block rule: the 2D bound blocks (eb, L) need eb divisible by
    # 8 or equal to E.  When E is not a multiple of 8 (sharded runs —
    # e.g. NE30 on 8 shards has eloc=675), pad the element axis instead
    # of collapsing to eb=E (whose [E,16,L] block would blow VMEM): the
    # pad elements carry spheremp=0 -> sumc=0 -> validf=0, the limiter
    # treats them as converged, and they are sliced off on return.
    E_orig = E
    if E % 8:
        Ep = -(-E // 8) * 8
        padE = lambda a: jnp.pad(a, ((0, Ep - E),) + ((0, 0),) * (a.ndim - 1))
        qdp_r, u_r, v_r, divdp_r, met_pack, qmin_r, qmax_r, bih_r = map(
            padE, (qdp_r, u_r, v_r, divdp_r, met_pack, qmin_r, qmax_r,
                   bih_r))
        # dp pads with 1 (it is divided by before the validity blend)
        dp_r = jnp.concatenate(
            [dp_r, jnp.ones((Ep - E,) + dp_r.shape[1:], f)], axis=0)
        E = Ep
    if eb % 8 or E % eb:
        eb = 8 if E % 8 == 0 else E
    be = lambda s2: pl.BlockSpec((eb, N2, s2), lambda e: (e, 0, 0),
                                 memory_space=pltpu.VMEM)
    brow = pl.BlockSpec((eb, qk), lambda e: (e, 0),
                        memory_space=pltpu.VMEM)
    bmet = pl.BlockSpec((eb, 10, N2), lambda e: (e, 0, 0),
                        memory_space=pltpu.VMEM)
    bcoef = lambda w: pl.BlockSpec((N2, w), lambda e: (0, 0),
                                   memory_space=pltpu.VMEM)
    blane = pl.BlockSpec((1, qk), lambda e: (0, 0),
                         memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    out_specs = (be(qk), brow, brow)
    out_shape = (jax.ShapeDtypeStruct((E, N2, qk), f),
                 jax.ShapeDtypeStruct((E, qk), f),
                 jax.ShapeDtypeStruct((E, qk), f))
    if KERNEL_VERSION == 3 and (eb * N2) % 128 == 0:
        prec = (jax.lax.Precision.DEFAULT if rhs_bf16
                else MXU_PRECISION)
        kernel = functools.partial(_euler_kernel3, nq, dt, rhs_viss,
                                   bih_mode, float(nu_coef), prec,
                                   max_iter)
        out, qmin_o, qmax_o = pl.pallas_call(
            kernel,
            grid=(E // eb,),
            in_specs=[be(qk), be(nk), be(nk), be(nk), be(nk), bmet,
                      brow, brow,
                      pl.BlockSpec((2 * eb * N2, eb * N2),
                                   lambda e: (0, 0),
                                   memory_space=pltpu.VMEM),
                      bcoef(4), bcoef(4), bcoef(4), bcoef(4), bcoef(4),
                      bcoef(4), blane, be(qk if has_bih else 1)],
            out_specs=out_specs, out_shape=out_shape,
            compiler_params=cp, interpret=interpret,
        )(qdp_r, u_r, v_r, dp_r, divdp_r, met_pack, qmin_r, qmax_r,
          jnp.asarray(_mxu_weights(deriv_np, eb * N2), f),
          jnp.asarray(cx, f), jnp.asarray(cy, f),
          jnp.asarray(_ddy_mask_mat(), f),
          jnp.asarray(cxt, f), jnp.asarray(cyt, f),
          jnp.asarray(_dmat_np(deriv_np), f), dp0lane, bih_r)
    elif KERNEL_VERSION == 2:
        kernel = functools.partial(_euler_kernel2, nq, dt, rhs_viss,
                                   bih_mode, float(nu_coef), max_iter)
        out, qmin_o, qmax_o = pl.pallas_call(
            kernel,
            grid=(E // eb,),
            in_specs=[be(qk), be(nk), be(nk), be(nk), be(nk), bmet,
                      brow, brow, bcoef(4), blane,
                      be(qk if has_bih else 1)],
            out_specs=out_specs, out_shape=out_shape,
            compiler_params=cp, interpret=interpret,
        )(qdp_r, u_r, v_r, dp_r, divdp_r, met_pack, qmin_r, qmax_r,
          jnp.asarray(np.concatenate(
              [deriv_np, deriv_np.T, np.zeros((8, 4))]), f),
          dp0lane, bih_r)
    else:
        kernel = functools.partial(_euler_kernel, nq, dt, rhs_viss,
                                   bih_mode, float(nu_coef), max_iter)
        out, qmin_o, qmax_o = pl.pallas_call(
            kernel,
            grid=(E // eb,),
            in_specs=[be(qk), be(nk), be(nk), be(nk), be(nk), bmet,
                      brow, brow, bcoef(4), bcoef(4), bcoef(4),
                      bcoef(4), bcoef(4), blane,
                      be(qk if has_bih else 1)],
            out_specs=out_specs, out_shape=out_shape,
            # eb=8 with the bih operand slightly exceeds the 16M default
            # scoped-vmem cap; the chip has headroom
            compiler_params=cp, interpret=interpret,
        )(qdp_r, u_r, v_r, dp_r, divdp_r, met_pack, qmin_r, qmax_r,
          jnp.asarray(cx, f), jnp.asarray(cy, f),
          jnp.asarray(_ddy_mask_mat(), f),
          jnp.asarray(cxt, f), jnp.asarray(cyt, f), dp0lane, bih_r)

    if E != E_orig:
        out = out[:E_orig]
        qmin_o = qmin_o[:E_orig]
        qmax_o = qmax_o[:E_orig]
    if transposed:
        return out, qmin_o, qmax_o
    out = jnp.moveaxis(out, 1, -1).reshape(Qdp.shape)
    return (out, qmin_o.reshape(E_orig, nq, nk),
            qmax_o.reshape(E_orig, nq, nk))
