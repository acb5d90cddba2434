"""Fused Pallas kernel for the euler_step hot loop: advection RHS + limiter.

This is the TPU counterpart of the reference's own accelerator fusion
(reference: cuda_mod.F90:767-832 `euler_step_kernel1` computes the advection
RHS on device, :863-913 the limiter kernel, :917-928 the rspheremp scale —
dispatched from prim_advection_mod.F90:715-718).  One kernel invocation per
element computes, entirely VMEM-resident:

    Vstar   = vn0 / dp                                (euler_step :845-852)
    gradQ   = Vstar * Qdp
    Qtens   = Qdp - dt * divergence_sphere(gradQ)     (:873-876)
            (+ precomputed hyperviscosity tendency on stage 2, :878)
    limited = limiter_optim_iter_full(Qtens/dp_star)  (:886, :976-1094)
    out     = spheremp * limited                      (:901)

leaving only the DSS (cross-element) and the neighbor min/max outside.  The
XLA pipeline needs ~10 HBM round trips of the [E,q,k,16] field for the same
stage; this kernel needs 2 (read Qdp, write out).

Layouts: the grid is the element axis.  Per element, tracer x level (q*k)
lies in lanes and the 16 GLL points in sublanes; blocks stream in the
natural [qk, 16] row layout and are transposed in VMEM.  The spectral
derivative acts on the point axis as two constant 16x16 matrices
(DX = d/dx ⊗ I, DY = I ⊗ d/dy), i.e. batched [16,16]x[16,qk] matmuls.
Per-element metric factors ([16] vectors) broadcast along lanes; per-level
fields ([k,16]) broadcast over tracers with an in-VMEM tile repeat.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import RREARTH

TOL_LIMITER = 5e-14
MAX_ITER = 15
N2 = 16


def derivative_matrices(deriv: np.ndarray):
    """DX, DY [16,16] acting on the flattened (i*4+j) point axis.

    DX[(l,j),(i,j)] = deriv[l,i]; DY[(i,l),(i,j)] = deriv[l,j]
    (the dense Dvv contractions of derivative_mod.F90:2364-2414).
    """
    n = deriv.shape[0]
    DX = np.zeros((n * n, n * n))
    DY = np.zeros((n * n, n * n))
    for l in range(n):
        for i in range(n):
            for j in range(n):
                DX[l * n + j, i * n + j] = deriv[l, i]
                DY[i * n + l, i * n + j] = deriv[l, j]
    return DX, DY


def _repeat_lanes(x, q):
    """[16, k] -> [16, q*k] tiling along lanes (tracer broadcast)."""
    if q == 1:
        return x
    return pltpu.repeat(x, q, axis=1)


def _euler_kernel(nq, dt, rhs_viss, has_bih,
                  qdp_ref, u_ref, v_ref, dp_ref, divdp_ref,
                  d00_ref, d01_ref, d10_ref, d11_ref,
                  metdet_ref, rmetdet_ref, spheremp_ref,
                  qmin_ref, qmax_ref, dx_ref, dy_ref, bih_ref,
                  out_ref, qmin_out_ref, qmax_out_ref):
    f = qdp_ref.dtype
    one = jnp.asarray(1.0, f)

    qdp = qdp_ref[0]                   # [16, qk] (point-major layout)
    dp = _repeat_lanes(dp_ref[0], nq)            # [16, qk]
    divdp = _repeat_lanes(divdp_ref[0], nq)
    u = _repeat_lanes(u_ref[0], nq) / dp         # Vstar zonal
    v = _repeat_lanes(v_ref[0], nq) / dp         # Vstar meridional

    d00 = d00_ref[0].T                 # [16, 1]
    d01 = d01_ref[0].T
    d10 = d10_ref[0].T
    d11 = d11_ref[0].T
    metdet = metdet_ref[0].T
    rmetdet = rmetdet_ref[0].T
    spheremp = spheremp_ref[0].T

    gu = u * qdp                       # gradQ components
    gv = v * qdp
    c1 = (d00 * gu + d01 * gv) * metdet
    c2 = (d10 * gu + d11 * gv) * metdet
    DX = dx_ref[:]
    DY = dy_ref[:]
    div = (jnp.dot(DX, c1, preferred_element_type=f)
           + jnp.dot(DY, c2, preferred_element_type=f)) \
        * rmetdet * jnp.asarray(RREARTH, f)

    qtens = qdp - jnp.asarray(dt, f) * div
    if has_bih:
        qtens = qtens + bih_ref[0]

    # ---- limiter 8 on Q = qtens/dp_star (prim_advection_mod.F90:976) ----
    dp_star = dp - jnp.asarray(dt, f) * divdp
    c = spheremp * dp_star             # [16, qk]
    x = qtens / dp_star
    minp = qmin_ref[0]                 # [1, qk]
    maxp = qmax_ref[0]

    sumc = jnp.sum(c, axis=0, keepdims=True)
    mass = jnp.sum(c * x, axis=0, keepdims=True)
    validf = (sumc > 0).astype(f)
    safe_sumc = jnp.where(sumc > 0, sumc, one)
    minp = jnp.where(mass < minp * safe_sumc, mass / safe_sumc, minp)
    maxp = jnp.where(mass > maxp * safe_sumc, mass / safe_sumc, maxp)
    qmin_out_ref[0] = minp
    qmax_out_ref[0] = maxp
    tol = TOL_LIMITER * jnp.abs(mass)

    def body(state):
        it, x, done = state
        over = x > maxp
        under = x < minp
        addmass = jnp.sum(jnp.where(over, (x - maxp) * c, 0.0)
                          + jnp.where(under, (x - minp) * c, 0.0),
                          axis=0, keepdims=True)
        xcl = jnp.clip(x, minp, maxp)
        conv = (jnp.abs(addmass) <= tol).astype(f)
        pos = (addmass > 0).astype(f)
        free = (pos * (xcl < maxp).astype(f)
                + (one - pos) * (xcl > minp).astype(f))
        wsum = jnp.sum(free * c, axis=0, keepdims=True)
        add = jnp.where(wsum > 0,
                        addmass / jnp.where(wsum > 0, wsum, one), 0.0)
        xred = xcl + free * add
        x_new = conv * xcl + (one - conv) * xred
        return it + 1, done * x + (one - done) * x_new, \
            jnp.maximum(done, conv)

    def cond(state):
        it, _, done = state
        return (it < MAX_ITER) & (jnp.min(done) < 0.5)

    _, x, _ = jax.lax.while_loop(cond, body, (0, x, one - validf))
    limited = validf * (x * dp_star) + (one - validf) * qtens
    out_ref[0] = spheremp * limited


def fused_advect_limit(Qdp, vn0, dp, divdp, qmin, qmax, model_arrays,
                       dt, rhs_viss=0, bih=None, interpret=None):
    """Fused advection RHS + limiter over all elements.

    Args:
      Qdp:    [E, q, k, 4, 4] tracer mass at stage start
      vn0:    [E, k, 2, 4, 4] mean-flux velocity*dp
      dp:     [E, k, 4, 4]    stage layer thickness
      divdp:  [E, k, 4, 4]    un-projected div(vn0)
      qmin/qmax: [E, q, k]    limiter bounds (post neighbor-minmax)
      model_arrays: dict with Dinv, metdet, rmetdet, spheremp, deriv
      dt: stage timestep (static float)
      bih: optional [E, q, k, 4, 4] hyperviscosity tendency (stage 2)

    Returns (spheremp*Qtens_limited [E,q,k,4,4], qmin', qmax') — feed the
    first output to dss_sum then rspheremp (the pack/exchange/unpack).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    E, nq, nk = Qdp.shape[:3]
    qk = nq * nk
    f = Qdp.dtype
    if "DX" in model_arrays:
        DX = jnp.asarray(model_arrays["DX"], f)
        DY = jnp.asarray(model_arrays["DY"], f)
    else:
        # deriv must be a concrete (host) array here — precompute DX/DY
        # before tracing when calling under jit
        DXn, DYn = derivative_matrices(np.asarray(model_arrays["deriv"]))
        DX = jnp.asarray(DXn, f)
        DY = jnp.asarray(DYn, f)

    Dinv = model_arrays["Dinv"]        # [E, 4, 4, 2, 2]
    flat = lambda a: a.reshape(E, 1, N2)
    d00 = flat(Dinv[..., 0, 0])
    d01 = flat(Dinv[..., 0, 1])
    d10 = flat(Dinv[..., 1, 0])
    d11 = flat(Dinv[..., 1, 1])
    metdet = flat(model_arrays["metdet"])
    rmetdet = flat(model_arrays["rmetdet"])
    spheremp = flat(model_arrays["spheremp"])

    # operand layout: point axis in sublanes, (q*k) in lanes — keeps the
    # minor HBM dim a near-multiple of 128 (a [.., qk, 16] layout would be
    # lane-padded 16 -> 128, an 8x memory and bandwidth blow-up)
    tp = lambda a, inner: jnp.moveaxis(a.reshape(E, inner, N2), -1, 1)
    qdp_r = tp(Qdp, qk)                # [E, 16, qk]
    u_r = tp(vn0[:, :, 0], nk)         # [E, 16, k]
    v_r = tp(vn0[:, :, 1], nk)
    dp_r = tp(dp, nk)
    divdp_r = tp(divdp, nk)
    qmin_r = qmin.reshape(E, 1, qk)
    qmax_r = qmax.reshape(E, 1, qk)
    has_bih = bih is not None
    bih_r = tp(bih, qk) if has_bih else jnp.zeros((E, N2, 1), f)

    be = lambda s2: pl.BlockSpec((1, N2, s2), lambda e: (e, 0, 0),
                                 memory_space=pltpu.VMEM)
    brow = pl.BlockSpec((1, 1, qk), lambda e: (e, 0, 0),
                        memory_space=pltpu.VMEM)
    bmet = pl.BlockSpec((1, 1, N2), lambda e: (e, 0, 0),
                        memory_space=pltpu.VMEM)
    bmat = pl.BlockSpec((N2, N2), lambda e: (0, 0),
                        memory_space=pltpu.VMEM)

    kernel = functools.partial(_euler_kernel, nq, dt, rhs_viss, has_bih)
    out, qmin_o, qmax_o = pl.pallas_call(
        kernel,
        grid=(E,),
        in_specs=[be(qk), be(nk), be(nk), be(nk), be(nk),
                  bmet, bmet, bmet, bmet, bmet, bmet, bmet,
                  brow, brow, bmat, bmat,
                  be(qk if has_bih else 1)],
        out_specs=(be(qk), brow, brow),
        out_shape=(jax.ShapeDtypeStruct((E, N2, qk), f),
                   jax.ShapeDtypeStruct((E, 1, qk), f),
                   jax.ShapeDtypeStruct((E, 1, qk), f)),
        interpret=interpret,
    )(qdp_r, u_r, v_r, dp_r, divdp_r, d00, d01, d10, d11,
      metdet, rmetdet, spheremp, qmin_r, qmax_r, DX, DY, bih_r)

    out = jnp.moveaxis(out, 1, -1).reshape(Qdp.shape)
    return (out, qmin_o.reshape(E, nq, nk), qmax_o.reshape(E, nq, nk))
