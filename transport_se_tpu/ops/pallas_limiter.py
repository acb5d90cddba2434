"""Pallas TPU kernel for the optimization limiter (HOMME limiter 8).

Same math as ops/limiter.py `limiter_optim_iter_full` (reference:
prim_advection_mod.F90:976-1094), restructured for the TPU memory system:
the XLA while_loop version streams the full [N, 16] problem from HBM once
per iteration — and the loop's global convergence test makes it run close
to all 15 iterations whenever any one of the ~1e7 rows is slow to converge.
This kernel loads a [16, LANE_BLOCK] tile into VMEM once, runs all
iterations register/VMEM-resident, and writes the result once: ~2 HBM
passes instead of ~45.

Layout: the point axis (np*np = 16) lives in sublanes, the batch axis
(E*q*k) in lanes — reductions over the 16 points are cheap sublane
reductions and every lane is an independent limiter problem (the
CUDA port makes the same choice: one thread per point, one block per
element, cuda_mod.F90:863-913).

Iteration count: fixed 15 (np*np-1, the reference's maxiter).  Each lane
carries its own converged flag; converged lanes hold their value (the
reference's per-problem early exit), so the extra iterations only cost
VPU cycles that are fully hidden behind the memory traffic of neighboring
blocks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TOL_LIMITER = 5e-14
MAX_ITER = 15
N2 = 16          # np*np
LANE_BLOCK = 2048


def _limiter_kernel(x_ref, c_ref, minp_ref, maxp_ref,
                    out_ref, minp_out_ref, maxp_out_ref):
    # Blocks arrive in the natural [L, 16] row layout; transpose to
    # [16, L] in VMEM (vreg shuffles — far cheaper than an XLA global
    # transpose through HBM) so the 16 GLL points sit in sublanes and
    # every lane is an independent limiter problem.
    # Masks are carried as f32 0/1 — Mosaic cannot carry or relayout i1
    # vectors across loop iterations ("Unsupported target bitwidth").
    x = x_ref[:].T                    # [16, L] mixing ratios
    c = c_ref[:].T                    # [16, L] weights (spheremp*dp)
    minp = minp_ref[:]                # [1, L]
    maxp = maxp_ref[:]                # [1, L]
    one = jnp.float32(1.0) if x.dtype == jnp.float32 else jnp.float64(1.0)

    sumc = jnp.sum(c, axis=0, keepdims=True)          # [1, L]
    mass = jnp.sum(c * x, axis=0, keepdims=True)

    validf = (sumc > 0).astype(x.dtype)
    safe_sumc = jnp.where(sumc > 0, sumc, one)
    # feasibility relaxation (prim_advection_mod.F90:1024-1029)
    minp = jnp.where(mass < minp * safe_sumc, mass / safe_sumc, minp)
    maxp = jnp.where(mass > maxp * safe_sumc, mass / safe_sumc, maxp)
    minp_out_ref[:] = minp
    maxp_out_ref[:] = maxp

    tol = TOL_LIMITER * jnp.abs(mass)

    def body(state):
        it, x, done = state           # done: f32 [1, L], 1.0 == frozen
        over = x > maxp
        under = x < minp
        addmass = jnp.sum(jnp.where(over, (x - maxp) * c, 0.0)
                          + jnp.where(under, (x - minp) * c, 0.0),
                          axis=0, keepdims=True)
        xcl = jnp.clip(x, minp, maxp)
        conv = (jnp.abs(addmass) <= tol).astype(x.dtype)

        pos = (addmass > 0).astype(x.dtype)
        free = (pos * (xcl < maxp).astype(x.dtype)
                + (one - pos) * (xcl > minp).astype(x.dtype))
        wsum = jnp.sum(free * c, axis=0, keepdims=True)
        add = jnp.where(wsum > 0,
                        addmass / jnp.where(wsum > 0, wsum, one), 0.0)
        xred = xcl + free * add

        x_new = conv * xcl + (one - conv) * xred
        x_next = done * x + (one - done) * x_new
        return it + 1, x_next, jnp.maximum(done, conv)

    def cond(state):
        # block-level early exit: typical problems converge in 1-3
        # iterations (the reference's per-column exit, :1040-1045)
        it, _, done = state
        return (it < MAX_ITER) & (jnp.min(done) < 0.5)

    _, x, _ = jax.lax.while_loop(cond, body, (0, x, one - validf))
    out_ref[:] = (validf * x + (one - validf) * x_ref[:].T).T


@partial(jax.jit, static_argnames=("interpret",))
def limiter_optim_pallas(x, c, minp, maxp, interpret=False):
    """Limiter on row layout: x, c are [N, 16]; minp/maxp [1, N].

    N must be a multiple of LANE_BLOCK (callers pad).  Returns
    (x_limited [N, 16], minp' [1, N], maxp' [1, N]).
    """
    n = x.shape[0]
    grid = (n // LANE_BLOCK,)
    bs_x = pl.BlockSpec((LANE_BLOCK, N2), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bs_s = pl.BlockSpec((1, LANE_BLOCK), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _limiter_kernel,
        grid=grid,
        in_specs=[bs_x, bs_x, bs_s, bs_s],
        out_specs=(bs_x, bs_s, bs_s),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(minp.shape, minp.dtype),
                   jax.ShapeDtypeStruct(maxp.shape, maxp.dtype)),
        interpret=interpret,
    )(x, c, minp, maxp)


def limiter_optim_iter_full_pallas(ptens, sphweights, minp, maxp, dpmass,
                                   interpret=None):
    """Drop-in replacement for ops.limiter.limiter_optim_iter_full.

    ptens/sphweights/dpmass: [..., 16]; minp/maxp: [...].
    Blocks stream in the natural row layout (no global transpose); the
    in-VMEM transpose happens inside the kernel.  On a CPU backend the
    kernel runs in interpret mode (slow but correct), so `use_pallas`
    configs stay testable off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    batch_shape = ptens.shape[:-1]
    n = 1
    for s in batch_shape:
        n *= s
    pad = (-n) % LANE_BLOCK

    x = (ptens / dpmass).reshape(n, N2)
    c = (sphweights * dpmass).reshape(n, N2)
    mn = minp.reshape(1, n)
    mx = maxp.reshape(1, n)
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        c = jnp.pad(c, ((0, pad), (0, 0)), constant_values=1.0)
        mn = jnp.pad(mn, ((0, 0), (0, pad)))
        mx = jnp.pad(mx, ((0, 0), (0, pad)), constant_values=1.0)

    xo, mn_o, mx_o = limiter_optim_pallas(x, c, mn, mx,
                                          interpret=interpret)
    if pad:
        xo, mn_o, mx_o = xo[:n], mn_o[:, :n], mx_o[:, :n]
    out = (xo * dpmass.reshape(n, N2)).reshape(ptens.shape)
    return out, mn_o.reshape(batch_shape), mx_o.reshape(batch_shape)
