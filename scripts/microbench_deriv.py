"""Microbench: spectral-derivative formulations for the fused euler kernel.

Compares, on the real chip, the production VPU roll path against an MXU
block-diagonal formulation: with eb = 8 elements per grid step the
[eb, 16, L] operand reshapes to [128, L], and both point-axis derivative
contractions become one 128-contraction matmul with a block-diagonal
weight (8 copies of D (x) I4 for d/dx, I4 (x) D for d/dy) — full MXU
lane/sublane utilization even though each 16x16 block is tiny.

Run with the box otherwise idle (one JAX process at a time).
"""
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transport_se_tpu.ops.pallas_euler import (
    _roll_coeffs, _ddy_mask_mat, _ddx_rolls, _ddy_rolls, _ddxy_bcast)
from transport_se_tpu.grid.quadrature import gll_derivative_matrix

E = 5400
L = 2520
EB = 8
N2 = 16

deriv = np.asarray(gll_derivative_matrix(4), np.float64)


def blockdiag_weights(d):
    """Wx = blockdiag_8(D (x) I4), Wy = blockdiag_8(I4 (x) D) as [128,128]."""
    mx = np.kron(d, np.eye(4))          # out[l*4+j] = sum_i d[l,i] x[i*4+j]
    my = np.kron(np.eye(4), d)          # out[i*4+l] = sum_s d[l,s] x[i*4+s]
    wx = np.zeros((128, 128))
    wy = np.zeros((128, 128))
    for b in range(8):
        wx[b*16:(b+1)*16, b*16:(b+1)*16] = mx
        wy[b*16:(b+1)*16, b*16:(b+1)*16] = my
    return wx, wy


def _roll_kernel(c1_ref, c2_ref, cx_ref, cy_ref, mask_ref, out_ref):
    out_ref[...] = (_ddx_rolls(c1_ref[...], cx_ref[:])
                    + _ddy_rolls(c2_ref[...], cy_ref[:], mask_ref[:]))


def _bcast_kernel(dmat_ref, c1_ref, c2_ref, out_ref):
    out_ref[...] = _ddxy_bcast(c1_ref[...], c2_ref[...], dmat_ref[:])


def _mxu_kernel(prec, c1_ref, c2_ref, wx_ref, wy_ref, out_ref):
    c1 = c1_ref[...].reshape(EB * N2, L)
    c2 = c2_ref[...].reshape(EB * N2, L)
    dn = (((1,), (0,)), ((), ()))
    o = (jax.lax.dot_general(wx_ref[...], c1, dn, precision=prec,
                             preferred_element_type=jnp.float32)
         + jax.lax.dot_general(wy_ref[...], c2, dn, precision=prec,
                               preferred_element_type=jnp.float32))
    out_ref[...] = o.reshape(EB, N2, L)


def run(name, fn, args, n=10):
    """Chained timing: each iteration's first operand is the previous
    output, so the device must execute every launch (defeats any
    dispatch-side dedup/pipelining of identical calls — unchained timing
    through the axon tunnel reports impossible sub-bandwidth numbers)."""
    f = jax.jit(fn)
    a, rest = args[0], args[1:]
    o = f(a, *rest); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(o, *rest)
    jax.block_until_ready(o)
    print(f"{name:<28} {(time.perf_counter()-t0)/n*1e3:9.3f} ms", flush=True)
    return f(a, *rest)


def main():
    f = jnp.float32
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    c1 = jax.random.normal(k1, (E, N2, L), f)
    c2 = jax.random.normal(k2, (E, N2, L), f)
    cx, cy = _roll_coeffs(deriv, transpose=False)
    wx, wy = blockdiag_weights(deriv)

    be = pl.BlockSpec((EB, N2, L), lambda e: (e, 0, 0),
                      memory_space=pltpu.VMEM)
    bc = lambda r, c: pl.BlockSpec((r, c), lambda e: (0, 0),
                                   memory_space=pltpu.VMEM)
    interp = jax.default_backend() == "cpu"
    shp = jax.ShapeDtypeStruct((E, N2, L), f)

    roll = lambda a, b: pl.pallas_call(
        _roll_kernel, grid=(E // EB,),
        in_specs=[be, be, bc(N2, 4), bc(N2, 4), bc(N2, 4)],
        out_specs=be, out_shape=shp, interpret=interp,
    )(a, b, jnp.asarray(cx, f), jnp.asarray(cy, f),
      jnp.asarray(_ddy_mask_mat(), f))

    bcast = lambda a, b: pl.pallas_call(
        _bcast_kernel, grid=(E // EB,),
        in_specs=[bc(4, 4), be, be],
        out_specs=be, out_shape=shp, interpret=interp,
    )(jnp.asarray(deriv, f), a, b)

    def mxu(prec):
        return lambda a, b: pl.pallas_call(
            functools.partial(_mxu_kernel, prec), grid=(E // EB,),
            in_specs=[be, be, bc(128, 128), bc(128, 128)],
            out_specs=be, out_shape=shp, interpret=interp,
        )(a, b, jnp.asarray(wx, f), jnp.asarray(wy, f))

    o_roll = run("rolls (production)", roll, (c1, c2))
    o_b = run("bcast (v2)", bcast, (c1, c2))
    o_hi = run("mxu blockdiag HIGHEST", mxu(jax.lax.Precision.HIGHEST),
               (c1, c2))
    o_def = run("mxu blockdiag DEFAULT", mxu(jax.lax.Precision.DEFAULT),
                (c1, c2))

    # error check on a slice (full-array pulls through the tunnel crawl)
    ref = np.asarray(o_roll[:64], np.float64)
    scale = np.abs(ref).max()
    for nm, o in [("bcast", o_b), ("mxu HIGHEST", o_hi),
                  ("mxu DEFAULT", o_def)]:
        err = np.abs(np.asarray(o[:64], np.float64) - ref).max() / scale
        print(f"  max rel err {nm:<14} {err:.3e}")


if __name__ == "__main__":
    main()
