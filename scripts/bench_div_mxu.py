"""Microbenchmark: point-axis spectral divergence inside the fused kernel —
VPU sublane rolls (current) vs one stacked MXU contraction.

The divergence is div = Mx @ c1 + My @ c2 over the 16-point axis; as a
single [16,32] x [32,L] matmul the MXU does it in one pass (utilization is
low but the arithmetic leaves the VPU entirely).  Run on the real chip.
"""
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from transport_se_tpu.ops.pallas_euler import (_roll_coeffs, _ddy_mask_mat,
                                               _ddx_rolls, _ddy_rolls)

E, L = 5400, 2560
eb = 8
f = jnp.float32

def deriv_mats(d):
    """Dense [16,16] ddx / ddy point-axis matrices (deriv[l,i]=ell_i'(x_l));
    matches the roll-coefficient convention in ops/pallas_euler.py."""
    Mx = np.zeros((16, 16)); My = np.zeros((16, 16))
    for l in range(4):
        for j in range(4):
            for i in range(4):
                Mx[l*4+j, i*4+j] = d[l, i]     # contract i (stride-4 groups)
                My[j*4+l, j*4+i] = d[l, i]     # contract j (within groups)
    return Mx, My

def kernel_rolls(x1_ref, x2_ref, cx_ref, cy_ref, mask_ref, out_ref):
    out_ref[...] = (_ddx_rolls(x1_ref[...], cx_ref[:])
                    + _ddy_rolls(x2_ref[...], cy_ref[:], mask_ref[:]))

def kernel_bcast(x1_ref, x2_ref, d_ref, out_ref):
    """ddx/ddy as sublane-broadcast sums on [eb, 4, 4, L] views.

    ddx: out[:, l, j] = sum_i d[l, i] * X1[:, i, j]  — broadcast X1[:, i]
    over the output group axis l, coefficient d[:, i] along l.
    ddy: out[:, i, l] = sum_s d[l, s] * X2[:, i, s].
    """
    eb_, _, L_ = x1_ref.shape
    x1 = x1_ref[...].reshape(eb_, 4, 4, L_)
    x2 = x2_ref[...].reshape(eb_, 4, 4, L_)
    d = d_ref[:]                       # [4, 4]  d[l, i]
    out = None
    for s in range(4):
        cl = d[:, s].reshape(1, 4, 1, 1)     # d[l, s] along l
        tx = cl * x1[:, s:s+1, :, :]
        ty = cl.reshape(1, 1, 4, 1) * x2[:, :, s:s+1, :]
        t = tx + ty
        out = t if out is None else out + t
    out_ref[...] = out.reshape(eb_, 16, L_)


def kernel_mxu(x1_ref, x2_ref, B_ref, out_ref):
    x = jnp.concatenate([x1_ref[...], x2_ref[...]], axis=1)   # [eb,32,L]
    out_ref[...] = jax.lax.dot_general(
        B_ref[...], x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).transpose(1, 0, 2)

def bench(name, fn, *args, n=20):
    g = jax.jit(fn)
    o = g(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n): o = g(*args)
    jax.block_until_ready(o)
    print(f"{name:<28} {(time.perf_counter()-t0)/n*1e3:8.3f} ms", flush=True)

def main():
    from transport_se_tpu.grid.quadrature import gll_derivative_matrix
    d = np.asarray(gll_derivative_matrix(4))
    cx, cy = _roll_coeffs(d, transpose=False)
    Mx, My = deriv_mats(d)
    B = np.concatenate([Mx, My], axis=1)      # [16, 32]
    # verify equivalence on random data
    rng = np.random.default_rng(0)
    x1 = rng.standard_normal((2, 16, 64)).astype(np.float32)
    x2 = rng.standard_normal((2, 16, 64)).astype(np.float32)
    ref = np.einsum('ps,bsl->bpl', Mx, x1) + np.einsum('ps,bsl->bpl', My, x2)
    got = np.einsum('ps,bsl->bpl', B, np.concatenate([x1, x2], axis=1))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    print("math equivalence OK")

    X1 = jnp.asarray(rng.standard_normal((E, 16, L)), f)
    X2 = jnp.asarray(rng.standard_normal((E, 16, L)), f)
    be = pl.BlockSpec((eb, 16, L), lambda e: (e, 0, 0), memory_space=pltpu.VMEM)
    bc = lambda s, w: pl.BlockSpec((s, w), lambda e: (0, 0), memory_space=pltpu.VMEM)

    rolls = lambda a, b: pl.pallas_call(
        kernel_rolls, grid=(E // eb,),
        in_specs=[be, be, bc(16, 4), bc(16, 4), bc(16, 4)],
        out_specs=be, out_shape=jax.ShapeDtypeStruct((E, 16, L), f),
    )(a, b, jnp.asarray(cx, f), jnp.asarray(cy, f),
      jnp.asarray(_ddy_mask_mat(), f))

    mxu = lambda a, b: pl.pallas_call(
        kernel_mxu, grid=(E // eb,),
        in_specs=[be, be, bc(16, 32)],
        out_specs=be, out_shape=jax.ShapeDtypeStruct((E, 16, L), f),
    )(a, b, jnp.asarray(B, f))

    bcast = lambda a, b: pl.pallas_call(
        kernel_bcast, grid=(E // eb,),
        in_specs=[be, be, bc(4, 4)],
        out_specs=be, out_shape=jax.ShapeDtypeStruct((E, 16, L), f),
    )(a, b, jnp.asarray(d, f))

    r1 = jax.jit(rolls)(X1, X2); r2 = jax.jit(mxu)(X1, X2)
    r3 = jax.jit(bcast)(X1, X2)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r3), rtol=2e-4, atol=2e-4)
    print("kernel equivalence OK")
    bench("divergence rolls", rolls, X1, X2)
    bench("divergence mxu", mxu, X1, X2)
    bench("divergence bcast", bcast, X1, X2)

    # sublane-16 sum: jnp.sum vs reshape tree
    def kernel_sum_jnp(x1_ref, out_ref):
        out_ref[...] = jnp.sum(x1_ref[...], axis=1, keepdims=True)
    def kernel_sum_tree(x1_ref, out_ref):
        x = x1_ref[...].reshape(x1_ref.shape[0], 4, 4, x1_ref.shape[2])
        s = ((x[:, 0] + x[:, 1]) + (x[:, 2] + x[:, 3]))     # [eb, 4, L]
        out_ref[...] = (s[:, 0:1] + s[:, 1:2]) + (s[:, 2:3] + s[:, 3:4])
    bs = pl.BlockSpec((eb, 1, L), lambda e: (e, 0, 0), memory_space=pltpu.VMEM)
    for nm, k in (("sum jnp", kernel_sum_jnp), ("sum tree", kernel_sum_tree)):
        g = lambda a, k=k: pl.pallas_call(
            k, grid=(E // eb,), in_specs=[be], out_specs=bs,
            out_shape=jax.ShapeDtypeStruct((E, 1, L), f))(a)
        r = np.asarray(jax.jit(g)(X1))
        np.testing.assert_allclose(r[:, 0], np.asarray(X1).sum(axis=1), rtol=1e-4)
        bench(nm, g, X1)
    # floor: pure copy 2 in 1 out
    def kernel_copy(x1_ref, x2_ref, out_ref):
        out_ref[...] = x1_ref[...] + x2_ref[...]
    cp = lambda a, b: pl.pallas_call(
        kernel_copy, grid=(E // eb,), in_specs=[be, be],
        out_specs=be, out_shape=jax.ShapeDtypeStruct((E, 16, L), f))(a, b)
    bench("add (bandwidth floor)", cp, X1, X2)

main()
