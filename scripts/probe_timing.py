"""Probe: does block_until_ready actually wait through the axon tunnel?

Times a chained kernel loop two ways: (a) block_until_ready on the last
output, (b) additionally pulling 32 bytes to host (forces completion).
Also prints the device identity (the ROADMAP bandwidth model assumed
v5e-class ~820 GB/s; if the chip is newer, every floor estimate changes).
"""
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import time

import jax
import jax.numpy as jnp
import numpy as np

d = jax.devices()[0]
print("device:", d.platform, getattr(d, "device_kind", "?"), flush=True)

E, L = 5400, 2520
f = jnp.float32
c1 = jax.random.normal(jax.random.PRNGKey(0), (E, 16, L), f)
c2 = jax.random.normal(jax.random.PRNGKey(1), (E, 16, L), f)

# simple XLA copy-scale op: pure bandwidth (read 2, write 1 arrays)
add = jax.jit(lambda a, b: a * 0.5 + b)

from scripts.microbench_deriv import blockdiag_weights, _roll_kernel, _mxu_kernel, deriv, EB, N2
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from transport_se_tpu.ops.pallas_euler import _roll_coeffs, _ddy_mask_mat

cx, cy = _roll_coeffs(deriv, transpose=False)
wx, wy = blockdiag_weights(deriv)
be = pl.BlockSpec((EB, N2, L), lambda e: (e, 0, 0), memory_space=pltpu.VMEM)
bc = lambda r, c: pl.BlockSpec((r, c), lambda e: (0, 0),
                               memory_space=pltpu.VMEM)
shp = jax.ShapeDtypeStruct((E, N2, L), f)
roll = jax.jit(lambda a, b: pl.pallas_call(
    _roll_kernel, grid=(E // EB,),
    in_specs=[be, be, bc(N2, 4), bc(N2, 4), bc(N2, 4)],
    out_specs=be, out_shape=shp, interpret=False,
)(a, b, jnp.asarray(cx, f), jnp.asarray(cy, f),
  jnp.asarray(_ddy_mask_mat(), f)))
mxu = jax.jit(lambda a, b: pl.pallas_call(
    functools.partial(_mxu_kernel, jax.lax.Precision.HIGHEST),
    grid=(E // EB,),
    in_specs=[be, be, bc(128, 128), bc(128, 128)],
    out_specs=be, out_shape=shp, interpret=False,
)(a, b, jnp.asarray(wx, f), jnp.asarray(wy, f)))


def probe(name, fn, n=30):
    o = fn(c1, c2); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(o, c2)
    jax.block_until_ready(o)
    t_block = time.perf_counter() - t0
    _ = np.asarray(o[0, 0, :8])
    t_pull = time.perf_counter() - t0
    gb = (E * 16 * L * 4 * 3) / 1e9
    print(f"{name:<8} block {t_block/n*1e3:8.3f} ms/it   +pull "
          f"{t_pull/n*1e3:8.3f} ms/it   -> {gb/(t_pull/n):7.1f} GB/s eff",
          flush=True)


probe("xla-add", add)
probe("rolls", roll)
probe("mxu", mxu)
