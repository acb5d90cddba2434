import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import time
import jax, jax.numpy as jnp
import numpy as np
from transport_se_tpu.grid.cubesphere import build_grid

g = build_grid(30)
E = g.nelem
B = 35*72
x = jnp.asarray(np.random.default_rng(0).uniform(0,1,(E,B,4,4)), jnp.float32)
part_idx = jnp.asarray(g.part_idx)          # [E*16, 3]
part_mask = jnp.asarray(g.part_mask)

def dss_cur(x):
    xf = x.reshape(E, B, 16)
    xf = jnp.moveaxis(xf, 0, 1).reshape(B, E*16)
    partners = xf[:, part_idx]
    contrib = jnp.where(part_mask, partners, 0).sum(axis=-1)
    out = xf + contrib
    return jnp.moveaxis(out.reshape(B, E, 16), 1, 0).reshape(x.shape)

def dss_t(x):
    # point-major layout: gather whole lanes rows
    xf = x.reshape(E*16//16, 16, B)  # wrong; need [E,B,16] -> [E*16, B]
    return None

def dss_rowgather(x):
    xf = x.reshape(E, B, 16)
    xf = jnp.moveaxis(xf, 2, 1).reshape(E*16, B)   # [E*16, B] point-major
    partners = xf[part_idx]                        # [E*16, 3, B] row gather
    contrib = jnp.where(part_mask[..., None], partners, 0).sum(axis=1)
    out = xf + contrib
    return jnp.moveaxis(out.reshape(E, 16, B), 1, 2).reshape(x.shape)

def dss_rowgather_not(x):
    # row gather without the transposes, input already [E*16, B]
    xf = x
    partners = xf[part_idx]
    contrib = jnp.where(part_mask[..., None], partners, 0).sum(axis=1)
    return xf + contrib

# segment-sum formulation: scatter-add into ngid accumulators then gather
gid = jnp.asarray(g.gid.reshape(-1))
def dss_segsum(x):
    xf = x.reshape(E, B, 16)
    xf = jnp.moveaxis(xf, 2, 1).reshape(E*16, B)
    acc = jax.ops.segment_sum(xf, gid, num_segments=g.ngid)
    out = acc[gid]
    return jnp.moveaxis(out.reshape(E, 16, B), 1, 2).reshape(x.shape)

def bench(name, f, arg):
    fn = jax.jit(f)
    o = fn(arg); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(5): o = fn(arg)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/5*1e3:.2f} ms", flush=True)
    return o

a = bench("dss current (lane gather)", dss_cur, x)
b = bench("dss row-gather (+transpose)", dss_rowgather, x)
xT = jnp.moveaxis(x.reshape(E,B,16), 2, 1).reshape(E*16, B)
bench("dss row-gather (native layout)", dss_rowgather_not, xT)
c = bench("dss segment-sum", dss_segsum, x)
print("rowgather matches:", float(jnp.abs(a-b).max()))
print("segsum  matches:", float(jnp.abs(a-c).max()))
