import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import time
import jax, jax.numpy as jnp
import numpy as np
from transport_se_tpu.ops.limiter import limiter_optim_iter_full
from transport_se_tpu.ops.pallas_limiter import limiter_optim_iter_full_pallas

E, q, k = 5400, 35, 72
n = E*q*k
rng = np.random.default_rng(0)
shp = (E, q, k, 16)
x = jnp.asarray(rng.uniform(0,1,shp), jnp.float32)
dp = jnp.asarray(rng.uniform(0.5,2,shp), jnp.float32)
sph = jnp.asarray(rng.uniform(0.1,1,shp), jnp.float32)
xm = x.mean(axis=-1)
# tight bounds around the mean: clip+redistribute has to iterate
qmin = (xm * 0.98).astype(jnp.float32)
qmax = (xm * 1.02).astype(jnp.float32)

def bench(name, f):
    g = jax.jit(f)
    o = g(x*dp, sph, qmin, qmax, dp); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(5): o = g(x*dp, sph, qmin, qmax, dp)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/5*1e3:.2f} ms", flush=True)
    return o

a = bench("xla  limiter", limiter_optim_iter_full)
b = bench("plas limiter", limiter_optim_iter_full_pallas)
print("maxdiff:", float(jnp.abs(a[0]-b[0]).max()))
