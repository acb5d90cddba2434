import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import time
import jax, jax.numpy as jnp
from transport_se_tpu.config import perf_config
from transport_se_tpu.model.core import build_model, initial_qdp, _tp, vertical_remap_t
import transport_se_tpu.model.dcmip as dcmip
from transport_se_tpu.ops import sphere_ops as so

cfg = perf_config(30, dtype="f32", use_pallas=True)
m = build_model(cfg)
E, nq, nk = m.grid.nelem, cfg.qsize, cfg.nlev
qk = nq*nk
Qdp = jax.jit(lambda: initial_qdp(m))()
Qt = _tp(Qdp, E, qk)
v = dcmip.winds(cfg.test_case, m.lon, m.lat, m.etam, 0.0)
vn0 = v * m.dp0col[None, :, None, None, None]
divdp_t = _tp(so.divergence_sphere(vn0, m.deriv, m.Dinv, m.metdet, m.rmetdet), E, nk)
del Qdp, v, vn0

f = jax.jit(lambda Q: vertical_remap_t(m, Q, divdp_t, 900.0)[0])
o = f(Qt); jax.block_until_ready(o)
t0=time.perf_counter()
for _ in range(5): o = f(Qt)
jax.block_until_ready(o)
print(f"vertical_remap_t: {(time.perf_counter()-t0)/5*1e3:.2f} ms", flush=True)
