import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import time
import jax, jax.numpy as jnp
from transport_se_tpu.config import perf_config
from transport_se_tpu.model.core import build_model, initial_qdp, _tp
from transport_se_tpu.ops.pallas_euler import fused_advect_limit
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
divdp = so.divergence_sphere(vn0, m.deriv, m.Dinv, m.metdet, m.rmetdet)
divdp_t = _tp(divdp, E, nk)
u_t = _tp(vn0[:,:,0], E, nk); v_t = _tp(vn0[:,:,1], E, nk)
arrays = dict(Dinv=m.Dinv, metdet=m.metdet, rmetdet=m.rmetdet,
              spheremp=m.spheremp, deriv=m.grid.deriv)
zmin = jnp.zeros((E,1,qk), Qt.dtype)

for eb in (1, 2, 4, 8, 15, 24):
    f = jax.jit(lambda Q, eb=eb: fused_advect_limit(
        Q, (u_t,v_t), divdp_t*0+850., divdp_t, zmin, zmin+1., arrays,
        150.0, transposed=True, nq=nq, eb=eb)[0])
    try:
        o = f(Qt); jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(5): o = f(Qt)
        jax.block_until_ready(o)
        print(f"eb={eb:<3} {(time.perf_counter()-t0)/5*1e3:8.2f} ms", flush=True)
    except Exception as e:
        print(f"eb={eb}: FAILED {str(e)[:120]}", flush=True)
