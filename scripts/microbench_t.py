import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import time
import jax, jax.numpy as jnp
from transport_se_tpu.config import perf_config
from transport_se_tpu.model.core import (build_model, initial_qdp, _tp,
                                         euler_step_t, advect_rk2_t,
                                         vertical_remap_t)
from transport_se_tpu.ops.pallas_euler import fused_advect_limit, laplace_wk_t
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
zmin = jnp.zeros((E,qk), Qt.dtype)

def bench(name, fn, *args, n=5):
    f = jax.jit(fn)
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n): o = f(*args)
    jax.block_until_ready(o)
    print(f"{name:<34} {(time.perf_counter()-t0)/n*1e3:9.2f} ms", flush=True)

bench("advect_rk2_t (full step)", lambda Q: advect_rk2_t(m, Q, vn0, 300.0)[0], Qt)
bench("euler_step_t stage0", lambda Q: euler_step_t(m, Q, zmin, zmin, divdp_t, divdp_t, (u_t,v_t), 150.0, 0)[0], Qt)
bench("euler_step_t stage2 (bih)", lambda Q: euler_step_t(m, Q, zmin, zmin, divdp_t, divdp_t, (u_t,v_t), 150.0, 2)[0], Qt)
bench("fused kernel alone", lambda Q: fused_advect_limit(Q, (u_t,v_t), divdp_t*0+850., divdp_t, zmin, zmin+1., arrays, 150.0, transposed=True, nq=nq)[0], Qt)
bench("laplace_wk_t alone", lambda Q: laplace_wk_t(Q, arrays), Qt)
bench("dss_sum_t (segsum)", lambda Q: m.tables.dss_sum_t(Q), Qt)
#bench("vertical_remap_t", lambda Q: vertical_remap_t(m, Q, divdp_t, 900.0)[0], Qt)
bench("winds", lambda t: dcmip.winds(cfg.test_case, m.lon, m.lat, m.etam, t), jnp.float32(0.))
bench("Q=Qt/dp + minmax", lambda Q: (lambda q: (q.min(axis=1), q.max(axis=1)))(Q / 850.0), Qt)
