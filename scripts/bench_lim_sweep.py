"""MAX_ITER sweep + hybrid-bih2 timing for the v3 kernel (pull-fenced)."""
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import time
import jax, jax.numpy as jnp
import numpy as np
from transport_se_tpu.config import perf_config
from transport_se_tpu.model.core import build_model, initial_qdp, _tp
from transport_se_tpu.ops import pallas_euler
from transport_se_tpu.ops.pallas_euler import fused_advect_limit
import transport_se_tpu.model.dcmip as dcmip
from transport_se_tpu.ops import sphere_ops as so

cfg = perf_config(30, dtype="f32", use_pallas=True)
m = build_model(cfg)
E, nq, nk = m.grid.nelem, cfg.qsize, cfg.nlev
qk = nq*nk
Qt = _tp(jax.jit(lambda: initial_qdp(m))(), E, qk)
v = dcmip.winds(cfg.test_case, m.lon, m.lat, m.etam, 0.0)
vn0 = v * m.dp0col[None, :, None, None, None]
divdp_t = _tp(so.divergence_sphere(vn0, m.deriv, m.Dinv, m.metdet,
                                   m.rmetdet), E, nk)
u_t = _tp(vn0[:,:,0], E, nk); v_t = _tp(vn0[:,:,1], E, nk)
arrays = dict(Dinv=m.Dinv, metdet=m.metdet, rmetdet=m.rmetdet,
              spheremp=m.spheremp, deriv=m.grid.deriv)
zmin = jnp.zeros((E,qk), Qt.dtype); one_l = zmin + 1.0
dp850 = divdp_t*0 + 850.0
jax.block_until_ready(Qt)
_ = np.asarray(Qt.ravel()[0])
_r = []
for _i in range(9):
    t0 = time.perf_counter(); _ = np.asarray(Qt.ravel()[0])
    _r.append(time.perf_counter() - t0)
RTT = sorted(_r)[4]
print(f"pull RTT {RTT*1e3:.1f} ms", flush=True)


def bench(name, bih=False, n=10):
    kw = dict(transposed=True, nq=nq)
    if bih:
        kw.update(bih_mode=2, nu_coef=1e-8, dp0=m.dp0ref)
    def fn(Q):
        b = dict(bih=Q) if bih else {}
        o = fused_advect_limit(Q, (u_t, v_t), dp850, divdp_t, zmin, one_l,
                               arrays, 150.0, **b, **kw)[0]
        return Q + 0.0 * o.ravel()[0]
    f = jax.jit(fn)
    o = f(Qt); _ = np.asarray(o.ravel()[0])
    t0 = time.perf_counter()
    for _i in range(n):
        o = f(o)
    _ = np.asarray(o.ravel()[0])
    print(f"{name:<34} {(time.perf_counter()-t0-RTT)/n*1e3:9.2f} ms",
          flush=True)

bench("v3 hybrid bih2 (lap2 rolls)", bih=True)
for mi in (1, 2, 3, 5, 15):
    pallas_euler.MAX_ITER = mi
    bench(f"v3 MAX_ITER={mi}")
