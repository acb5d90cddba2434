import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import time, functools
import jax, jax.numpy as jnp
from transport_se_tpu.config import perf_config
from transport_se_tpu.model.core import build_model, initial_qdp, euler_step, advect_rk2, vertical_remap
from transport_se_tpu.ops import sphere_ops as so
from transport_se_tpu.ops.limiter import limiter_optim_iter_full

cfg = perf_config(30, dtype="f32")
cfg = type(cfg)(**{**cfg.__dict__, "qsize": 35})
m = build_model(cfg)
Qdp = jax.jit(lambda: initial_qdp(m))()
E, q, k = Qdp.shape[:3]
dt = jnp.float32(cfg.tstep)
import transport_se_tpu.model.dcmip as dcmip
v = dcmip.winds(cfg.test_case, m.lon, m.lat, m.etam, 0.0)
vn0 = v * m.dp0col[None, :, None, None, None]
divdp = so.divergence_sphere(vn0, m.deriv, m.Dinv, m.metdet, m.rmetdet)

def bench(name, fn, *args, n=3):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt_ = (time.perf_counter()-t0)/n
    print(f"{name:<36} {dt_*1e3:9.2f} ms")
    return dt_

bench("full euler_step (stage0)", lambda Q: euler_step(m, Q, jnp.zeros(Q.shape[:3],Q.dtype), jnp.zeros(Q.shape[:3],Q.dtype), divdp, divdp, vn0, None, dt, 0)[0], Qdp)
bench("full euler_step (stage2+bih)", lambda Q: euler_step(m, Q, jnp.zeros(Q.shape[:3],Q.dtype), jnp.zeros(Q.shape[:3],Q.dtype), divdp, divdp, vn0, None, dt, 2)[0], Qdp)
bench("dss_sum(Qdp)", lambda Q: m.tables.dss_sum(Q), Qdp)
bench("neighbor_minmax", lambda Q: m.tables.neighbor_minmax(Q.min(axis=(-2,-1)), Q.max(axis=(-2,-1)))[0], Qdp)
bench("divergence_sphere(gradQ)", lambda Q: so.divergence_sphere(vn0[:,None]*Q[:,:,:,None], m.deriv, m.Dinv, m.metdet, m.rmetdet), Qdp)
def lim(Q):
    shp = Q.shape; flat = shp[:-2]+(16,)
    sp = jnp.broadcast_to(m.spheremp[:,None,None], shp).reshape(flat)
    dps = jnp.broadcast_to((m.dp0col[None,:,None,None]-dt*divdp)[:,None], shp).reshape(flat)
    qmin = Q.min(axis=(-2,-1))*0.; qmax = Q.max(axis=(-2,-1))*0.+1.
    return limiter_optim_iter_full(Q.reshape(flat), sp, qmin, qmax, dps)[0]
bench("limiter_optim_iter_full", lim, Qdp)
bench("laplace_sphere_wk", lambda Q: so.laplace_sphere_wk(Q/ (m.dp0col[None,None,:,None,None]), m.deriv, m.Dinv, m.spheremp), Qdp)
bench("vertical_remap", lambda Q: vertical_remap(m, Q, divdp, dt*3)[0], Qdp)
bench("winds eval", lambda t: dcmip.winds(cfg.test_case, m.lon, m.lat, m.etam, t), jnp.float32(0.))
