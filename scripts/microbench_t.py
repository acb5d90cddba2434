"""Per-piece device timings for the NE30/35-tracer perf step.

Measurement notes (probe_timing*.py):
* block_until_ready through the axon tunnel can return before execution
  finishes — every timing here is fenced by a 4-byte host pull, minus the
  separately measured pull RTT.
* Each benched fn is wrapped as  Q + 0.0*fn(Q,...)[0].ravel()[0]  and
  chained through that output: the device must execute every launch (the
  scalar feeds the next input), yet the value round-trips bitwise to Q, so
  every iteration runs on identical, realistic data (the limiter's
  data-dependent while_loop keeps its true iteration count).  The wrap
  costs one elementwise pass over Q — reported by the identity row;
  subtract it from every other row.
"""
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import time
import jax, jax.numpy as jnp
import numpy as np
from transport_se_tpu.config import perf_config
from transport_se_tpu.model.core import (build_model, initial_qdp, _tp,
                                         euler_step_t, advect_rk2_t,
                                         vertical_remap_t)
from transport_se_tpu.ops.pallas_euler import fused_advect_limit, laplace_wk_t
from transport_se_tpu.ops import pallas_euler
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
one_l = zmin + 1.0
rsp16 = m.rspheremp.reshape(E, 16)
dp0_t = jnp.broadcast_to(m.dp0col[None, None, :], (E, 16, nk))
dp850 = divdp_t*0 + 850.0
jax.block_until_ready(Qt)

_ = np.asarray(Qt.ravel()[0])
_rtts = []
for _i in range(9):
    t0 = time.perf_counter()
    _ = np.asarray(Qt.ravel()[0])
    _rtts.append(time.perf_counter() - t0)
RTT = sorted(_rtts)[len(_rtts) // 2]
print(f"pull RTT {RTT*1e3:.1f} ms (median of {len(_rtts)})", flush=True)


def bench(name, fn, *args, n=10):
    def g(Q, *rest):
        o = fn(Q, *rest)
        first = o[0] if isinstance(o, tuple) else o
        s = first.ravel()[0].astype(Q.dtype)
        return Q + 0.0 * s
    f = jax.jit(g)
    o = f(*args)
    _ = np.asarray(o.ravel()[0])
    t0 = time.perf_counter()
    for _i in range(n):
        o = f(o, *args[1:])
    _ = np.asarray(o.ravel()[0])
    t = (time.perf_counter() - t0 - RTT) / n
    print(f"{name:<38} {t*1e3:9.2f} ms", flush=True)


bench("identity (chain-wrap overhead)", lambda Q: Q, Qt)
bench("advect_rk2_t (full step)", lambda Q: advect_rk2_t(m, Q, vn0, 300.0)[0], Qt)
bench("euler_step_t stage0", lambda Q: euler_step_t(m, Q, zmin, zmin, divdp_t, divdp_t, (u_t,v_t), 150.0, 0)[0], Qt)
bench("euler_step_t stage2 (bih)", lambda Q: euler_step_t(m, Q, zmin, zmin, divdp_t, divdp_t, (u_t,v_t), 150.0, 2)[0], Qt)
bench("fused kernel alone", lambda Q: fused_advect_limit(Q, (u_t,v_t), dp850, divdp_t, zmin, one_l, arrays, 150.0, transposed=True, nq=nq)[0], Qt)

# limiter share: cap the iteration loop at 1 (profiling knob; wrong results)
_saved = pallas_euler.MAX_ITER
pallas_euler.MAX_ITER = 1
bench("fused kernel MAX_ITER=1", lambda Q: fused_advect_limit(Q, (u_t,v_t), dp850, divdp_t, zmin, one_l, arrays, 150.0, transposed=True, nq=nq)[0], Qt)
pallas_euler.MAX_ITER = _saved

bench("fused kernel + bih mode2", lambda Q: fused_advect_limit(Q, (u_t,v_t), dp850, divdp_t, zmin, one_l, arrays, 150.0, transposed=True, nq=nq, bih=Q, bih_mode=2, nu_coef=1e-8, dp0=m.dp0ref)[0], Qt)
bench("laplace_wk_t alone", lambda Q: laplace_wk_t(Q, arrays), Qt)
bench("dss_scale_t (face kernel)", lambda Q: m.tables.dss_scale_t(Q, rsp16), Qt)
bench("dss_scale_minmax_t", lambda Q: m.tables.dss_scale_minmax_t(Q, rsp16, dp0_t, nq)[0], Qt)
bench("dss_scale_minmax_t + lap", lambda Q: m.tables.dss_scale_minmax_t(Q, rsp16, dp0_t, nq, lap_arrays=arrays)[0], Qt)
bench("minmax_prep", lambda Q: m.tables.minmax_prep(Q, dp0_t, nq)[0], Qt)
bench("neighbor_minmax", lambda Q: m.tables.neighbor_minmax(
    Q[:, 0, :].reshape(E, nq, nk), Q[:, 1, :].reshape(E, nq, nk))[0], Qt)
bench("vertical_remap_t", lambda Q: vertical_remap_t(m, Q, divdp_t, 900.0)[0], Qt)
bench("winds+divdp (XLA)", lambda Q: so.divergence_sphere(
    dcmip.winds(cfg.test_case, m.lon, m.lat, m.etam, Q.ravel()[0]*0)
    * m.dp0col[None, :, None, None, None],
    m.deriv, m.Dinv, m.metdet, m.rmetdet), Qt)
