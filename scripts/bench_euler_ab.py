"""A/B the fused euler kernel variants on the real chip (pull-fenced,
chain-wrapped — see microbench_t.py)."""
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

ref_out = None

def bench(name, version, groups, bih=False, n=10):
    global ref_out
    pallas_euler.KERNEL_VERSION = version
    pallas_euler.LIM_GROUP_LANES = groups
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
    t = (time.perf_counter() - t0 - RTT) / n
    # correctness vs v1 (same call, default config)
    raw = jax.jit(lambda Q: fused_advect_limit(
        Q, (u_t, v_t), dp850, divdp_t, zmin, one_l, arrays, 150.0,
        **(dict(bih=Q) if bih else {}), **kw)[0])(Qt)
    chk = np.asarray(raw[:32], np.float64)
    tag = ""
    if not bih:
        if ref_out is None:
            ref_out = chk
        else:
            err = np.abs(chk - ref_out).max() / np.abs(ref_out).max()
            tag = f"  maxrel vs v1 {err:.1e}"
    print(f"{name:<34} {t*1e3:9.2f} ms{tag}", flush=True)

bench("v1 (rolls, single loop)", 1, 512)
bench("v3 mxu, groups=0", 3, 0)
bench("v3 mxu, groups=1024", 3, 1024)
bench("v3 mxu, groups=512", 3, 512)
bench("v3 mxu, groups=256", 3, 256)
bench("v1 bih2", 1, 512, bih=True)
bench("v3 bih2 groups=512", 3, 512, bih=True)
