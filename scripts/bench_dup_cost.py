"""Measure the face+overlap duplicate-producer cost on real hardware.

The face+overlap composition (model/core.py euler_step_t, halo.py
dss_sum_t xb) re-runs the fused euler kernel on each shard's boundary
GROUP so the halo permutes can overlap the full-field kernel
(cuda_mod.F90:932-1009 overlaps without duplicating; our raster-order
band DSS cannot reorder elements, so it duplicates instead).  The auto
threshold (sharded.py: enable below a 50% boundary-group fraction) was
a model — this script grounds it: the fused kernel's wall time at
boundary-group-sized subsets of the NE30 perf grid IS the duplicate's
cost, and the overlap win it must beat is one halo round-trip.

Production context: NE120/S=8 has 6% boundary groups; toy grids
(NE8/S=8) reach 75%.  VERDICT r4 weak #4.
"""
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import time

import jax
import jax.numpy as jnp
import numpy as np

from transport_se_tpu.config import perf_config
from transport_se_tpu.model.core import build_model, initial_qdp, _tp
from transport_se_tpu.ops.pallas_euler import fused_advect_limit
import transport_se_tpu.model.dcmip as dcmip
from transport_se_tpu.ops import sphere_ops as so

cfg = perf_config(30, dtype="f32", use_pallas=True)
m = build_model(cfg)
E, nq, nk = m.grid.nelem, cfg.qsize, cfg.nlev
qk = nq * nk
Qt = _tp(jax.jit(lambda: initial_qdp(m))(), E, qk)
v = dcmip.winds(cfg.test_case, m.lon, m.lat, m.etam, 0.0)
vn0 = v * m.dp0col[None, :, None, None, None]
divdp = so.divergence_sphere(vn0, m.deriv, m.Dinv, m.metdet, m.rmetdet)
divdp_t = _tp(divdp, E, nk)
u_t = _tp(vn0[:, :, 0], E, nk)
v_t = _tp(vn0[:, :, 1], E, nk)
arrays = dict(Dinv=m.Dinv, metdet=m.metdet, rmetdet=m.rmetdet,
              spheremp=m.spheremp, deriv=m.grid.deriv)
zmin = jnp.zeros((E, qk), Qt.dtype)
one_l = zmin + 1.0
jax.block_until_ready(Qt)
_ = np.asarray(Qt.ravel()[0])
_r = []
for _i in range(9):
    t0 = time.perf_counter()
    _ = np.asarray(Qt.ravel()[0])
    _r.append(time.perf_counter() - t0)
RTT = sorted(_r)[4]

# chain-wrap overhead (the Q + 0.0*s fence pattern costs one
# elementwise pass of Q) — subtract it from every row
fid = jax.jit(lambda Q: Q + 0.0 * Q.ravel()[0])
o = fid(Qt)
_ = np.asarray(o.ravel()[0])
t0 = time.perf_counter()
for _i in range(10):
    o = fid(o)
_ = np.asarray(o.ravel()[0])
WRAP = (time.perf_counter() - t0 - RTT) / 10 * 1e3
print(f"chain wrap {WRAP:.2f} ms (subtracted)", flush=True)

rows = []
for frac in (0.06, 0.12, 0.23, 0.37, 0.50, 1.00):
    Es = max(8, int(E * frac) // 8 * 8)
    sl = slice(0, Es)
    a_sl = dict(arrays, **{k: arrays[k][sl] for k in
                           ("Dinv", "metdet", "rmetdet", "spheremp")})

    def fn(Q):
        o = fused_advect_limit(Q[sl], (u_t[sl], v_t[sl]),
                               (divdp_t * 0 + 850.0)[sl], divdp_t[sl],
                               zmin[sl], one_l[sl], a_sl, 150.0,
                               transposed=True, nq=nq,
                               max_iter=cfg.limiter_iter_cap)[0]
        return Q + 0.0 * o.ravel()[0].astype(Q.dtype)

    f = jax.jit(fn)
    o = f(Qt)
    _ = np.asarray(o.ravel()[0])
    t0 = time.perf_counter()
    for _i in range(10):
        o = f(o)
    _ = np.asarray(o.ravel()[0])
    dt = (time.perf_counter() - t0 - RTT) / 10 * 1e3 - WRAP
    rows.append((frac, Es, dt))
    print(f"subset {frac*100:5.1f}%  E={Es:5d}  fused kernel "
          f"{dt:6.2f} ms", flush=True)

base = rows[-1][2]
print("\nduplicate cost relative to the full-field kernel:")
for frac, Es, dt in rows[:-1]:
    print(f"  {frac*100:5.1f}%: +{dt/base*100:5.1f}% extra kernel work",
          flush=True)
