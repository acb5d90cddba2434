"""A/B the face-DSS kernel lane-chunk width / block cap on the real chip."""
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import time
import jax, jax.numpy as jnp
import numpy as np
from transport_se_tpu.config import perf_config
from transport_se_tpu.model.core import build_model, initial_qdp, _tp
from transport_se_tpu.ops import pallas_dss

cfg = perf_config(30, dtype="f32", use_pallas=True)
m = build_model(cfg)
E, nq, nk = m.grid.nelem, cfg.qsize, cfg.nlev
qk = nq*nk
Qt = _tp(jax.jit(lambda: initial_qdp(m))(), E, qk)
rsp16 = m.rspheremp.reshape(E, 16)
dp0_t = jnp.broadcast_to(m.dp0col[None, None, :], (E, 16, nk))
arrays = dict(Dinv=m.Dinv, metdet=m.metdet, rmetdet=m.rmetdet,
              spheremp=m.spheremp, deriv=m.grid.deriv)
jax.block_until_ready(Qt)
_ = np.asarray(Qt.ravel()[0])
_r = []
for _i in range(9):
    t0 = time.perf_counter(); _ = np.asarray(Qt.ravel()[0])
    _r.append(time.perf_counter() - t0)
RTT = sorted(_r)[4]
print(f"pull RTT {RTT*1e3:.1f} ms", flush=True)

ref = {}

def bench(name, fn, key=None, n=10):
    def g(Q):
        o = fn(Q)
        first = o[0] if isinstance(o, tuple) else o
        return Q + 0.0 * first.ravel()[0]
    f = jax.jit(g)
    o = f(Qt); _ = np.asarray(o.ravel()[0])
    t0 = time.perf_counter()
    for _i in range(n):
        o = f(o)
    _ = np.asarray(o.ravel()[0])
    t = (time.perf_counter() - t0 - RTT) / n
    tag = ""
    if key:
        raw = jax.jit(fn)(Qt)
        first = raw[0] if isinstance(raw, tuple) else raw
        chk = np.asarray(first[:16], np.float64)
        if key in ref:
            d = np.abs(chk - ref[key]).max()
            tag = f"  maxabs vs bc128 {d:.1e}"
        else:
            ref[key] = chk
    print(f"{name:<40} {t*1e3:9.2f} ms{tag}", flush=True)


# the kernel pads lanes to a 128 multiple internally (Bp = 2560 here),
# so DSS_BC only needs to divide Bp, not qk.  Sweep points are
# "bc:capM" CLI args (default list below).
sweep = [(128, 2_000_000), (256, 2_000_000), (512, 2_000_000),
         (512, 8_000_000), (2560, 8_000_000)]
if len(sys.argv) > 1:
    sweep = [(int(a.split(":")[0]), int(a.split(":")[1]) * 1_000_000)
             for a in sys.argv[1:]]
for bc, cap in sweep:
    pallas_dss.DSS_BC = bc
    pallas_dss.DSS_BLOCK_CAP = cap
    try:
        bench(f"dss_scale_t bc={bc} cap={cap//1_000_000}M",
              lambda Q: m.tables.dss_scale_t(Q, rsp16), key="scale")
    except Exception as e:
        print(f"dss_scale_t bc={bc} cap={cap//1_000_000}M FAILED: "
              f"{type(e).__name__}", flush=True)
    try:
        bench(f"dss_minmax_lap bc={bc} cap={cap//1_000_000}M",
              lambda Q: m.tables.dss_scale_minmax_t(Q, rsp16, dp0_t, nq,
                                                    lap_arrays=arrays),
              key="lap")
    except Exception as e:
        print(f"dss_minmax_lap bc={bc} cap={cap//1_000_000}M FAILED: "
              f"{type(e).__name__}", flush=True)
