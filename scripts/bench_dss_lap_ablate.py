"""Split the DSS lap-epilogue's +8 ms into DMA (extra full-field output)
vs VPU (derivative rolls): no-lap vs lap-DMA-only vs full lap."""
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import subprocess

HERE = os.path.dirname(__file__)
ONE = r"""
import sys, os; sys.path.insert(0, %r)
import time
import jax, jax.numpy as jnp
import numpy as np
from transport_se_tpu.config import perf_config
from transport_se_tpu.model.core import build_model, initial_qdp, _tp
cfg = perf_config(30, dtype="f32", use_pallas=True)
m = build_model(cfg)
E, nq, nk = m.grid.nelem, cfg.qsize, cfg.nlev
qk = nq*nk
L = -(-qk // 128) * 128
Qt = jnp.pad(_tp(jax.jit(lambda: initial_qdp(m))(), E, qk),
             ((0,0),(0,0),(0,L-qk)))
rsp16 = m.rspheremp.reshape(E, 16)
dp0_t = jnp.broadcast_to(m.dp0col[None, None, :], (E, 16, nk))
arrays = dict(Dinv=m.Dinv, spheremp=m.spheremp, deriv=m.grid.deriv)
jax.block_until_ready(Qt)
_ = np.asarray(Qt.ravel()[0])
_r = []
for _i in range(9):
    t0 = time.perf_counter(); _ = np.asarray(Qt.ravel()[0])
    _r.append(time.perf_counter() - t0)
RTT = sorted(_r)[4]
MODE = os.environ.get("MODE")
def fn(Q):
    if MODE == "nolap":
        o = m.tables.dss_scale_minmax_t(Q, rsp16, dp0_t, nq)[0]
    else:
        o = m.tables.dss_scale_minmax_t(Q, rsp16, dp0_t, nq,
                                        lap_arrays=arrays)[0]
    return Q + 0.0 * o.ravel()[0]
f = jax.jit(fn)
o = f(Qt); _ = np.asarray(o.ravel()[0])
t0 = time.perf_counter()
for _i in range(10):
    o = f(o)
_ = np.asarray(o.ravel()[0])
print(f"{(time.perf_counter()-t0-RTT)/10*1e3:.2f} ms", flush=True)
""" % (os.path.join(HERE, os.pardir),)

for mode, ab in (("nolap", ""), ("lapdma", "1"), ("full", "")):
    env = dict(os.environ, MODE=mode, TSE_DSS_ABLATE_LAP=ab)
    r = subprocess.run([sys.executable, "-c", ONE], env=env,
                       capture_output=True, text=True)
    out = [l for l in r.stdout.strip().splitlines() if l]
    print(f"{mode:<8} {out[-1] if out else r.stderr.strip().splitlines()[-1:]}",
          flush=True)
