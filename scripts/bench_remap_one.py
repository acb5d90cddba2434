"""One fenced timing of the Pallas PPM remap kernel (used by the ablation
sweep).  Prints a single 'remap: X ms' line."""
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import time
import jax, jax.numpy as jnp
import numpy as np
from transport_se_tpu.config import perf_config
from transport_se_tpu.model.core import build_model, initial_qdp, _tp
from transport_se_tpu.ops.pallas_ppm import remap_q_ppm_pallas_t

cfg = perf_config(30, dtype="f32", use_pallas=True)
m = build_model(cfg)
E, nq, nk = m.grid.nelem, cfg.qsize, cfg.nlev
qk = nq*nk
Qt = _tp(jax.jit(lambda: initial_qdp(m))(), E, qk)
dp_star = jnp.broadcast_to(m.dp0col[None, None, :], (E, 16, nk)) * 1.001
dp_ref = jnp.broadcast_to(m.dp0col[None, None, :], (E, 16, nk))
jax.block_until_ready(Qt)

_ = np.asarray(Qt.ravel()[0])
_r = []
for _i in range(9):
    t0 = time.perf_counter(); _ = np.asarray(Qt.ravel()[0])
    _r.append(time.perf_counter() - t0)
RTT = sorted(_r)[4]

def fn(Q):
    o = remap_q_ppm_pallas_t(Q, dp_star, dp_ref, alg=0, eb=8)
    s = o.ravel()[0]
    s = jnp.where(jnp.isfinite(s), s, 0.0)
    return Q + 0.0 * s

f = jax.jit(fn)
o = f(Qt); _ = np.asarray(o.ravel()[0])
t0 = time.perf_counter()
for _i in range(10):
    o = f(o)
_ = np.asarray(o.ravel()[0])
t = (time.perf_counter() - t0 - RTT) / 10
print(f"remap: {t*1e3:.2f} ms", flush=True)
