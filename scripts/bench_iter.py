import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import time
import jax, jax.numpy as jnp
import transport_se_tpu.ops.pallas_euler as pe
from transport_se_tpu.config import perf_config
from transport_se_tpu.model.core import build_model, initial_qdp, _tp
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

def run(tag):
    f = jax.jit(lambda Q: pe.fused_advect_limit(
        Q, (u_t,v_t), divdp_t*0+850., divdp_t, zmin, zmin+1., arrays,
        150.0, transposed=True, nq=nq, eb=1)[0])
    o = f(Qt); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(5): o = f(Qt)
    jax.block_until_ready(o)
    print(f"{tag}: {(time.perf_counter()-t0)/5*1e3:8.2f} ms", flush=True)

run("normal (while, max 15)")
pe.MAX_ITER = 1
run("MAX_ITER=1 (while)")
orig_while = jax.lax.while_loop
# replace while with fixed single-pass fori to remove scalar-cond syncs
pe.MAX_ITER = 15
import jax.lax as lax
real_while = lax.while_loop
def fake_while(cond, body, init):
    state = init
    for _ in range(2):   # fixed 2 unrolled iterations, no scalar cond
        state = body(state)
    return state
lax_while = pe.jax.lax.while_loop
pe.jax.lax.while_loop = fake_while
try:
    run("unrolled 2 iters, no cond")
finally:
    pe.jax.lax.while_loop = lax_while
