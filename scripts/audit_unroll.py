"""Hardware check: the limiter loop unroll variants are BITWISE neutral.

The while_loop in the fused euler kernel exists purely as an early-exit
optimization: converged columns are fixed points of the body (clip is
idempotent once x = xcl and the conv mask zeroes the redistribution), so
(a) two body applications per trip (LIM_UNROLL2, even caps) and (b) a
fully unrolled fixed-count loop (LIM_FULL_UNROLL_CAP) must both produce
bit-identical results — this script asserts that on the real chip over
several NE8 perf subcycles.
"""
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax, jax.numpy as jnp
import numpy as np
from transport_se_tpu.config import perf_config
from transport_se_tpu.model.core import (build_model, initial_qdp,
                                         make_subcycle_fn, _tp)
from transport_se_tpu.ops import pallas_euler

NSUB = int(os.environ.get("AUDIT_SUBCYCLES", "6"))


def run(unroll2, full_cap):
    pallas_euler.LIM_UNROLL2 = unroll2
    pallas_euler.LIM_FULL_UNROLL_CAP = full_cap
    cfg = perf_config(8, dtype="f32", use_pallas=True)
    assert cfg.limiter_iter_cap % 2 == 0, "even cap required for unroll2"
    m = build_model(cfg)
    E = m.grid.nelem
    qk = cfg.qsize * cfg.nlev
    step = jax.jit(make_subcycle_fn(m, diagnostics=False, io_layout="t"))
    Q = _tp(jax.jit(lambda: initial_qdp(m))(), E, qk)
    nstep = jnp.asarray(0, jnp.int32)
    for _ in range(NSUB):
        Q, ps, nstep, _ = step(Q, nstep)
    return np.asarray(Q)


ref = run(False, 0)                      # plain while_loop
ok = True
for name, a in (("unroll2", run(True, 0)),
                ("full-unroll", run(False, 99))):
    same = np.array_equal(a, ref)
    ok = ok and same
    print(f"subcycles={NSUB}: {name} vs while_loop max|diff| = "
          f"{np.abs(a - ref).max():.3e}  bitwise={'YES' if same else 'NO'}")
print("AUDIT", "PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
