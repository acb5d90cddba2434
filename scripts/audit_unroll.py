"""Hardware check: TSE_LIM_UNROLL2 leaves the pipeline BITWISE unchanged.

The unrolled limiter does two clip-redistribute updates per while_loop
trip (ops/pallas_euler.py LIM_UNROLL2).  Converged columns are fixed
points of the body and capped columns see exactly max_iter updates
either way (even cap), so results must be bit-identical — this script
asserts that on the real chip over several NE8 perf subcycles.
"""
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax, jax.numpy as jnp
import numpy as np
from transport_se_tpu.config import perf_config
from transport_se_tpu.model.core import (build_model, initial_qdp,
                                         make_subcycle_fn, _tp)
from transport_se_tpu.ops import pallas_euler

NSUB = int(os.environ.get("AUDIT_SUBCYCLES", "6"))


def run(unroll):
    pallas_euler.LIM_UNROLL2 = unroll
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


a = run(False)
b = run(True)
same = np.array_equal(a, b)
print(f"subcycles={NSUB}: unroll2 vs reference max|diff| = "
      f"{np.abs(a - b).max():.3e}  bitwise={'YES' if same else 'NO'}")
print("AUDIT", "PASS" if same else "FAIL")
sys.exit(0 if same else 1)
