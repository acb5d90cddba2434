"""Audit the rhs_bf16 flag: conservation + field drift + fenced speed.

Runs the NE8 perf config (35 tracers, 72L, f32, Pallas) for N subcycles
with the advection-divergence matmuls at bf16 (1-pass MXU) vs f32
(HIGHEST), and reports per-tracer mass drift, field divergence between
the two runs, and fenced wall time.  Gate: mass drift must stay ~1e-4
(the f32 pipeline's own documented level, SURVEY §7.1 policy).
"""
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import time
import jax, jax.numpy as jnp
import numpy as np
from transport_se_tpu.config import perf_config
from transport_se_tpu.model.core import (build_model, initial_qdp,
                                         make_subcycle_fn, _tp)

NSUB = int(os.environ.get("AUDIT_SUBCYCLES", "16"))
NE = int(os.environ.get("AUDIT_NE", "8"))


def run(rhs_bf16):
    cfg = perf_config(NE, dtype="f32", use_pallas=True, rhs_bf16=rhs_bf16)
    m = build_model(cfg)
    E = m.grid.nelem
    qk = cfg.qsize * cfg.nlev
    step = jax.jit(make_subcycle_fn(m, diagnostics=False, io_layout="t"))
    Qdp = _tp(jax.jit(lambda: initial_qdp(m))(), E, qk)
    sp = m.spheremp.reshape(E, 16, 1)

    def mass(Q):
        return np.asarray((Q * sp).sum(axis=(0, 1)), np.float64) \
            .reshape(cfg.qsize, cfg.nlev).sum(axis=1)

    nstep = jnp.asarray(0, jnp.int32)
    Qw, _, _, _ = step(Qdp, nstep)
    _ = np.asarray(Qw.ravel()[0])
    m0 = mass(Qdp)
    t0 = time.perf_counter()
    Q = Qdp
    for _i in range(NSUB):
        Q, ps, nstep, _ = step(Q, nstep)
    _ = np.asarray(Q.ravel()[0])
    wall = time.perf_counter() - t0
    m1 = mass(Q)
    drift = np.abs(m1 - m0) / np.abs(m0)
    return np.asarray(Q, np.float64), drift, wall


q32, d32, w32 = run(False)
qbf, dbf, wbf = run(True)
rel = np.abs(qbf - q32).max() / np.abs(q32).max()
print(f"subcycles={NSUB} ne={NE}")
print(f"f32  mass drift max {d32.max():.3e}   wall {w32:.2f}s")
print(f"bf16 mass drift max {dbf.max():.3e}   wall {wbf:.2f}s")
print(f"field max rel diff bf16 vs f32: {rel:.3e}")
ok = dbf.max() < 2e-4
print("AUDIT", "PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
