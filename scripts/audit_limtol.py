"""Audit the f32 limiter convergence tolerance (TSE_LIM_TOL).

The reference iterates the optimization limiter until |addmass| <=
5e-14*|mass| — an f64-grade criterion (prim_advection_mod.F90
limiter_optim_iter_full).  In the f32 perf kernel that forces iteration
to exact-zero residuals far past f32 precision; a tolerance at the f32
roundoff scale (~1e-7 relative) lets converged-enough columns exit
early.  Mass is preserved at ANY exit (every loop exit redistributes the
clip residual); the tolerance only bounds the residual overshoot left on
the bounds — this audit measures that overshoot like audit_limcap.py:
per-tracer mass drift (gate 2e-4), global tracer extrema (widening IS
the overshoot), field distance vs the tight-tol run, fenced wall time.
"""
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import time
import jax, jax.numpy as jnp
import numpy as np
from transport_se_tpu.config import perf_config
from transport_se_tpu.model.core import (build_model, initial_qdp,
                                         make_subcycle_fn, _tp)
from transport_se_tpu.ops import pallas_euler

NSUB = int(os.environ.get("AUDIT_SUBCYCLES", "16"))
NE = int(os.environ.get("AUDIT_NE", "8"))
TOLS = [float(t) for t in os.environ.get(
    "AUDIT_TOLS", "5e-14,1e-8,1e-7,1e-6").split(",")]


def run(tol):
    pallas_euler.TOL_LIMITER = tol
    cfg = perf_config(NE, dtype="f32", use_pallas=True)
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
    rtt0 = time.perf_counter()
    for _ in range(4):
        _ = np.asarray(Qw.ravel()[0])
    rtt = (time.perf_counter() - rtt0) / 4
    m0 = mass(Qdp)
    t0 = time.perf_counter()
    Q = Qdp
    for _i in range(NSUB):
        Q, ps, nstep, _ = step(Q, nstep)
    _ = np.asarray(Q.ravel()[0])
    wall = time.perf_counter() - t0 - rtt
    m1 = mass(Q)
    drift = np.abs(m1 - m0) / np.abs(m0)
    dp_lane = np.tile(np.asarray(m.dp0col, np.float64), cfg.qsize)
    q = np.asarray(Q, np.float64) / dp_lane[None, None, :]
    return np.asarray(Q, np.float64), drift, wall, q.min(), q.max()


ref = None
print(f"subcycles={NSUB} ne={NE} (cap=4 perf default)")
ok = True
for tol in TOLS:
    Q, drift, wall, qmn, qmx = run(tol)
    if ref is None:
        ref = Q
        rel = 0.0
    else:
        rel = np.abs(Q - ref).max() / np.abs(ref).max()
    print(f"tol={tol:8.0e}: mass drift {drift.max():.3e}  "
          f"field rel diff vs 5e-14 {rel:.3e}  "
          f"q in [{qmn:+.6e}, {qmx:.6f}]  wall {wall:.2f}s", flush=True)
    ok = ok and drift.max() < 2e-4
print("AUDIT", "PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
