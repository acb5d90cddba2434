"""Sharded-program cost vs the single-chip program, on ONE real chip.

VERDICT r3 item 3's acceptance: the sharded NE30-class pipeline's
per-step cost within ~15% of eloc-equivalent single-chip.  A 1-device
mesh runs the FULL production sharded program (banded face-shift DSS as
the Pallas band kernel with fused scale/minmax/lap epilogues, the
face+overlap duplicate boundary-group producer, halo machinery compiled
in) on the same element count as the single-chip program — the delta IS
the sharding overhead a real multi-chip run pays per chip, minus the
ICI transfer itself.

Timings host-pull fenced (ROADMAP "Measurement honesty").
"""
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import time

import jax
import jax.numpy as jnp
import numpy as np

from transport_se_tpu.config import perf_config
from transport_se_tpu.model.core import (build_model, initial_qdp,
                                         make_subcycle_fn, _tp)
from transport_se_tpu.parallel.sharded import make_mesh, make_sharded_subcycle

NE = int(os.environ.get("BENCH_NE", "30"))
QSIZE = int(os.environ.get("BENCH_QSIZE", "35"))
REPS = int(os.environ.get("BENCH_SUBCYCLES", "8"))

cfg = perf_config(NE, dtype="f32", use_pallas=True)
cfg = type(cfg)(**{**cfg.__dict__, "qsize": QSIZE})
m = build_model(cfg)
E = m.grid.nelem
qk = cfg.qsize * cfg.nlev

# face/raster variant of the same config for the sharded program
cfg_f = type(cfg)(**{**cfg.__dict__, "dss_mode": "face",
                     "elem_order": "raster"})
m_f = build_model(cfg_f)


def fence_rtt(x):
    _ = np.asarray(x.ravel()[0])
    r = []
    for _i in range(9):
        t0 = time.perf_counter()
        _ = np.asarray(x.ravel()[0])
        r.append(time.perf_counter() - t0)
    return sorted(r)[4]


def run_single():
    step = jax.jit(make_subcycle_fn(m, diagnostics=False, io_layout="t"))
    Q = _tp(jax.jit(lambda: initial_qdp(m))(), E, qk)
    n = jnp.asarray(0, jnp.int32)
    Q, ps, n, _ = step(Q, n)
    Q, ps, n, _ = step(Q, n)      # chain warmup (see run_sharded)
    rtt = fence_rtt(Q)
    t0 = time.perf_counter()
    for _i in range(REPS):
        Q, ps, n, _ = step(Q, n)
    _ = np.asarray(Q.ravel()[0])
    return (time.perf_counter() - t0 - rtt) / REPS


def run_sharded():
    mesh = make_mesh(jax.devices()[:1])
    runner = make_sharded_subcycle(m_f, mesh)
    assert runner.plan.nbound == 0          # raster kept
    Q = runner.shard_qdp(jax.jit(lambda: initial_qdp(m_f))())
    n = jnp.asarray(0, jnp.int32)
    # warm up THROUGH the chain: feeding step outputs back as inputs
    # changes committed layouts and triggers one more compile (~100 s);
    # the production chain pays it once, so absorb it before timing
    Q, ps, n, _ = runner.step(Q, n)
    Q, ps, n, _ = runner.step(Q, n)
    rtt = fence_rtt(Q)
    t0 = time.perf_counter()
    for _i in range(REPS):
        Q, ps, n, _ = runner.step(Q, n)
    _ = np.asarray(Q.ravel()[0])
    return (time.perf_counter() - t0 - rtt) / REPS


ORDER = os.environ.get("BENCH_ORDER", "single_first")
if ORDER == "sharded_first":
    t_sharded = run_sharded()
    t_single = run_single()
else:
    t_single = run_single()
    t_sharded = run_sharded()
over = (t_sharded / t_single - 1) * 100
print(f"NE{NE} {QSIZE}tr f32, {REPS} subcycles/rep:")
print(f"  single-chip program : {t_single*1e3:8.1f} ms/subcycle")
print(f"  sharded program S=1 : {t_sharded*1e3:8.1f} ms/subcycle "
      f"({over:+.1f}% vs single)")
print("WITHIN15" if t_sharded <= 1.15 * t_single else "EXCEEDS15")
