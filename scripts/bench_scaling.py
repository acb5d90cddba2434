#!/usr/bin/env python
"""Shard-count scaling + overlap A/B on realistic shard sizes.

Runs the sharded subcycle on 1/2/4/8 shards of a virtual CPU mesh (or
real devices) and reports result invariance plus per-subcycle wall time.
Defaults to the NE30 grid (5400 elements: >= 675 elements/shard at 8
shards — the NE120-per-chip class, not a toy).

On the virtual CPU mesh the timing is NOT a chip-performance statement —
it validates the decomposition (the reference's BFB-under-task-count
check, README:46-48) and catches structural serialization: with 8 virtual
devices pinned to one core the wall time should stay ~flat as S grows
(work conserved); growth means the decomposition added O(S) work or
serialized on collectives.  On a real multi-chip slice the same script
measures strong scaling directly.

--dss face runs the banded face-shift sharded DSS (the production
assembly, parallel/face_sharded.py); --overlap-ab additionally times the
gather path with the boundary-first overlap ordering ON vs OFF.

Usage: python scripts/bench_scaling.py [--ne 30] [--qsize 8]
           [--pallas] [--dss face] [--overlap-ab]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ne", type=int, default=30)
    p.add_argument("--nlev", type=int, default=16)
    p.add_argument("--qsize", type=int, default=8)
    p.add_argument("--pallas", action="store_true")
    p.add_argument("--dss", default=None, choices=[None, "gather", "face"])
    p.add_argument("--overlap-ab", action="store_true",
                   help="time the gather path with overlap on vs off")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--virtual", type=int, default=8,
                   help="force N virtual CPU devices (0 = real devices)")
    args = p.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_"
                                     f"count={args.virtual}")
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from transport_se_tpu.config import Config
    from transport_se_tpu.model.core import (build_model, initial_qdp,
                                             make_subcycle_fn)
    from transport_se_tpu.parallel.sharded import (make_mesh,
                                                   make_sharded_subcycle)

    extra = {}
    if args.dss == "face":
        extra = dict(dss_mode="face", elem_order="raster")
    # resolution-matched tstep/nu (the NE8 values at ne=30 violate the
    # hyperviscosity CFL ~60x over; the limiter then clips wildly and
    # amplifies cross-program roundoff far past the invariance tolerance)
    tstep = {8: 400.0, 30: 300.0, 120: 75.0}.get(args.ne, 1200.0)
    nu = {8: 6e16, 30: 1e15, 120: 1e13}.get(args.ne, 6e16)
    cfg = Config(ne=args.ne, nlev=args.nlev, qsize=args.qsize,
                 tstep=tstep, vcoord=f"dcmip{args.nlev}",
                 test_case="dcmip1-1", nu_q=nu, nmax=3, dtype="f64",
                 use_pallas=args.pallas, **extra)
    m = build_model(cfg)
    Qdp = initial_qdp(m)
    E = m.grid.nelem

    ref, *_ = jax.jit(make_subcycle_fn(m))(Qdp, jnp.asarray(0, jnp.int32))
    ref = np.asarray(ref)
    print(f"grid: ne={cfg.ne} E={E} qsize={cfg.qsize} nlev={cfg.nlev} "
          f"pallas={cfg.use_pallas} dss={cfg.dss_mode}", flush=True)

    def timeit(runner, Qs):
        out, ps, _, _ = runner.step(Qs, jnp.asarray(0, jnp.int32))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out, ps, _, _ = runner.step(Qs, jnp.asarray(0, jnp.int32))
        jax.block_until_ready(out)
        return out, (time.perf_counter() - t0) / args.reps

    ndev = len(jax.devices())
    for S in (1, 2, 4, 8):
        if S > ndev or E % S != 0:
            continue
        mesh = make_mesh(jax.devices()[:S])
        runner = make_sharded_subcycle(m, mesh)
        Qs = runner.shard_qdp(Qdp)
        out, dt = timeit(runner, Qs)
        err = np.abs(runner.to_model_order(out) - ref).max()
        rel = err / np.abs(ref).max()
        line = (f"S={S}: halo_rounds={runner.plan.nrounds} "
                f"nbound={runner.plan.nbound} subcycle={dt*1e3:8.1f} ms "
                f"max rel diff vs single-device={rel:.2e}")
        if args.overlap_ab and S > 1:
            # A/B with overlap FORCED on vs off, and the on-row asserted
            # non-degenerate (VERDICT r3 #2: the r03 table compared
            # overlap-off to itself — pallas=False auto-disabled it and
            # every row printed nbound=0)
            r_on = make_sharded_subcycle(m, mesh, overlap=True)
            r_off = make_sharded_subcycle(m, mesh, overlap=False)
            if cfg.dss_mode == "face":
                nbv = r_on.plan.bmask.sum(axis=1)
                assert nbv.min() > 0 and nbv.max() < r_on.plan.eloc, \
                    "degenerate face boundary group in overlap A/B"
                tag = f"bgrp<= {int(nbv.max())}/{r_on.plan.eloc}"
            else:
                assert 0 < r_on.plan.nbound < r_on.plan.eloc, \
                    "degenerate overlap split in overlap A/B"
                tag = f"nbound={r_on.plan.nbound}/{r_on.plan.eloc}"
            out_on, dt_on = timeit(r_on, r_on.shard_qdp(Qdp))
            rel_on = np.abs(r_on.to_model_order(out_on) - ref).max() \
                / np.abs(ref).max()
            _, dt_off = timeit(r_off, r_off.shard_qdp(Qdp))
            assert rel_on < 1e-13, "overlap-on invariance violated"
            line += (f"  [overlap ON ({tag}): {dt_on*1e3:8.1f} ms / "
                     f"OFF: {dt_off*1e3:8.1f} ms]")
        print(line, flush=True)
        assert rel < 1e-13, "shard-count invariance violated"
    print("shard-count invariance OK")


if __name__ == "__main__":
    main()
