#!/usr/bin/env python
"""Shard-count scaling check: run the sharded subcycle on 1/2/4/8 shards
of a virtual CPU mesh (or however many real devices exist) and report
result invariance plus per-step wall time.

On the virtual CPU mesh the timing is NOT a performance statement — it
validates the decomposition (the reference's BFB-under-task-count check,
README:46-48) and exercises the ppermute halo + overlap ordering.  On a
real multi-chip slice the same script measures weak/strong scaling.

Usage: python scripts/bench_scaling.py [--ne 4] [--qsize 8] [--pallas]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ne", type=int, default=4)
    p.add_argument("--nlev", type=int, default=16)
    p.add_argument("--qsize", type=int, default=8)
    p.add_argument("--pallas", action="store_true")
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

    cfg = Config(ne=args.ne, nlev=args.nlev, qsize=args.qsize,
                 tstep=1200.0, vcoord=f"dcmip{args.nlev}",
                 test_case="dcmip1-1", nu_q=6e16, nmax=3, dtype="f64",
                 use_pallas=args.pallas)
    m = build_model(cfg)
    Qdp = initial_qdp(m)
    E = m.grid.nelem

    ref, *_ = jax.jit(make_subcycle_fn(m))(Qdp, jnp.asarray(0, jnp.int32))
    ref = np.asarray(ref)
    print(f"grid: ne={cfg.ne} E={E} qsize={cfg.qsize} nlev={cfg.nlev} "
          f"pallas={cfg.use_pallas}")

    ndev = len(jax.devices())
    for S in (1, 2, 4, 8):
        if S > ndev or E % S != 0:
            continue
        mesh = make_mesh(jax.devices()[:S])
        runner = make_sharded_subcycle(m, mesh)
        Qs = runner.shard_qdp(Qdp)
        out, ps, _, _ = runner.step(Qs, jnp.asarray(0, jnp.int32))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out, ps, _, _ = runner.step(Qs, jnp.asarray(0, jnp.int32))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
        err = np.abs(runner.to_model_order(out) - ref).max()
        rel = err / np.abs(ref).max()
        print(f"S={S}: halo_rounds={runner.plan.nrounds} "
              f"nbound={runner.plan.nbound} subcycle={dt*1e3:8.1f} ms "
              f"max rel diff vs single-device={rel:.2e}")
        assert rel < 1e-13, "shard-count invariance violated"
    print("shard-count invariance OK")


if __name__ == "__main__":
    main()
