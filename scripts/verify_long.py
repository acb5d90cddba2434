#!/usr/bin/env python
"""Restart-chunked long verification runs (NE30/NE120 f64 DCMIP1-1).

The published NE30 72L DCMIP1-1 norms (reference README:127-128) need a
12-day f64 run — tens of hours on this box's single CPU core.  This runner
makes the run durable: it advances the simulation in restart chunks
(bit-exact resume, io/restart.py), so it can be killed at any time and
relaunched with the same command line to continue.  When all steps are
done it computes the DCMIP error norms against the analytic initial
condition (q_init is closed-form, so no history file is needed) and
appends the result to artifacts/.

Usage:
  python scripts/verify_long.py --ne 30 --days 12 \
      --workdir artifacts/ne30_f64_dcmip11
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ne", type=int, default=30)
    p.add_argument("--test", default="dcmip1-1")
    p.add_argument("--days", type=float, default=12.0)
    p.add_argument("--qsize", type=int, default=4)
    p.add_argument("--nlev", type=int, default=72)
    p.add_argument("--chunk-steps", type=int, default=144,
                   help="tracer steps per restart chunk (must divide the "
                        "total step count)")
    p.add_argument("--workdir", default="artifacts/ne30_f64_dcmip11")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from transport_se_tpu.config import Config
    from transport_se_tpu.constants import SCALE_HEIGHT
    from transport_se_tpu.io import restart as restart_io
    from transport_se_tpu.model.core import build_model, initial_q
    from transport_se_tpu.model.driver import run_simulation
    from transport_se_tpu.norms import (dcmip_error_norms, grade_tracer,
                                        unique_columns)
    import numpy as np

    tstep = {8: 400.0, 30: 300.0, 120: 75.0}[args.ne]
    nu = {8: 6e16, 30: 1e15, 120: 1e13}[args.ne]
    vcoord = "acme72" if args.nlev == 72 else f"dcmip{args.nlev}"
    cfg_full = Config(ne=args.ne, test_case=args.test, tstep=tstep,
                      ndays=args.days, qsize=args.qsize, nu_q=nu,
                      dtype="f64", nlev=args.nlev, vcoord=vcoord,
                      statefreq=10 ** 9)
    total = cfg_full.nsteps
    os.makedirs(args.workdir, exist_ok=True)
    rfile = os.path.join(args.workdir, "RESTART")

    m = build_model(cfg_full)
    nstep0 = 0
    init_state = None
    if os.path.exists(rfile):
        st = restart_io.read_restart(rfile)
        Qdp, ps_v, nstep0 = restart_io.resume(st, m, 1)
        init_state = (Qdp, nstep0)
        print(f"resuming from {rfile} at nstep={nstep0}/{total}",
              flush=True)
    else:
        print(f"fresh run: {total} steps total", flush=True)

    def writer(model, nstep, Qdp, ps_v):
        restart_io.write_restart(rfile, model, Qdp, ps_v, nstep)
        print(f"[{time.strftime('%H:%M:%S')}] restart at nstep={nstep}"
              f"/{total}", flush=True)

    if total % args.chunk_steps:
        raise SystemExit(f"chunk-steps must divide {total}")
    while nstep0 < total:
        n_next = min(nstep0 + args.chunk_steps, total)
        cfg = dataclasses.replace(cfg_full, ndays=0.0, nmax=n_next)
        res = run_simulation(cfg, model=m, verbose=False,
                             init_state=init_state,
                             restartfreq=args.chunk_steps,
                             restart_writer=writer)
        # run_simulation wrote the restart at n_next (chunk-aligned);
        # re-read it as next chunk's init (bit-exact round trip)
        st = restart_io.read_restart(rfile)
        Qdp, ps_v, nstep0 = restart_io.resume(st, m, 1)
        init_state = (Qdp, nstep0)
        rate = res.wall_seconds / max(res.nsteps - (n_next
                                                    - args.chunk_steps), 1)
        print(f"[{time.strftime('%H:%M:%S')}] chunk done: nstep={nstep0}"
              f"/{total}  ({rate:.1f} s/step)", flush=True)

    # ---- final norms ----
    st = restart_io.read_restart(rfile)
    hyai = np.asarray(m.hyai)
    hybi = np.asarray(m.hybi)
    dp_ref = ((hyai[1:] - hyai[:-1])[None, :, None, None] * 100000.0
              + (hybi[1:] - hybi[:-1])[None, :, None, None]
              * np.asarray(st.ps_v)[:, None])
    q_final = np.asarray(st.Qdp) / dp_ref[:, None]
    q0 = np.asarray(initial_q(m))
    tr = grade_tracer(args.test)
    g = m.grid
    qi = unique_columns(g, q0, tr)
    qf = unique_columns(g, q_final, tr)
    lat_col = g.lat.reshape(-1)[g.uniq_src]
    zm = SCALE_HEIGHT * np.log(1.0 / np.asarray(m.etam))
    norms = dcmip_error_norms(qi, qf, lat_col, zm, ne=args.ne)
    out = dict(config=f"NE{args.ne} {args.nlev}L {args.test} f64 "
               f"{args.days}d", **dataclasses.asdict(norms))
    print(json.dumps(out), flush=True)
    with open(os.path.join(args.workdir, "norms.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
