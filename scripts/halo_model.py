#!/usr/bin/env python
"""Analytic halo-payload vs ICI bandwidth model for the sharded config.

Builds the real shard plan (parallel/halo.py) at a given NE and reports,
per shard count: halo sizes, per-step exchange payload, and the estimated
communication/compute ratio on a v5e-class chip — the scaling estimate
VERDICT item 3 asks for (reference baseline: NE120 perf config,
README:160-192, >=80 percent weak scaling target).

Per tracer step the sharded pipeline exchanges whole-element slabs
(16 x qsize*nlev x 4B each) for: 3 stage DSS + 1 biharmonic DSS; the
neighbor-min/max payloads are element scalars (qsize*nlev x 4B, ~16x
smaller) for 2 exchanges.  Each boundary element is sent once per
exchange (aggregated per peer, the FindBufferSlot discipline).

Usage: python scripts/halo_model.py [--ne 120] [--qsize 35] [--nlev 72]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

from transport_se_tpu.grid.cubesphere import build_grid
from transport_se_tpu.parallel.halo import build_shard_plan

# conservative public-class numbers for a v5e-like chip
ICI_GBS = 45.0          # effective per-direction ICI bandwidth, GB/s
HBM_GBS = 819.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ne", type=int, default=120)
    p.add_argument("--qsize", type=int, default=35)
    p.add_argument("--nlev", type=int, default=72)
    p.add_argument("--shards", type=int, nargs="*", default=[4, 8, 16])
    p.add_argument("--step-ms-per-5400-elems", type=float, default=135.0,
                   help="measured single-chip NE30 perf step time")
    args = p.parse_args()

    g = build_grid(args.ne, order="raster")
    E = g.nelem
    qk = args.qsize * args.nlev
    slab = 16 * qk * 4                      # bytes per element slab (f32)
    print(f"NE{args.ne}: E={E}, qsize={args.qsize}, nlev={args.nlev}, "
          f"slab={slab/1e3:.0f} kB, field={E*slab/1e9:.2f} GB")

    for S in args.shards:
        if E % S:
            print(f"S={S}: skip (E % S != 0)")
            continue
        plan = build_shard_plan(g, S, overlap=True)
        sent = plan.send_mask.sum(axis=(1, 2))          # elements sent/shard
        halo = plan.recv_mask.sum(axis=(1, 2))
        # per step: 4 slab exchanges + 2 scalar exchanges
        bytes_step = sent.max() * (4 * slab + 2 * slab / 16)
        t_comm = bytes_step / (ICI_GBS * 1e9)
        eloc = E // S
        t_comp = args.step_ms_per_5400_elems * 1e-3 * eloc / 5400.0
        eff = t_comp / (t_comp + t_comm)
        eff_ov = t_comp / max(t_comp, t_comm)   # with perfect overlap
        print(f"S={S:3d}: eloc={eloc:6d}  halo_max={halo.max():5d} "
              f"({100*halo.max()/eloc:4.1f}%)  payload={bytes_step/1e6:7.1f}"
              f" MB/step  t_comm={t_comm*1e3:6.2f} ms  "
              f"t_comp={t_comp*1e3:7.1f} ms  "
              f"scaling eff: {100*eff:5.1f}% (no overlap) "
              f"{100*eff_ov:5.1f}% (overlapped)")


if __name__ == "__main__":
    main()
