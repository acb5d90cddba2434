#!/bin/bash
# Produce the round-3 multi-chip scaling artifact: shard-count wall-clock
# table at NE30-class shard sizes (>=675 elements/shard at 8 shards) on
# the 8-way virtual CPU mesh, for both the gather pipeline (with the
# overlap on/off A/B) and the banded face-shift sharded DSS.
# One JAX process at a time on this box — run alone.
set -u
cd "$(dirname "$0")/.."
out=artifacts/SCALING_r03.md
mkdir -p artifacts
{
  echo "# Shard-count scaling + overlap A/B (round 3)"
  echo
  echo "8 virtual CPU devices pinned to one physical core: wall time"
  echo "validates the decomposition (flat = work-conserving, no structural"
  echo "serialization; the reference's BFB-under-task-count check,"
  echo "README:46-48) — it is NOT a chip-performance statement.  f64."
  echo
  echo '## gather pipeline + overlap A/B'
  echo '```'
  python -u scripts/bench_scaling.py --overlap-ab --reps 2 2>&1 | grep -v WARNING
  echo '```'
  echo
  echo '## banded face-shift sharded DSS (production multi-chip assembly)'
  echo '```'
  python -u scripts/bench_scaling.py --dss face --reps 2 2>&1 | grep -v WARNING
  echo '```'
} > "$out"
echo "wrote $out"
