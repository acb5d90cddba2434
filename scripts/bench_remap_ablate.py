"""Decompose the PPM remap kernel's device time via TSE_PPM_ABLATE.

Runs the kernel with sections disabled (results are wrong; timing only)
to find where the ~24 ms go.  Each section's cost = full - ablated.
"""
import os
import subprocess
import sys

HERE = os.path.dirname(__file__)
CASES = ["", "sel", "cum", "coef", "rep", "sel,cum,coef,rep"]

for ab in CASES:
    env = dict(os.environ, TSE_PPM_ABLATE=ab)
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench_remap_one.py")],
        env=env, capture_output=True, text=True)
    out = r.stdout.strip().splitlines()
    tail = out[-1] if out else r.stderr.strip().splitlines()[-1:]
    print(f"ablate={ab or '(none)':<18} {tail}", flush=True)
