"""Probe 2: real device times via host-pull fencing.

block_until_ready through the axon tunnel returns early for plain XLA
programs (probe_timing.py: 0.47 ms claimed vs 79 ms with a pull fence for
an elementwise add).  Everything here is timed as: chain n launches, then
pull 32 bytes of the final output (forces completion), minus a separately
measured pull RTT on an already-ready buffer.
"""
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import time

import jax
import jax.numpy as jnp
import numpy as np

E, L = 5400, 2520
f = jnp.float32
c1 = jax.random.normal(jax.random.PRNGKey(0), (E, 16, L), f)
c2 = jax.random.normal(jax.random.PRNGKey(1), (E, 16, L), f)
jax.block_until_ready(c2)

# pull RTT on a ready buffer
_ = np.asarray(c1[0, 0, :8])
t0 = time.perf_counter()
for _i in range(10):
    _ = np.asarray(c1[0, 0, :8])
rtt = (time.perf_counter() - t0) / 10
print(f"pull RTT (ready buffer): {rtt*1e3:.2f} ms", flush=True)


def probe(name, fn, a, b, n=20, gb=None):
    o = fn(a, b); _ = np.asarray(o.ravel()[0])
    t0 = time.perf_counter()
    for _i in range(n):
        o = fn(o, b)
    _ = np.asarray(o.ravel()[0])
    t = (time.perf_counter() - t0 - rtt) / n
    bw = f"  {gb/t:7.1f} GB/s" if gb else ""
    print(f"{name:<36} {t*1e3:8.3f} ms/it{bw}", flush=True)


gb3 = E * 16 * L * 4 * 3 / 1e9
add = jax.jit(lambda a, b: a * 0.5 + b)
addd = jax.jit(lambda a, b: a * 0.5 + b, donate_argnums=0)
add2d = jax.jit(lambda a, b: a * 0.5 + b)
a2, b2 = c1.reshape(E * 16, L), c2.reshape(E * 16, L)

probe("xla add [E,16,L]", add, c1, c2, gb=gb3)
probe("xla add [E,16,L] donated", addd, c1, c2, gb=gb3)
probe("xla add [E*16,L]", add2d, a2, b2, gb=gb3)
a3 = c1.reshape(E * 16 * L // 128, 128)
b3 = c2.reshape(E * 16 * L // 128, 128)
probe("xla add [big,128]", add2d, a3, b3, gb=gb3)
