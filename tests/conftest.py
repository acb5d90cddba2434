"""Test configuration: CPU backend, 8 virtual devices, float64 enabled.

Verification-grade numerics run in f64 (matching the reference's real*8);
the TPU perf path uses f32 (see transport_se_tpu.config).  The virtual
8-device CPU mesh exercises the multi-chip sharding path without hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
