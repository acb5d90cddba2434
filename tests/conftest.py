"""Test configuration: CPU backend, 8 virtual devices, float64 enabled.

Verification-grade numerics run in f64 (matching the reference's real*8);
the TPU perf path uses f32 (see transport_se_tpu.config).  The virtual
8-device CPU mesh exercises the multi-chip sharding path without hardware.
"""

import os

# NOTE: the sandbox presets JAX_PLATFORMS=axon (the TPU tunnel) and the
# plugin wins over the env var — jax.config.update is the only reliable
# override, so tests must NOT rely on env alone.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
