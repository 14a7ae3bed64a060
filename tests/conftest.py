"""Test configuration: CPU backend with 8 virtual devices, x64 enabled.

The 8-device CPU mesh is the TPU answer to "test multi-node without a
cluster": sharding/collective code paths compile and run exactly as they
would on an 8-chip slice.
"""

import os

# NOTE: this machine pins JAX_PLATFORMS=axon (the TPU tunnel) in the ambient
# environment and the plugin wins over per-process env vars — the only
# reliable override is jax.config.update below.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"
