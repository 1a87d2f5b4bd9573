"""Test configuration: force a virtual 8-device CPU mesh.

Tests never require TPU hardware: Pallas kernels fall back to interpreter mode
on CPU (see dialog_tpu.kernels.common.INTERPRET), and sharding tests use the
8 virtual CPU devices configured here (SURVEY.md §7.6 "Distributed without a
cluster").
"""

import os

# Force CPU: the session env sets JAX_PLATFORMS=axon (TPU), so setdefault is
# not enough. TPU runs happen via bench.py / cli.py, never via pytest.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
