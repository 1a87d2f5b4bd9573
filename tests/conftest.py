"""Test configuration: force a virtual 8-device CPU mesh.

Tests never require TPU hardware: on CPU the kernels dispatch to their jnp
reference paths by default, the Pallas kernel bodies run under the
interpreter when ``DIALOG_TPU_PALLAS_INTERPRET=1``
(dialog_tpu.kernels.common.use_pallas — tests/test_kernels.py sets it per
test), and sharding tests use the 8 virtual CPU devices configured here
(SURVEY.md §7.6 "Distributed without a cluster").
"""

import os

# Force CPU: the session env sets JAX_PLATFORMS=axon (TPU). The env var alone
# is NOT honored once the axon PJRT plugin is installed (verified: with
# JAX_PLATFORMS=cpu in the environment, jax.devices() still returns the TPU),
# so set the config flag explicitly below. TPU runs happen via bench.py /
# cli.py, never via pytest.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got " + jax.default_backend()
)
assert len(jax.devices()) >= 8, "8-device virtual CPU mesh not active"
