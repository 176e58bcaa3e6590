"""Test config: run on a virtual 8-device CPU mesh so sharding/pjit paths are
exercised without TPU hardware (SURVEY.md §4 implication (c))."""

import os

# The environment pins JAX_PLATFORMS=axon (TPU) via sitecustomize; tests must
# run on a virtual 8-device CPU mesh, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# sitecustomize may have imported jax and pinned the TPU platform already;
# the config update below wins as long as no backend call happened yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / long-compile tests")
