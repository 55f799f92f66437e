"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment's sitecustomize registers the axon TPU plugin in every
python process and overwrites JAX_PLATFORMS, so the env var alone is not
enough — we must also override jax.config before any backend initializes
(conftest is imported before all test modules).
"""

import os

os.environ.setdefault("JAX_ENABLE_X64", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on CPU"
