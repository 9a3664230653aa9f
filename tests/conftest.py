"""Test configuration: CPU backend with a virtual 8-device mesh.

Unit tests run on CPU (fast, deterministic); multi-device sharding tests use
XLA's forced host platform device count, per the standard JAX testing recipe.
The real-TPU path is exercised by ``bench.py`` / the driver.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# This image force-registers a remote "axon" TPU plugin via sitecustomize and
# ignores the JAX_PLATFORMS env var; the config update below reliably pins the
# tests to the in-process CPU backend (8 virtual devices for sharding tests).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # allow f64 oracles in tests
