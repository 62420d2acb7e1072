"""Test config: run JAX on a virtual 8-device CPU mesh.

The environment's sitecustomize imports jax and pins JAX_PLATFORMS to a TPU
platform at interpreter start, so env vars alone are too late; we must update
the jax config explicitly before any backend is initialized.
"""
import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on CPU"
assert jax.device_count() == 8, "tests expect an 8-device virtual mesh"
