"""Test configuration: run everything on CPU with 8 virtual devices so
mesh-sharded code paths execute in CI without TPU hardware.

Note: this environment's sitecustomize registers a remote TPU backend and
overrides JAX_PLATFORMS, so we must force the platform through jax.config
(before any backend is touched), not via env vars alone.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
