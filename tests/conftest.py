"""Test configuration: run on a virtual 8-device CPU mesh.

Env vars must be set before jax initializes, hence at conftest import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("FLSTTSC_USE_PALLAS", "0")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
