"""Test configuration: run on a virtual 8-device CPU mesh.

The container presets JAX_PLATFORMS=axon and a sitecustomize that registers
the TPU PJRT plugin at interpreter start, so plain env edits here are too
late — `jax.config.update("jax_platforms", "cpu")` after import is what
actually forces CPU.  XLA_FLAGS still must be set before the first backend
initialization to get the 8 virtual devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("FLSTTSC_USE_PALLAS", "0")

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert len(jax.devices()) == 8, f"expected 8 CPU devices, got {jax.devices()}"

# Modules dominated by jit-compiles of full training epochs / e2e runs /
# torch-reference transplants.  `pytest -m "not slow"` is the fast tier.
SLOW_MODULES = {
    "test_compat",
    "test_pipeline",
    "test_parallel",
    "test_baselines",
    "test_cli",
    "test_io",
    "test_classifier",
    "test_gradnorm_equiv",
    "test_torch_parity",
    "test_torch_parity_pipeline",
    "test_multirun",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
