"""Tracing/profiling hooks (the reference has none — SURVEY §5).

`profile_trace` wraps a code region in a `jax.profiler.trace` writing a
TensorBoard-compatible trace; `phase_scope` names a curriculum phase in the
XLA profile via `jax.named_scope`.  The reference's only debugging device —
`torch.autograd.set_detect_anomaly(True)` around all of training
(train_and_test.py:24) — maps to running with JAX_DEBUG_NANS=True instead.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a device trace for TensorBoard (`jax.profiler.trace`)."""
    with jax.profiler.trace(log_dir):
        yield


def phase_scope(name: str):
    """Named scope for a curriculum phase (shows up in profiles)."""
    return jax.named_scope(name)
