"""On-device preprocessing: z-normalization and sliding-window extraction.

The reference relies on the UCR/UEA archives being pre-z-normalized and has
no windowing (SURVEY §2.1/§5); these jnp utilities make the framework
self-sufficient for raw signals, running on device inside jit:

* `znormalize` — per-series per-channel standardization (the property the
  commented reference snippet checks, multi_source_voting.py:105-115);
* `sliding_windows` — static-shape window extraction over the time axis,
  turning one long series into a batch of fixed-length windows (the
  TPU-friendly path for series longer than the model's receptive budget);
* `nan_to_zero` — padding-NaN cleanup for unequal-length archives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def znormalize(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Per-series per-channel z-norm over the time axis; x is (..., T, C)."""
    mean = jnp.nanmean(x, axis=-2, keepdims=True)
    std = jnp.sqrt(jnp.nanmean(jnp.square(x - mean), axis=-2, keepdims=True))
    return (x - mean) / (std + eps)


def nan_to_zero(x: jax.Array) -> jax.Array:
    """Replace padding NaNs (unequal-length .ts archives) with zeros."""
    return jnp.nan_to_num(x, nan=0.0)


def sliding_windows(x: jax.Array, window: int, stride: int) -> jax.Array:
    """(N, T, C) -> (N, num_windows, window, C), static shapes.

    num_windows = (T - window) // stride + 1; the tail shorter than a full
    window is dropped (standard TSC windowing).
    """
    n, t, c = x.shape
    num = (t - window) // stride + 1
    if num <= 0:
        raise ValueError(f"window {window} longer than series {t}")
    starts = jnp.arange(num) * stride

    def take(s):
        return jax.lax.dynamic_slice_in_dim(x, s, window, axis=1)

    return jnp.stack([take(s) for s in starts], axis=1) if num <= 64 else jnp.swapaxes(
        jax.vmap(take)(starts), 0, 1
    )


def windows_as_batch(x: jax.Array, y: jax.Array, window: int, stride: int):
    """Flatten windows into a larger batch, replicating labels.

    (N, T, C), (N,) -> (N*num_windows, window, C), (N*num_windows,)
    """
    w = sliding_windows(x, window, stride)
    n, num, _, c = w.shape
    return w.reshape(n * num, window, c), jnp.repeat(y, num)
