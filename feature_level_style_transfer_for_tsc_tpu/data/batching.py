"""Static-shape epoch batching for jitted training loops.

The reference materializes a shuffled epoch as ``list(enumerate(loader))``
and indexes batches in Python (train_and_test.py:146,536-538).  Here an
epoch is ONE stacked array ``(num_batches, B, T, C)`` produced on host and
consumed by a `lax.scan` inside the jitted epoch function — no per-batch
host<->device transfers.

Shapes must be static for XLA, so every batch is full: when N is not a
multiple of B, the tail batch is filled by wrapping around the same shuffled
permutation (instead of torch's smaller final batch).  This keeps
batch-interacting losses (CPC's InfoNCE over the batch, CDAN's weight
normalization) well-defined without masking and is statistically equivalent.
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np


def num_full_batches(n: int, batch_size: int) -> int:
    return max(1, -(-n // batch_size))  # ceil, at least one batch


def epoch_batches(
    x: np.ndarray,
    y: np.ndarray,
    key: jax.Array,
    batch_size: int,
    *,
    shuffle: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Shuffle and stack one epoch: returns (nb, B, T, C) and (nb, B)."""
    n = x.shape[0]
    nb = num_full_batches(n, batch_size)
    if shuffle:
        perm = np.asarray(jax.device_get(jax.random.permutation(key, n)))
    else:
        perm = np.arange(n)
    total = nb * batch_size
    idx = np.resize(perm, total)  # wrap-around fill of the tail batch
    xb = x[idx].reshape(nb, batch_size, *x.shape[1:])
    yb = y[idx].reshape(nb, batch_size)
    return xb, yb
