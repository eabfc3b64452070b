"""Functional batch normalization with torch semantics.

The reference relies on `nn.BatchNorm1d` everywhere (OS_CNN.py:65,165) and
deliberately flips modules between train/eval to control which passes update
the running statistics (train_and_test.py:584-586, Comparison/CoDATS/
main.py:158-165).  Those mode flips change the *math*, so the rebuild makes
the statistics explicit state threaded through every step:

* training=True: normalize with the current batch's (biased) statistics and
  return updated running stats (momentum 0.1, unbiased variance — exactly
  torch's update rule).
* training=False: normalize with the running statistics, return them
  unchanged.

Channel-last layout: x is (..., C); stats are (C,).
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

# Trace-time switch for hand-written data parallelism (parallel/dp_explicit):
# inside `bn_cross_replica("data")`, train-mode batch moments are reduced
# across the named mesh axis with one psum, so a shard_map'd forward over a
# batch-sharded input normalizes with the GLOBAL batch statistics — the same
# math the GSPMD annotations in parallel/dp.py get from the partitioner.
# Read at trace time only (shard_map traces once), never at run time.
_CROSS_REPLICA_AXIS: contextvars.ContextVar[Optional[str]] = contextvars.ContextVar(
    "bn_cross_replica_axis", default=None
)


@contextlib.contextmanager
def bn_cross_replica(axis_name: str):
    """Within this context, train-mode batch_norm psums its batch moments
    over mesh axis ``axis_name`` (must be traced inside a shard_map binding
    that axis)."""
    token = _CROSS_REPLICA_AXIS.set(axis_name)
    try:
        yield
    finally:
        _CROSS_REPLICA_AXIS.reset(token)


class BNStats(NamedTuple):
    mean: jax.Array  # (C,)
    var: jax.Array  # (C,)


def init_bn_stats(num_features: int, dtype=jnp.float32) -> BNStats:
    return BNStats(jnp.zeros((num_features,), dtype), jnp.ones((num_features,), dtype))


def batch_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    stats: BNStats,
    training: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[jax.Array, BNStats]:
    """Normalize over all axes but the last; torch BatchNorm1d parity."""
    if training:
        reduce_axes = tuple(range(x.ndim - 1))
        axis_name = _CROSS_REPLICA_AXIS.get()
        if axis_name is not None:
            # global moments over the batch-sharded input: one stacked psum
            n_local = x.size // x.shape[-1]
            n = n_local * jax.lax.axis_size(axis_name)
            sums = jax.lax.psum(
                jnp.stack(
                    [jnp.sum(x, axis=reduce_axes), jnp.sum(jnp.square(x), axis=reduce_axes)]
                ),
                axis_name,
            )
            mean = sums[0] / n
            var = sums[1] / n - jnp.square(mean)  # biased
            unbiased = var * (n / max(n - 1, 1))
            new_stats = BNStats(
                (1 - momentum) * stats.mean + momentum * mean,
                (1 - momentum) * stats.var + momentum * unbiased,
            )
            inv = jax.lax.rsqrt(var + eps)
            return (x - mean) * (inv * scale) + bias, new_stats
        mean = jnp.mean(x, axis=reduce_axes)
        var = jnp.mean(jnp.square(x - mean), axis=reduce_axes)  # biased
        n = x.size // x.shape[-1]
        unbiased = var * (n / max(n - 1, 1))
        new_stats = BNStats(
            (1 - momentum) * stats.mean + momentum * mean,
            (1 - momentum) * stats.var + momentum * unbiased,
        )
        use_mean, use_var = mean, var
    else:
        new_stats = stats
        use_mean, use_var = stats.mean, stats.var
    inv = jax.lax.rsqrt(use_var + eps)
    y = (x - use_mean) * (inv * scale) + bias
    return y, new_stats
