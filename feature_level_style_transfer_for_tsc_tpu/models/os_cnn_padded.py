"""Padded-shape OS-CNN: exact semantics on time/class-padded inputs.

Shape polymorphism for the archive sweep (SURVEY §7 "hard parts"): every
UCR/UEA dataset has its own (C, T, n_class) and hence its own jit
compilation.  These variants run the SAME math as models/os_cnn.py on
inputs padded to a bucket shape, with the dataset's true sizes passed as
runtime DATA (masks / scalars), so all datasets in a bucket share one
compiled program.

Exactness argument (tested vs the unpadded ops, tests/test_bucketing.py):

* the input is zero beyond ``t_valid`` and every layer re-zeroes positions
  ``>= t_valid``, so each conv sees exactly the reference's zero "same"
  padding at the true sequence end (OS_CNN.py:59);
* BatchNorm statistics are masked sums over ``B * t_valid`` positions —
  identical to the unpadded batch statistics;
* the average pool divides by ``t_valid``, not the padded length;
* padded class logits are pinned to -1e9: softmax mass ~ e^-1e9 = 0, so
  cross-entropy and argmax match the unpadded head exactly (to f32).

The bucket's ARCHITECTURE must match the dataset's: layer specs derive
from (C, receptive_field(T)) — only datasets with the same C and the same
``min(T//4, max_kernel)`` may share a bucket (for the univariate archive
every T >= 4*89 = 356 shares one architecture per channel count).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..ops.batchnorm import BNStats
from ..ops.osconv import masked_os_conv
from .common import linear


def time_mask(t_bucket: int, t_valid: jax.Array) -> jax.Array:
    """(t_bucket, 1) float mask of valid time steps; t_valid is runtime data."""
    return (jnp.arange(t_bucket)[:, None] < t_valid).astype(jnp.float32)


def class_mask(c_bucket: int, c_valid: jax.Array) -> jax.Array:
    return (jnp.arange(c_bucket) < c_valid).astype(jnp.float32)


def masked_batch_norm(
    x: jax.Array,  # (B, T_bucket, C), zero beyond the mask
    scale: jax.Array,
    bias: jax.Array,
    stats: BNStats,
    training: bool,
    tmask: jax.Array,  # (T_bucket, 1)
    n_valid: jax.Array,  # scalar: B * t_valid
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[jax.Array, BNStats]:
    """Torch-parity BN whose batch statistics span only valid positions."""
    if training:
        # x is already zero at masked positions, so plain sums are masked sums
        mean = jnp.sum(x, axis=(0, 1)) / n_valid
        var = jnp.sum(jnp.square(x - mean) * tmask, axis=(0, 1)) / n_valid
        unbiased = var * (n_valid / jnp.maximum(n_valid - 1, 1))
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


def os_block_apply_padded(
    params: Dict,
    state: Dict,
    masks: List[jax.Array],
    x: jax.Array,
    training: bool,
    tmask: jax.Array,
    t_valid: jax.Array,
    relu_at_last: bool = True,
) -> Tuple[jax.Array, Dict]:
    n_valid = x.shape[0] * t_valid
    new_states = []
    n = len(masks)
    for i, (p, s, m) in enumerate(zip(params["layers"], state["layers"], masks)):
        # mask BEFORE BN: the conv output is nonzero in the pad region (bias
        # everywhere + taps reading the valid boundary), and masked_batch_norm
        # assumes zeros there
        y = masked_os_conv(x, p["conv"]["weight"], p["conv"]["bias"], m) * tmask
        y, new_bn = masked_batch_norm(
            y, p["bn_scale"], p["bn_bias"], s["bn"], training, tmask, n_valid
        )
        if i < n - 1 or relu_at_last:
            y = jnp.maximum(y, 0.0)
        x = y * tmask  # re-zero the pad so the next conv sees "same" padding
        new_states.append({"bn": new_bn})
    return x, {"layers": new_states}


def os_cnn_apply_padded(
    params: Dict,
    state: Dict,
    masks: List[jax.Array],
    x: jax.Array,
    training: bool,
    tmask: jax.Array,
    t_valid: jax.Array,
    cmask: jax.Array,
) -> Tuple[jax.Array, jax.Array, Dict]:
    """Classifier on padded shapes; padded class logits pinned to -1e9."""
    y, new_block = os_block_apply_padded(
        params["block"], state["block"], masks, x, training, tmask, t_valid, True
    )
    pooled = jnp.sum(y, axis=1) / t_valid  # masked AdaptiveAvgPool1d(1)
    logits = linear(params["hidden"], pooled)
    logits = logits * cmask + (cmask - 1.0) * 1e9
    return logits, pooled, {"block": new_block}


def os_cnn_res_apply_padded(
    params: Dict,
    state: Dict,
    masks: List[jax.Array],
    x: jax.Array,
    training: bool,
    tmask: jax.Array,
    t_valid: jax.Array,
) -> Tuple[jax.Array, Dict]:
    n_valid = x.shape[0] * t_valid
    main, new_block = os_block_apply_padded(
        params["block"], state["block"], masks, x, training, tmask, t_valid,
        relu_at_last=False,
    )
    shortcut = x @ params["res"]["weight"] + params["res"]["bias"]
    shortcut, new_res_bn = masked_batch_norm(
        shortcut * tmask, params["res_bn_scale"], params["res_bn_bias"],
        state["res_bn"], training, tmask, n_valid,
    )
    out = jnp.maximum(main + shortcut, 0.0) * tmask
    return out, {"block": new_block, "res_bn": new_res_bn}
