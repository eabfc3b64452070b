"""Evaluation metrics: accuracy and per-class precision weights.

Parity with the reference's numpy loops
(`/root/reference/multi_source_voting.py:281-367`), vectorized so they can
run on device inside jit (the reference computes them on host per model).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def accuracy(pred: jax.Array, labels: jax.Array) -> jax.Array:
    return jnp.mean((pred == labels).astype(jnp.float32))


def per_class_precision_weights(
    pred: jax.Array, labels: jax.Array, num_class: int
) -> jax.Array:
    """w[c] = (# correct predictions of class c) / (# predictions of class c),
    0 when the class is never predicted (reference :297-310)."""
    pred_onehot = jax.nn.one_hot(pred, num_class)  # (N, C)
    correct = (pred == labels).astype(jnp.float32)[:, None] * pred_onehot
    num_pred = jnp.sum(pred_onehot, axis=0)
    num_correct = jnp.sum(correct, axis=0)
    return jnp.where(num_pred > 0, num_correct / jnp.maximum(num_pred, 1), 0.0)


def normalize_model_weights(weights: jax.Array) -> jax.Array:
    """Normalize per-class weights across models by their mean, replacing
    NaN/inf with 0 (reference :358-367).

    weights: (M, C) -> (M, C).
    """
    avg = jnp.mean(weights, axis=0, keepdims=True)
    out = weights / avg
    return jnp.nan_to_num(out, nan=0.0, posinf=0.0, neginf=0.0)
