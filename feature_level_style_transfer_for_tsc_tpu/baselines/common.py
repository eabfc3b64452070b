"""Shared helpers for the comparison baselines (Adam + StepLR(25, 0.5))."""

from __future__ import annotations

import jax.numpy as jnp
import optax


def make_adam_steplr(lr: float) -> optax.GradientTransformation:
    """torch Adam parity with an injectable learning rate."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr)


def steplr_value(base_lr: float, count, step_size: int = 25, gamma: float = 0.5):
    """torch StepLR(step_size, gamma) value after ``count`` scheduler steps."""
    return base_lr * gamma ** (jnp.asarray(count) // step_size)
