"""Classification losses (torch `nn.CrossEntropyLoss` parity)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax cross-entropy over the batch from integer labels.

    Parity with `nn.CrossEntropyLoss()` used throughout the reference
    (train_and_test.py:81).
    """
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def softmax_entropy(probs: jax.Array, epsilon: float = 1e-5) -> jax.Array:
    """Per-sample entropy of already-softmaxed probabilities.

    Parity with reference `Entropy` (C_DAN.py:28-34), including the epsilon
    inside the log.
    """
    return -jnp.sum(probs * jnp.log(probs + epsilon), axis=1)
