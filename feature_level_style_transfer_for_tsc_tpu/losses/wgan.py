"""Wasserstein critic loss (reference widgets.py:59-61)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def wgan_loss(
    values_from_target_side: jax.Array,
    values_from_s2t2s: jax.Array,
    values_from_source_side: jax.Array,
) -> jax.Array:
    return (
        -jnp.mean(values_from_target_side)
        - jnp.mean(values_from_s2t2s)
        + jnp.mean(values_from_source_side)
    )
