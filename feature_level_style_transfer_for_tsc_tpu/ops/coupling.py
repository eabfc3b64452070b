"""Affine coupling transform of the simplified-WaveGlow flow.

Forward (density direction, reference Simplified_NF_WaveGlow.py:165-178):
``x1' = exp(log_s) * x1 + b`` with Jacobian log-determinant ``sum(log_s)``.
Inverse (synthesis direction, reference :183-203):
``x1 = (x1' - b) * exp(-log_s)``.

Channel-last layout: operands are (B, T, C/2).  These are pure elementwise
ops — XLA fuses them into the surrounding WN epilogue in a single VPU pass,
so no hand-written kernel is needed; keeping them as named functions
preserves the reference's seam for testing invertibility.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def affine_coupling_forward(
    x1: jax.Array, log_s: jax.Array, b: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Returns (x1', sum(log_s)) — transformed half and logdet contribution."""
    return jnp.exp(log_s) * x1 + b, jnp.sum(log_s)


def affine_coupling_inverse(x1p: jax.Array, log_s: jax.Array, b: jax.Array) -> jax.Array:
    """Exact inverse of `affine_coupling_forward` (reference infer, :195)."""
    return (x1p - b) * jnp.exp(-log_s)
