"""Gradient reversal layer (GRL) as a `jax.custom_vjp`.

The reference implements gradient reversal with `tensor.register_hook`
closures (`/root/reference/C_DAN.py:40-44,70-71`,
`/root/reference/widgets.py:8-13,36-37,118`): the forward value is unchanged
and the backward gradient is multiplied by ``-coeff``.  In JAX the idiomatic
equivalent is a custom VJP, which is traceable, jittable and has zero runtime
cost in the forward pass.

`grl_coeff` reproduces the reference's annealing schedule
(`calc_coeff`, C_DAN.py:43-44 / widgets.py:12-13) as a pure function of the
iteration counter so it can live inside a jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def gradient_reversal(x: jax.Array, coeff: jax.Array) -> jax.Array:
    return x


def _grl_fwd(x, coeff):
    return x, coeff


def _grl_bwd(coeff, g):
    # Reverse and scale the gradient; no gradient flows into coeff itself.
    return (jax.tree_util.tree_map(lambda t: -coeff * t, g), None)


gradient_reversal.defvjp(_grl_fwd, _grl_bwd)


def grl_coeff(
    iter_num: jax.Array,
    high: float = 1.0,
    low: float = 0.0,
    alpha: float = 100.0,
    max_iter: float = 50.0,
) -> jax.Array:
    """Annealed GRL coefficient, parity with reference ``calc_coeff``.

    ``2*(high-low)/(1+exp(-alpha*iter/max_iter)) - (high-low) + low`` with
    ``iter`` clamped to ``max_iter`` the way the reference modules clamp their
    own ``iter_num`` (widgets.py:35-38,116-119).
    """
    it = jnp.minimum(jnp.asarray(iter_num, jnp.float32), max_iter)
    return (
        2.0 * (high - low) / (1.0 + jnp.exp(-alpha * it / max_iter)) - (high - low) + low
    )
