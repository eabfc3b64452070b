"""Adversarial critics + CDAN randomized multilinear map.

Functional re-design of `/root/reference/widgets.py:15-42,95-131` and
`/root/reference/C_DAN.py:11-25`.  The reference modules mutate an
``iter_num`` counter inside forward to anneal their gradient-reversal
coefficient; here the counter is explicit state and the GRL is a
`jax.custom_vjp` (see ops/grl.py).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.grl import gradient_reversal, grl_coeff
from .common import dropout, linear, linear_init, xavier_normal_linear_init


class CriticState(NamedTuple):
    """GRL annealing counter (reference widgets.py:28-31,108-112)."""

    iter_num: jax.Array  # int32, starts at -1 like the reference


def critic_state_init() -> CriticState:
    return CriticState(iter_num=jnp.array(-1, jnp.int32))


# ------------------------------------------- AdversarialNetworkforCDAN -----

AD_NET_ALPHA = 100.0
AD_NET_MAX_ITER = 20.0


def ad_net_init(key, in_feature: int, hidden_size: int) -> Tuple[Dict, CriticState]:
    """3-layer MLP critic with xavier-normal init (widgets.py:83-106)."""
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "l1": xavier_normal_linear_init(k1, in_feature, hidden_size),
        "l2": xavier_normal_linear_init(k2, hidden_size, hidden_size),
        "l3": xavier_normal_linear_init(k3, hidden_size, 1),
    }
    return params, critic_state_init()


def ad_net_coeff(state: CriticState) -> jax.Array:
    return grl_coeff(state.iter_num, alpha=AD_NET_ALPHA, max_iter=AD_NET_MAX_ITER)


def ad_net_apply(
    params: Dict,
    state: CriticState,
    x: jax.Array,
    *,
    training: bool,
    dropout_rng: jax.Array = None,
) -> Tuple[jax.Array, CriticState]:
    """Critic value with GRL on the input (widgets.py:113-131).

    The counter increments once per training-mode call *before* computing
    the coefficient, exactly like the reference.
    """
    new_state = state
    if training:
        new_state = CriticState(
            iter_num=jnp.minimum(state.iter_num + 1, jnp.int32(AD_NET_MAX_ITER))
        )
    coeff = ad_net_coeff(new_state)
    x = gradient_reversal(x, coeff)
    d1, d2 = (
        jax.random.split(dropout_rng)
        if dropout_rng is not None
        else (None, None)
    )
    h = jnp.maximum(linear(params["l1"], x), 0.0)
    if d1 is not None:
        h = dropout(d1, h, 0.2, training)
    h = jnp.maximum(linear(params["l2"], h), 0.0)
    if d2 is not None:
        h = dropout(d2, h, 0.2, training)
    return linear(params["l3"], h), new_state


# --------------------------------------- FeatureDiscriminatorforSource -----

FEAT_DISC_ALPHA = 100.0
FEAT_DISC_MAX_ITER = 20.0


def feature_discriminator_init(key, length_of_feature: int) -> Tuple[Dict, CriticState]:
    """WGAN critic MLP L->800->400->50->1, LeakyReLU(0.2) (widgets.py:15-42)."""
    ks = jax.random.split(key, 4)
    params = {
        "l1": linear_init(ks[0], length_of_feature, 800),
        "l2": linear_init(ks[1], 800, 400),
        "l3": linear_init(ks[2], 400, 50),
        "l4": linear_init(ks[3], 50, 1),
    }
    return params, critic_state_init()


def feature_discriminator_apply(
    params: Dict, state: CriticState, x: jax.Array, *, training: bool
) -> Tuple[jax.Array, CriticState]:
    new_state = state
    if training:
        new_state = CriticState(
            iter_num=jnp.minimum(state.iter_num + 1, jnp.int32(FEAT_DISC_MAX_ITER))
        )
    coeff = grl_coeff(new_state.iter_num, alpha=FEAT_DISC_ALPHA, max_iter=FEAT_DISC_MAX_ITER)
    x = gradient_reversal(x, coeff)
    h = jax.nn.leaky_relu(linear(params["l1"], x), 0.2)
    h = jax.nn.leaky_relu(linear(params["l2"], h), 0.2)
    h = jax.nn.leaky_relu(linear(params["l3"], h), 0.2)
    return linear(params["l4"], h), new_state


# ------------------------------------------------------------ RandomLayer --

def random_layer_init(key, input_dim_list, output_dim: int = 1024) -> Dict:
    """Fixed (non-learned) random projection matrices (C_DAN.py:11-25)."""
    keys = jax.random.split(key, len(input_dim_list))
    return {
        "matrices": [
            jax.random.normal(k, (d, output_dim)) for k, d in zip(keys, input_dim_list)
        ],
        "output_dim": jnp.array(output_dim, jnp.float32),
    }


def random_layer_apply(params: Dict, input_list) -> jax.Array:
    """Elementwise product of projections, scaled by output_dim^(-1/n)."""
    mats = params["matrices"]
    projected = [x @ m for x, m in zip(input_list, mats)]
    out = projected[0] / jnp.power(params["output_dim"], 1.0 / len(projected))
    for p in projected[1:]:
        out = out * p
    return out
