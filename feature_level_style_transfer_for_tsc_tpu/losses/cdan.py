"""CDAN conditional-adversarial alignment loss.

Functional re-design of `/root/reference/C_DAN.py:49-82` (`CDAN`):

* features are flattened, logits softmaxed, and fused through the randomized
  multilinear map (or the outer-product fallback when no random layer);
* the fused representations go through the critic (which applies its own
  gradient reversal internally, see models/critics.py);
* per-sample entropy weights ``1 + e^{-H}``, normalized by their (detached)
  batch sum, with gradient reversal ON THE ENTROPY PATH using the critic's
  current coefficient (reference :70-71 ``register_hook(grl_hook(coeff))``);
* returns the Wasserstein-style difference
  ``sum(w_t * critic(t)) - sum(w_s * critic(s2t))`` (reference :79-82).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.critics import CriticState, ad_net_apply, ad_net_coeff, random_layer_apply
from ..ops.grl import gradient_reversal
from .classification import softmax_entropy


def _flatten_features(x: jax.Array) -> jax.Array:
    """(B, T, C) -> (B, C*T) in the reference's channel-major flatten order."""
    return jnp.swapaxes(x, 1, 2).reshape(x.shape[0], -1)


def cdan_loss(
    ad_net_params: Dict,
    ad_net_state: CriticState,
    target_feature: jax.Array,
    s2t_feature: jax.Array,
    target_logits: jax.Array,
    s2t_logits: jax.Array,
    *,
    random_layer: Optional[Dict] = None,
    training: bool = True,
    dropout_rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, CriticState]:
    input_target = _flatten_features(target_feature)
    input_s2t = _flatten_features(s2t_feature)
    prob_target = jax.nn.softmax(target_logits, axis=1)
    prob_s2t = jax.nn.softmax(s2t_logits, axis=1)

    if random_layer is None:
        # Outer-product fusion fallback (reference :56-59).
        fusion_t = jnp.einsum("bc,bf->bcf", prob_target, input_target)
        fusion_t = fusion_t.reshape(fusion_t.shape[0], -1)
        fusion_s = jnp.einsum("bc,bf->bcf", prob_s2t, input_s2t)
        fusion_s = fusion_s.reshape(fusion_s.shape[0], -1)
    else:
        fusion_t = random_layer_apply(random_layer, [input_target, prob_target])
        fusion_s = random_layer_apply(random_layer, [input_s2t, prob_s2t])

    rng_t, rng_s = (
        jax.random.split(dropout_rng) if dropout_rng is not None else (None, None)
    )
    target_out, state1 = ad_net_apply(
        ad_net_params, ad_net_state, fusion_t, training=training, dropout_rng=rng_t
    )
    s2t_out, state2 = ad_net_apply(
        ad_net_params, state1, fusion_s, training=training, dropout_rng=rng_s
    )

    coeff = ad_net_coeff(state2)
    ent_t = gradient_reversal(softmax_entropy(prob_target), coeff)
    ent_s = gradient_reversal(softmax_entropy(prob_s2t), coeff)
    w_t = 1.0 + jnp.exp(-ent_t)
    w_s = 1.0 + jnp.exp(-ent_s)
    w_t = w_t / jax.lax.stop_gradient(jnp.sum(w_t))
    w_s = w_s / jax.lax.stop_gradient(jnp.sum(w_s))

    # Reference quirk, replicated exactly: the ``.view(-1, 1)`` at
    # C_DAN.py:75,77 is never assigned, so ``weight (B,) * critic_out (B,1)``
    # BROADCASTS to (B, B) and the sum at :79-80 is Σ_i Σ_j w_j·out_i =
    # (Σw)·(Σout).  The forward value equals Σout (weights sum to 1 via the
    # detached denominator), but the entropy-GRL gradient path sees Σout per
    # weight — NOT the per-sample weighting the code appears to intend.
    # Verified by weight-transplant (tests/test_torch_parity.py::TestCDAN).
    distance_target = jnp.sum(w_t) * jnp.sum(target_out[:, 0])
    distance_s2t = jnp.sum(w_s) * jnp.sum(s2t_out[:, 0])
    return distance_target - distance_s2t, state2
