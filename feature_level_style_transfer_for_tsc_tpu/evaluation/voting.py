"""Multi-source ensemble voting — on-device, collective-friendly.

Re-design of the reference's offline numpy voting
(`/root/reference/multi_source_voting.py:405-429`): each of M source-adapted
models contributes ``softmax(logits) * (1 + 120*e^{-H}) * 9^{w_m}`` where H
is the prediction entropy (natural log) and ``w_m`` the model's normalized
per-class train-split precision; the argmax of the sum wins.

All functions are pure jnp so the ensemble can be vmapped over a stacked
model axis and the reduction over models can ride a `psum` across a
"domain" mesh axis (see parallel/multi_source.py) instead of a host loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import VotingConfig


def _scaled_probs(
    logits: jax.Array, class_weights: jax.Array, cfg: VotingConfig
) -> jax.Array:
    """Per-model scaled vote contributions (reference :406-420).

    logits: (N, C); class_weights: (C,) -> (N, C).
    """
    probs = jax.nn.softmax(logits, axis=-1)
    ent = -jnp.sum(probs * jnp.log(probs), axis=-1, keepdims=True)  # scipy entropy
    return probs * (1.0 + cfg.entropy_scale * jnp.exp(-ent)) * jnp.power(
        cfg.weight_base, class_weights
    )


def entropy_precision_vote(
    logits: jax.Array,  # (M, N, C) stacked per-model logits
    class_weights: jax.Array,  # (M, C) normalized per-class precision weights
    cfg: VotingConfig = VotingConfig(),
) -> jax.Array:
    """Ensemble prediction (N,) — argmax of summed scaled votes."""
    contrib = jax.vmap(_scaled_probs, in_axes=(0, 0, None))(logits, class_weights, cfg)
    return jnp.argmax(jnp.sum(contrib, axis=0), axis=-1)


def entropy_only_vote(logits: jax.Array, entropy_scale: float = 2.0) -> jax.Array:
    """The commented entropy-only variant (reference :118-227): scales by
    ``1 + entropy_scale*e^{-H}`` without precision weights."""
    probs = jax.nn.softmax(logits, axis=-1)
    ent = -jnp.sum(probs * jnp.log(probs), axis=-1, keepdims=True)
    contrib = probs * (1.0 + entropy_scale * jnp.exp(-ent))
    return jnp.argmax(jnp.sum(contrib, axis=0), axis=-1)


def predicted_label_vote(
    logits: jax.Array,  # (M, N, C)
    class_weights: jax.Array,  # (M, C)
    entropy_scale: float = 120.0,
    weight_base: float = 12.0,
) -> jax.Array:
    """The per-predicted-label weight variant kept in
    `visualization.py:231-440` (:420-430): instead of scaling every class by
    ``base^{w}`` elementwise, each sample is scaled by the weight of its
    OWN argmax class, with base 12."""

    def per_model(lg, w):
        probs = jax.nn.softmax(lg, axis=-1)
        ent = -jnp.sum(probs * jnp.log(probs), axis=-1, keepdims=True)
        pred = jnp.argmax(probs, axis=-1)
        sample_w = jnp.take(w, pred)[:, None]
        return probs * (1.0 + entropy_scale * jnp.exp(-ent)) * jnp.power(
            weight_base, sample_w
        )

    contrib = jax.vmap(per_model)(logits, class_weights)
    return jnp.argmax(jnp.sum(contrib, axis=0), axis=-1)
