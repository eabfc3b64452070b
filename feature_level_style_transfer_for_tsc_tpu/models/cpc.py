"""Contrastive Predictive Coding (CPC) self-supervised auxiliary loss.

Functional re-design of `/root/reference/Comparison/SLARDA/train.py:41-76`,
reused by the main pipeline (train_and_test.py:20,131-134):

* a GRU consumes the features (B, T, C), giving context vectors;
* a random anchor ``t ~ U[0, timestep/2)`` is drawn per call;
* ``timestep`` per-step Linears predict the future features
  z[:, t+1 .. t+timestep] from the context c_t;
* InfoNCE: log-softmax over the batch of <prediction, future> dot products,
  summed over the diagonal.

TPU-first notes: the reference runs the GRU on the variable-length prefix
``z[:, :t+1]`` with ``t < timestep/2``; a causal GRU's output at index t
only depends on steps <= t, so scanning the STATIC maximal prefix
(``timestep//2`` steps) and taking the output at the dynamic anchor is
exact, jit-friendly, and avoids both per-anchor recompilation and scanning
the full sequence.  The scan is unrolled x8 (sequential tiny GRU matmuls
are latency-bound on TPU).  The reference's CPU-tensor bug (train.py:61,68)
disappears by construction.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .common import gru_init, gru_scan, linear_init


def cpc_init(key, num_channels: int, gru_hidden_dim: int, timestep: int) -> Dict:
    kg, kw = jax.random.split(key)
    wks = jax.random.split(kw, timestep)
    return {
        "gru": gru_init(kg, num_channels, gru_hidden_dim),
        "wk": [linear_init(k, gru_hidden_dim, num_channels) for k in wks],
    }


def cpc_apply_pair(
    params: Dict,
    feats_a: jax.Array,
    feats_b: jax.Array,
    rng_a,
    rng_b,
    anchors=None,
) -> Tuple[jax.Array, jax.Array]:
    """Two independent CPC losses in one vmapped pass.

    The target and source feature batches share (B, T, C) after
    DimensionUnification, so stacking them turns two sequential T-step GRU
    scans into ONE batched scan (the scan is the latency-critical part at
    UCR sizes).  Anchors stay independent per call, and the InfoNCE softmax
    never mixes the two batches — exact semantics.
    """
    stacked = jnp.stack([feats_a, feats_b])
    rngs = jnp.stack([rng_a, rng_b])
    if anchors is None:
        losses = jax.vmap(lambda f, r: cpc_apply(params, f, r))(stacked, rngs)
    else:
        anc = jnp.stack([jnp.asarray(a, jnp.int32) for a in anchors])
        losses = jax.vmap(lambda f, r, a: cpc_apply(params, f, r, anchor=a))(
            stacked, rngs, anc
        )
    return losses[0], losses[1]


def cpc_apply(
    params: Dict, features: jax.Array, rng: jax.Array, anchor=None
) -> jax.Array:
    """InfoNCE loss; features are (B, T, C) channel-last.

    (The reference receives (B, C, T) and transposes, train.py:55-58; our
    layout is already time-major-after-batch.)  ``anchor`` overrides the
    random anchor draw — used by parity tests to pin the reference's
    ``torch.randint(timestep//2)`` draw (train.py:58) to the same value.
    """
    z = features
    b, t_len, c = z.shape
    timestep = len(params["wk"])
    hidden = params["gru"]["w_hh"].shape[0]
    t_samples = (
        jax.random.randint(rng, (), 0, timestep // 2)
        if anchor is None
        else jnp.asarray(anchor, jnp.int32)
    )

    # Future ground-truth samples z[:, t+1 .. t+timestep] -> (timestep, B, C)
    idx = t_samples + 1 + jnp.arange(timestep)
    encode_samples = jnp.take(z, idx, axis=1).transpose(1, 0, 2)

    # anchor t < timestep//2, so only the first timestep//2 GRU steps matter
    prefix = max(timestep // 2, 1)
    output = gru_scan(params["gru"], z[:, :prefix], jnp.zeros((b, hidden)))
    c_t = jnp.take(output, t_samples, axis=1)  # (B, hidden)

    pred = jnp.stack([c_t @ p["weight"] + p["bias"] for p in params["wk"]])  # (ts,B,C)
    total = jnp.einsum("sbc,sdc->sbd", encode_samples, pred)  # (ts, B, B)
    log_sm = jax.nn.log_softmax(total, axis=-1)
    nce = jnp.sum(jnp.trace(log_sm, axis1=1, axis2=2))
    return nce / (-1.0 * b * timestep)
