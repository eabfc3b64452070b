"""Cross-domain adapters: DimensionUnification, ProbTransfer, NoiseTransfer.

Functional re-design of `/root/reference/widgets.py:46-78,136-167`.  The
reference's mutable running buffers (NoiseTransfer) become explicit state
pytrees threaded through each train step.

Layout: sequence features are (B, T, C); pooled features are (B, C).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .common import conv1x1, conv1x1_init, linear_init, lstm_cell, lstm_init


# ------------------------------------------------- DimensionUnification ----

def dimension_unification_init(
    key, source_channel: int, target_channel: int, source_length: int, target_length: int
) -> Dict:
    kl, kc = jax.random.split(key)
    return {
        "length": linear_init(kl, source_length, target_length),
        "channel": conv1x1_init(kc, source_channel, target_channel),
    }


def dimension_unification_apply(params: Dict, x: jax.Array) -> jax.Array:
    """(B, T_s, C_s) -> (B, T_t, C_t): Linear over time -> ReLU -> 1x1 conv
    over channels -> ReLU (reference widgets.py:66-78, which applies the
    Linear to the last axis of a (B, C, T) tensor — i.e. the time axis)."""
    y = jnp.einsum("bsc,st->btc", x, params["length"]["weight"]) + params["length"]["bias"][
        None, :, None
    ]
    y = jnp.maximum(y, 0.0)
    y = conv1x1(params["channel"], y)
    return jnp.maximum(y, 0.0)


# --------------------------------------------------------- ProbTransfer ----

def prob_transfer_init(key, num_channels: int) -> Dict:
    return {"lstm": lstm_init(key, num_channels, num_channels)}


def prob_transfer_apply(params: Dict, pooled: jax.Array) -> jax.Array:
    """Feed the pooled feature through an LSTM twice, return final hidden
    state (reference widgets.py:46-55: the same vector is concatenated as a
    2-step sequence)."""
    b, c = pooled.shape
    h = jnp.zeros((b, c))
    cell = jnp.zeros((b, c))
    for _ in range(2):
        h, cell = lstm_cell(params["lstm"], pooled, h, cell)
    return h


# -------------------------------------------------------- NoiseTransfer ----

class NoiseTransferState(NamedTuple):
    """Running noise-space averages (reference widgets.py:142-151 buffers).

    Averages are stored channel-last (T, C); counters are scalars.
    """

    target_avg: jax.Array  # (T, C)
    source_avg: jax.Array  # (T, C)
    time: jax.Array  # int32 scalar, number of forward calls so far
    cal_num_target: jax.Array  # int32 scalar, samples accumulated
    cal_num_source: jax.Array


def noise_transfer_init(
    key, noise_channel: int, length_of_noise: int
) -> Tuple[Dict, NoiseTransferState]:
    params = {"conv": conv1x1_init(key, noise_channel, noise_channel)}
    zeros = jnp.zeros((length_of_noise, noise_channel))
    state = NoiseTransferState(
        target_avg=zeros,
        source_avg=zeros,
        time=jnp.zeros((), jnp.int32),
        cal_num_target=jnp.zeros((), jnp.int32),
        cal_num_source=jnp.zeros((), jnp.int32),
    )
    return params, state


def noise_transfer_apply(
    params: Dict,
    state: NoiseTransferState,
    target_noise: jax.Array,
    source_noise: jax.Array,
) -> Tuple[jax.Array, NoiseTransferState]:
    """Style-transfer mixer (reference widgets.py:152-167).

    Update rule parity: the first call adds the plain batch mean; later calls
    add ``batch/cal_num_so_far * mean(batch)`` (a growing, never-renormalized
    accumulator — replicated exactly).  Gradients flow through the *current*
    batch's contribution into the flow/extractors, and the stored averages
    are detached at the end of each call (reference :165-166).
    """
    b_t = target_noise.shape[0]
    b_s = source_noise.shape[0]
    first = state.time == 0
    coef_t = jnp.where(
        first, 1.0, b_t / jnp.maximum(state.cal_num_target.astype(jnp.float32), 1.0)
    )
    coef_s = jnp.where(
        first, 1.0, b_s / jnp.maximum(state.cal_num_source.astype(jnp.float32), 1.0)
    )
    target_avg = state.target_avg + coef_t * jnp.mean(target_noise, axis=0)
    source_avg = state.source_avg + coef_s * jnp.mean(source_noise, axis=0)
    delta = conv1x1(params["conv"], target_avg - source_avg)
    delta = jax.nn.selu(delta)
    new_state = NoiseTransferState(
        target_avg=jax.lax.stop_gradient(target_avg),
        source_avg=jax.lax.stop_gradient(source_avg),
        time=state.time + 1,
        cal_num_target=state.cal_num_target + b_t,
        cal_num_source=state.cal_num_source + b_s,
    )
    return delta[None] + source_noise, new_state
