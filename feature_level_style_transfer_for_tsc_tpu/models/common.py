"""Shared functional NN primitives with torch-default-parity initializers.

All modules in this framework are plain pytrees of arrays plus pure apply
functions — no mutable module objects.  Initialization reproduces torch's
defaults so the rebuilt models start from the same distribution family as
the reference:

* ``nn.Linear`` / ``nn.Conv1d``: weight and bias ~ U(-1/sqrt(fan_in), +...)
  (kaiming_uniform(a=sqrt(5)) reduces to exactly that bound).
* ``nn.LSTM`` / ``nn.GRU``: every weight/bias ~ U(-1/sqrt(hidden), +...).

Layout is channel-last throughout: sequences are (B, T, C).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


# ---------------------------------------------------------------- Linear ----

def linear_init(key, in_features: int, out_features: int) -> Dict:
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_features)
    return {
        "weight": uniform(kw, (in_features, out_features), bound),
        "bias": uniform(kb, (out_features,), bound),
    }


def linear(params: Dict, x: jax.Array) -> jax.Array:
    return x @ params["weight"] + params["bias"]


def xavier_normal_linear_init(key, in_features: int, out_features: int) -> Dict:
    """torch ``xavier_normal_`` weight + zero bias (widgets.py:83-91)."""
    std = np.sqrt(2.0 / (in_features + out_features))
    return {
        "weight": std * jax.random.normal(key, (in_features, out_features)),
        "bias": jnp.zeros((out_features,)),
    }


# ------------------------------------------------------------ 1x1 conv -----

def conv1x1_init(key, in_ch: int, out_ch: int, bias: bool = True) -> Dict:
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_ch)
    p = {"weight": uniform(kw, (in_ch, out_ch), bound)}
    if bias:
        p["bias"] = uniform(kb, (out_ch,), bound)
    return p


def conv1x1(params: Dict, x: jax.Array) -> jax.Array:
    """Pointwise conv over the channel (last) axis of (B, T, C)."""
    y = x @ params["weight"]
    if "bias" in params:
        y = y + params["bias"]
    return y


# ----------------------------------------------------------- weight norm ---

def weight_norm_init(key, shape_kio: Tuple[int, ...]) -> Dict:
    """Weight-normalized conv weight, torch ``weight_norm(conv, 'weight')``.

    ``shape_kio`` is (K, C_in, C_out); the norm is taken per *output* channel
    (torch dim=0 on an (out, in, K) tensor).  v is initialized like the plain
    conv weight and g to ||v|| so the initial effective weight matches.
    """
    k, c_in, _ = shape_kio
    bound = 1.0 / np.sqrt(c_in * k)
    v = uniform(key, shape_kio, bound)
    g = jnp.sqrt(jnp.sum(v * v, axis=(0, 1)))  # (C_out,)
    return {"v": v, "g": g}


def weight_norm_weight(params: Dict) -> jax.Array:
    v, g = params["v"], params["g"]
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True))
    return v * (g / jnp.maximum(norm, 1e-12))


# ------------------------------------------------------- recurrent cells ---

def lstm_init(key, input_size: int, hidden_size: int) -> Dict:
    ks = jax.random.split(key, 4)
    bound = 1.0 / np.sqrt(hidden_size)
    return {
        "w_ih": uniform(ks[0], (input_size, 4 * hidden_size), bound),
        "w_hh": uniform(ks[1], (hidden_size, 4 * hidden_size), bound),
        "b_ih": uniform(ks[2], (4 * hidden_size,), bound),
        "b_hh": uniform(ks[3], (4 * hidden_size,), bound),
    }


def lstm_cell(params: Dict, x, h, c):
    """Torch gate order: input, forget, cell(g), output."""
    hid = h.shape[-1]
    z = x @ params["w_ih"] + params["b_ih"] + h @ params["w_hh"] + params["b_hh"]
    i = jax.nn.sigmoid(z[..., 0 * hid : 1 * hid])
    f = jax.nn.sigmoid(z[..., 1 * hid : 2 * hid])
    g = jnp.tanh(z[..., 2 * hid : 3 * hid])
    o = jax.nn.sigmoid(z[..., 3 * hid : 4 * hid])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def gru_init(key, input_size: int, hidden_size: int) -> Dict:
    ks = jax.random.split(key, 4)
    bound = 1.0 / np.sqrt(hidden_size)
    return {
        "w_ih": uniform(ks[0], (input_size, 3 * hidden_size), bound),
        "w_hh": uniform(ks[1], (hidden_size, 3 * hidden_size), bound),
        "b_ih": uniform(ks[2], (3 * hidden_size,), bound),
        "b_hh": uniform(ks[3], (3 * hidden_size,), bound),
    }


def gru_cell(params: Dict, x, h):
    """Torch gate order: reset, update, new."""
    hid = h.shape[-1]
    gi = x @ params["w_ih"] + params["b_ih"]
    gh = h @ params["w_hh"] + params["b_hh"]
    r = jax.nn.sigmoid(gi[..., :hid] + gh[..., :hid])
    z = jax.nn.sigmoid(gi[..., hid : 2 * hid] + gh[..., hid : 2 * hid])
    n = jnp.tanh(gi[..., 2 * hid :] + r * gh[..., 2 * hid :])
    return (1 - z) * n + z * h


def gru_scan(params: Dict, xs: jax.Array, h0: jax.Array, unroll: int = 8) -> jax.Array:
    """Run a GRU over (B, T, C) returning all hidden states (B, T, H).

    Unrolled: each scan iteration's matmuls are tiny, so sequential-dispatch
    latency dominates on TPU without unrolling.
    """

    def step(h, x_t):
        h_new = gru_cell(params, x_t, h)
        return h_new, h_new

    _, hs = jax.lax.scan(
        step, h0, jnp.swapaxes(xs, 0, 1), unroll=min(unroll, xs.shape[1])
    )
    return jnp.swapaxes(hs, 0, 1)


# ----------------------------------------------------------------- misc ----

def dropout(key, x: jax.Array, rate: float, training: bool) -> jax.Array:
    if not training or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def layer_norm(params: Dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * params["scale"] + params["bias"]


def layer_norm_init(dim: int) -> Dict:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}
