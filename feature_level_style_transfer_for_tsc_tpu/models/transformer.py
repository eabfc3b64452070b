"""Sequence-transformer domain discriminator (CoDATS / SLARDA baselines).

Functional re-design of `/root/reference/Comparison/SLARDA/models.py:6-141`
and `/root/reference/Comparison/CoDATS/discriminator.py:13-150`:

* the input feature map is reshaped to (B, n_patches, patch_size);
* a linear patch embedding + prepended CLS token feed a pre-norm transformer
  (depth x [Attention, FeedForward], residual connections, GELU MLP);
* the CLS output goes through a Linear head: 1 unit for SLARDA's binary
  critic, ``num_class`` units for CoDATS's 4-way domain classifier;
* CoDATS additionally applies a fixed-coefficient (1.2) gradient reversal on
  the input (discriminator.py:25-33); SLARDA does not.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grl import gradient_reversal
from .common import dropout, layer_norm, layer_norm_init, linear, linear_init


def _linear_no_bias_init(key, in_f, out_f):
    bound = 1.0 / np.sqrt(in_f)
    return {"weight": jax.random.uniform(key, (in_f, out_f), minval=-bound, maxval=bound)}


def seq_transformer_init(key, patch_size: int, dim: int, depth: int, heads: int, mlp_dim: int) -> Dict:
    keys = jax.random.split(key, 2 + 4 * depth)
    params: Dict = {
        "patch_embed": linear_init(keys[0], patch_size, dim),
        "cls_token": jax.random.normal(keys[1], (1, 1, dim)),
        "layers": [],
    }
    for i in range(depth):
        k_attn, k_out, k_ff1, k_ff2 = jax.random.split(keys[2 + i], 4)
        params["layers"].append(
            {
                "attn_norm": layer_norm_init(dim),
                "qkv": _linear_no_bias_init(k_attn, dim, 3 * dim),
                "attn_out": linear_init(k_out, dim, dim),
                "ff_norm": layer_norm_init(dim),
                "ff1": linear_init(k_ff1, dim, mlp_dim),
                "ff2": linear_init(k_ff2, mlp_dim, dim),
            }
        )
    return params


def _attention(layer: Dict, x: jax.Array, heads: int) -> jax.Array:
    b, n, d = x.shape
    qkv = x @ layer["qkv"]["weight"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = d // heads
    q = q.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)
    # Reference scale: dim ** -0.5 over the FULL dim, not per-head
    # (SLARDA models.py:64 / CoDATS discriminator.py:75).
    dots = jnp.einsum("bhid,bhjd->bhij", q, k) * (d ** -0.5)
    attn = jax.nn.softmax(dots, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
    return linear(layer["attn_out"], out)


def seq_transformer_apply(
    params: Dict,
    x: jax.Array,
    heads: int,
    *,
    training: bool = False,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """(B, n_patches, patch_size) -> CLS feature (B, dim)."""
    b = x.shape[0]
    h = linear(params["patch_embed"], x)
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, h.shape[-1]))
    h = jnp.concatenate([cls, h], axis=1)
    for layer in params["layers"]:
        h = h + _attention(layer, layer_norm(layer["attn_norm"], h), heads)
        ff_in = layer_norm(layer["ff_norm"], h)
        ff = jax.nn.gelu(linear(layer["ff1"], ff_in))
        if training and dropout_rate > 0 and rng is not None:
            rng, dk = jax.random.split(rng)
            ff = dropout(dk, ff, dropout_rate, training)
        h = h + linear(layer["ff2"], ff)
    return h[:, 0]


def discriminator_att_init(
    key, patch_size: int, att_hid_dim: int, depth: int, heads: int, mlp_dim: int,
    num_class: int = 1,
) -> Dict:
    kt, kd = jax.random.split(key)
    return {
        "transformer": seq_transformer_init(kt, patch_size, att_hid_dim, depth, heads, mlp_dim),
        "head": linear_init(kd, att_hid_dim, num_class),
    }


def discriminator_att_apply(
    params: Dict,
    x: jax.Array,
    patch_size: int,
    heads: int,
    *,
    grl: Optional[float] = None,
) -> jax.Array:
    """Domain output from a feature map.

    x: (B, T, C) feature map, flattened then re-patched at ``patch_size``
    exactly like the reference's ``input.view(B, -1, patch_size)``.
    ``grl=1.2`` reproduces CoDATS (discriminator.py:27-28); ``grl=None``
    reproduces SLARDA (no reversal).
    """
    if grl is not None:
        x = gradient_reversal(x, jnp.asarray(grl, x.dtype))
    b = x.shape[0]
    # Reference flattens (B, C, T) row-major: patches traverse each channel's
    # time series in order.  Our layout is (B, T, C) so transpose first.
    flat = jnp.swapaxes(x, 1, 2).reshape(b, -1, patch_size)
    feat = seq_transformer_apply(params["transformer"], flat, heads)
    return linear(params["head"], feat)
