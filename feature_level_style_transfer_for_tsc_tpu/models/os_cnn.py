"""OS-CNN model family: omni-scale conv classifier and residual extractor.

Functional re-design of the reference modules
(`/root/reference/OS_CNN/OS_CNN.py:44-220`):

* `os_block_*`     — stack of fused masked omni-scale conv layers, each
                     conv -> BatchNorm -> (ReLU except optionally the last)
                     (reference `OS_block`, OS_CNN.py:117-139);
* `os_cnn_*`       — OS_block (all-ReLU) -> global average pool over time ->
                     Linear head; returns (logits, pooled_feature)
                     (reference `OS_CNN`, OS_CNN.py:80-110);
* `os_cnn_res_*`   — single residual layer: ReLU(OS_block(x) + Conv1x1BN(x)),
                     the shared feature extractor trunk used by GradNorm
                     (reference `OS_CNN_res`/`Res_OS_layer`, OS_CNN.py:155-220).

Layout: (B, T, C).  Each module is a (params, state) pair of pytrees; state
carries the BatchNorm running statistics so the reference's deliberate
train/eval flips become explicit `training` flags.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.batchnorm import batch_norm, init_bn_stats
from ..ops.osconv import build_os_mask, init_os_conv_params, masked_os_conv
from .common import conv1x1_init, linear, linear_init
from .structure import LayerSpec, total_out_channels


# ----------------------------------------------------------- one OS layer --

def os_layer_init(key, layer_spec: LayerSpec) -> Tuple[Dict, Dict]:
    out_ch = total_out_channels(layer_spec)
    params = {
        "conv": init_os_conv_params(key, layer_spec),
        "bn_scale": jnp.ones((out_ch,)),
        "bn_bias": jnp.zeros((out_ch,)),
    }
    state = {"bn": init_bn_stats(out_ch)}
    return params, state


def os_layer_apply(
    params: Dict,
    state: Dict,
    mask: jax.Array,
    x: jax.Array,
    training: bool,
    relu: bool,
    compute_dtype=None,
    fused_infer: bool = False,
) -> Tuple[jax.Array, Dict]:
    """``compute_dtype=jnp.bfloat16`` runs the conv (the FLOP carrier) in
    bf16 — activations/weights cast down, conv output cast back up — while
    BatchNorm statistics stay f32.  Default f32 end to end.

    ``fused_infer=True`` (eval mode only) folds the running-stat BatchNorm
    into a scale/shift epilogue executed inside the conv kernel — a NO-GRAD
    fast path for evaluation/voting (the in-loss eval-mode s2t pass must NOT
    use it: it is on the gradient path)."""
    if fused_infer and not training and compute_dtype is None:
        st = state["bn"]
        inv_scale = params["bn_scale"] * jax.lax.rsqrt(st.var + 1e-5)
        y = masked_os_conv(
            x, params["conv"]["weight"], params["conv"]["bias"], mask,
            scale=inv_scale, shift=params["bn_bias"] - st.mean * inv_scale,
            relu=relu,
        )
        return y, {"bn": st}
    if compute_dtype is not None:
        y = masked_os_conv(
            x.astype(compute_dtype),
            params["conv"]["weight"].astype(compute_dtype),
            params["conv"]["bias"].astype(compute_dtype),
            mask.astype(compute_dtype),
        ).astype(jnp.float32)
    else:
        y = masked_os_conv(x, params["conv"]["weight"], params["conv"]["bias"], mask)
    y, new_bn = batch_norm(y, params["bn_scale"], params["bn_bias"], state["bn"], training)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y, {"bn": new_bn}


# -------------------------------------------------------------- OS block ---

def os_block_masks(layer_specs: List[LayerSpec]) -> List[np.ndarray]:
    """Static masks, one per layer; kept out of params (never trained)."""
    return [build_os_mask(spec) for spec in layer_specs]


def os_block_init(key, layer_specs: List[LayerSpec]) -> Tuple[Dict, Dict]:
    keys = jax.random.split(key, len(layer_specs))
    layers = [os_layer_init(k, spec) for k, spec in zip(keys, layer_specs)]
    return (
        {"layers": [p for p, _ in layers]},
        {"layers": [s for _, s in layers]},
    )


def os_block_apply(
    params: Dict,
    state: Dict,
    masks: List[jax.Array],
    x: jax.Array,
    training: bool,
    relu_at_last: bool = True,
    compute_dtype=None,
    fused_infer: bool = False,
) -> Tuple[jax.Array, Dict]:
    new_states = []
    n = len(masks)
    for i, (p, s, m) in enumerate(zip(params["layers"], state["layers"], masks)):
        relu = True if i < n - 1 else relu_at_last
        x, ns = os_layer_apply(p, s, m, x, training, relu, compute_dtype, fused_infer)
        new_states.append(ns)
    return x, {"layers": new_states}


# ------------------------------------------------------- OS_CNN classifier -

def os_cnn_init(key, layer_specs: List[LayerSpec], n_class: int) -> Tuple[Dict, Dict]:
    kb, kh = jax.random.split(key)
    block_p, block_s = os_block_init(kb, layer_specs)
    out_ch = total_out_channels(layer_specs[-1])
    return (
        {"block": block_p, "hidden": linear_init(kh, out_ch, n_class)},
        {"block": block_s},
    )


def os_cnn_apply(
    params: Dict,
    state: Dict,
    masks: List[jax.Array],
    x: jax.Array,
    training: bool,
    few_shot: bool = False,
    compute_dtype=None,
    fused_infer: bool = False,
) -> Tuple[jax.Array, jax.Array, Dict]:
    """Returns (logits, pooled_feature, new_state) — reference OS_CNN.forward.

    ``few_shot=True`` skips the Linear head and returns the pooled feature
    in both slots (reference OS_CNN.py:82,106-108).
    """
    y, new_block = os_block_apply(
        params["block"], state["block"], masks, x, training, True, compute_dtype,
        fused_infer,
    )
    pooled = jnp.mean(y, axis=1)  # AdaptiveAvgPool1d(1) over time
    logits = pooled if few_shot else linear(params["hidden"], pooled)
    return logits, pooled, {"block": new_block}


def os_cnn_head(params: Dict, pooled: jax.Array) -> jax.Array:
    """The bare Linear head, used directly for the s2t2s path
    (reference train_and_test.py:598 uses ``source_classification_module.hidden``)."""
    return linear(params["hidden"], pooled)


# -------------------------------------------- OS_CNN_res feature extractor -

def os_cnn_res_init(key, layer_specs: List[LayerSpec]) -> Tuple[Dict, Dict]:
    kb, kr = jax.random.split(key)
    block_p, block_s = os_block_init(kb, layer_specs)
    out_ch = total_out_channels(layer_specs[-1])
    in_ch = layer_specs[0][0][0]
    params = {
        "block": block_p,
        "res": conv1x1_init(kr, in_ch, out_ch),
        "res_bn_scale": jnp.ones((out_ch,)),
        "res_bn_bias": jnp.zeros((out_ch,)),
    }
    state = {"block": block_s, "res_bn": init_bn_stats(out_ch)}
    return params, state


def os_cnn_res_apply(
    params: Dict,
    state: Dict,
    masks: List[jax.Array],
    x: jax.Array,
    training: bool,
    compute_dtype=None,
    fused_infer: bool = False,
) -> Tuple[jax.Array, Dict]:
    """ReLU(OS_block(x, no final relu) + BN(Conv1x1(x))) — Res_OS_layer."""
    main, new_block = os_block_apply(
        params["block"], state["block"], masks, x, training,
        relu_at_last=False, compute_dtype=compute_dtype, fused_infer=fused_infer,
    )
    shortcut = x @ params["res"]["weight"] + params["res"]["bias"]
    shortcut, new_res_bn = batch_norm(
        shortcut, params["res_bn_scale"], params["res_bn_bias"], state["res_bn"], training
    )
    out = jnp.maximum(main + shortcut, 0.0)
    return out, {"block": new_block, "res_bn": new_res_bn}


def os_cnn_res_trunk(params: Dict) -> Dict:
    """The GradNorm shared-trunk parameter subtree.

    Reference `return_last_layer` returns ``self.net_1.net`` — the OS_block
    *excluding* the 1x1 shortcut (OS_CNN.py:219-220).
    """
    return params["block"]
