"""Simplified-WaveGlow normalizing flow — the style-transfer engine.

Functional re-design of `/root/reference/Simplified_NF_WaveGlow.py`:

* `inv1x1_*`    — invertible 1x1 channel mixing, initialized to a random
                  rotation with det +1 (reference :8-42).  The inverse is
                  computed from the *current* weight on every call — this
                  deliberately fixes the reference's stale ``W_inverse``
                  cache (:29-35), which never invalidates after training.
* `wn_*`        — the WaveNet-like coupling network: weight-normed start,
                  8 dilated convs (kernel 3, dilation 2^i) with the fused
                  tanh×sigmoid gate, res/skip 1x1s, zero-init end conv
                  (reference :55-123).  NOTE the cond_layer is fed the SAME
                  input as the main branch (self-conditioning, :107) —
                  replicated exactly.
* `waveglow_*`  — n_flows stacked (inv1x1 -> split -> affine coupling), with
                  forward (density) and infer (synthesis) directions
                  (reference :125-203), plus the NLL (reference :223-241).

Layout: (B, T, C); channel split along the last axis.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.coupling import affine_coupling_forward, affine_coupling_inverse
from ..ops.gate import fused_add_tanh_sigmoid_multiply
from ..ops.osconv import _conv_im2col, conv_impl, tap_conv
from .common import conv1x1, weight_norm_init, weight_norm_weight


# --------------------------------------------------------------- inv 1x1 ---

def inv1x1_init(key, channels: int) -> Dict:
    """Random orthonormal W with det +1 via QR (reference :17-22)."""
    w = np.linalg.qr(jax.device_get(jax.random.normal(key, (channels, channels))))[0]
    if np.linalg.det(w) < 0:
        w[:, 0] = -w[:, 0]
    return {"weight": jnp.asarray(w, jnp.float32)}


def inv1x1_forward(params: Dict, z: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Returns (Wz, log_det = B*T*logdet(W)).  torch conv1d with weight
    (C_out, C_in, 1) maps to ``z @ W.T`` in channel-last layout.

    DOCUMENTED FIX vs the reference: we use ``slogdet`` -> log|det W|, the
    correct change-of-variables term.  The reference's ``torch.logdet``
    (Simplified_NF_WaveGlow.py:40) returns NaN once training drives
    det(W) < 0 (init is det +1 but nothing constrains the sign), after which
    its flow NLL is NaN for the rest of the run — observed in the reference's
    own full-length run on synthetic data (experiments/parity_fullscale.py:
    t_nf_loss goes NaN at NF-pretrain epoch 3 and never recovers).  The
    gradient of log|det| equals torch's logdet gradient (W^-T) wherever the
    latter is defined, so training dynamics match while det stays positive."""
    w = params["weight"]
    b, t, _ = z.shape
    _, logdet = jnp.linalg.slogdet(w)
    # HIGHEST precision: invertibility must hold to f32, and the CxC matmul
    # is tiny; default (bf16-multiply) precision breaks round-trips at ~1e-2.
    y = jnp.matmul(z, w.T, precision=jax.lax.Precision.HIGHEST)
    return y, b * t * logdet


def inv1x1_inverse(params: Dict, z: jax.Array) -> jax.Array:
    w_inv = jnp.linalg.inv(params["weight"])
    return jnp.matmul(z, w_inv.T, precision=jax.lax.Precision.HIGHEST)


# --------------------------------------------------------------------- WN --

def wn_init(
    key, n_in_channels: int, n_layers: int, n_channels: int, kernel_size: int = 3
) -> Dict:
    keys = jax.random.split(key, 2 + 2 * n_layers)
    params: Dict = {
        "start": weight_norm_init(keys[0], (1, n_in_channels, n_channels)),
        "cond": weight_norm_init(keys[1], (1, n_in_channels, 2 * n_channels * n_layers)),
        # Zero-init end conv so couplings start as identity (reference :75-78).
        "end": {
            "weight": jnp.zeros((n_channels, 2 * n_in_channels)),
            "bias": jnp.zeros((2 * n_in_channels,)),
        },
        "in_layers": [],
        "res_skip_layers": [],
    }
    for i in range(n_layers):
        params["in_layers"].append(
            weight_norm_init(keys[2 + 2 * i], (kernel_size, n_channels, 2 * n_channels))
        )
        res_skip_ch = 2 * n_channels if i < n_layers - 1 else n_channels
        params["res_skip_layers"].append(
            weight_norm_init(keys[3 + 2 * i], (1, n_channels, res_skip_ch))
        )
    # Start/cond convs have no bias terms in weight_norm_init; torch keeps
    # the conv's bias un-normalized.  Add them (zero-free torch init).
    kb = jax.random.split(key, 5)
    bound_start = 1.0 / np.sqrt(n_in_channels)
    params["start"]["bias"] = jax.random.uniform(
        kb[2], (n_channels,), minval=-bound_start, maxval=bound_start
    )
    params["cond"]["bias"] = jax.random.uniform(
        kb[3], (2 * n_channels * n_layers,), minval=-bound_start, maxval=bound_start
    )
    bound_rs = 1.0 / np.sqrt(n_channels)
    in_bound = 1.0 / np.sqrt(n_channels * kernel_size)
    bks = jax.random.split(kb[4], 2 * n_layers)
    for i in range(n_layers):
        params["in_layers"][i]["bias"] = jax.random.uniform(
            bks[2 * i], (2 * n_channels,), minval=-in_bound, maxval=in_bound
        )
        res_skip_ch = 2 * n_channels if i < n_layers - 1 else n_channels
        params["res_skip_layers"][i]["bias"] = jax.random.uniform(
            bks[2 * i + 1], (res_skip_ch,), minval=-bound_rs, maxval=bound_rs
        )
    return params


def _dilated_conv_same(x: jax.Array, w: jax.Array, bias: jax.Array, dilation: int) -> jax.Array:
    """Kernel-3 dilated "same" conv, channel-last (reference :84-89 padding).

    Formulation switched by ops.osconv.conv_impl() (default "conv" — all
    three measured within noise of each other per-layer, docs/DESIGN.md;
    the real fix is the fused whole-net kernel, ops/wn_fused.py):
      * "pallas": ops.osconv.tap_conv — collapsed-batch rolled-matmul
        Pallas kernel with a hand-written VJP;
      * "im2col": unfold + one dot_general (clean batched gemm under vmap,
        but materializes the k-times-unfolded activations in HBM);
      * "conv": the conv primitive — vmap lowers it to an MXU-hostile
        grouped convolution."""
    k = w.shape[0]
    pad = (k * dilation - dilation) // 2
    impl = conv_impl()
    if impl == "pallas":
        x_pad = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(pad, pad), (0, 0)])
        return tap_conv(x_pad, w, dilation) + bias
    if impl == "im2col":
        x_pad = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(pad, pad), (0, 0)])
        return _conv_im2col(x_pad, w, dilation) + bias
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype,
    )
    return y + bias


def wn_fused_enabled() -> bool:
    """Use the single-kernel fused WN (ops/wn_fused.py) on the TPU f32 path.
    The WN stack is the pipeline's hottest module and its XLA lowering is
    per-op-overhead-bound (docs/DESIGN.md); the fused kernel executes all 8
    layers in one pallas_call.  Read per call so tests/experiments can flip."""
    import os

    return os.environ.get("FLSTTSC_WN_FUSED", "1") not in ("0", "false", "False")


def wn_apply(
    params: Dict, x: jax.Array, n_channels: int, dilated_conv=None,
) -> jax.Array:
    """The coupling network: x (B, T, n_half) -> (B, T, 2*n_half).

    ``dilated_conv(x, w, bias, dilation)`` overrides the dilated-conv
    primitive — parallel/sequence.py substitutes a halo-exchange conv to run
    this net over a time-sharded mesh axis.
    """
    if dilated_conv is None:
        from ..ops import use_pallas
        from ..ops.wn_fused import wn_apply_fused

        if (
            x.dtype == jnp.float32
            and use_pallas()
            and wn_fused_enabled()
            and params["in_layers"][0]["v"].shape[0] == 3  # kernel-3 geometry
        ):
            return wn_apply_fused(params, x, n_channels, weight_norm_weight)
        dilated_conv = _dilated_conv_same
    n_layers = len(params["in_layers"])
    audio = conv1x1(
        {"weight": weight_norm_weight(params["start"])[0], "bias": params["start"]["bias"]}, x
    )
    spect = conv1x1(
        {"weight": weight_norm_weight(params["cond"])[0], "bias": params["cond"]["bias"]}, x
    )
    output = jnp.zeros_like(audio)
    for i in range(n_layers):
        w_in = weight_norm_weight(params["in_layers"][i])
        in_act = dilated_conv(audio, w_in, params["in_layers"][i]["bias"], 2 ** i)
        off = i * 2 * n_channels
        acts = fused_add_tanh_sigmoid_multiply(
            in_act, spect[..., off : off + 2 * n_channels], n_channels
        )
        w_rs = weight_norm_weight(params["res_skip_layers"][i])[0]
        res_skip = acts @ w_rs + params["res_skip_layers"][i]["bias"]
        if i < n_layers - 1:
            audio = audio + res_skip[..., :n_channels]
            output = output + res_skip[..., n_channels:]
        else:
            output = output + res_skip
    return output @ params["end"]["weight"] + params["end"]["bias"]


# --------------------------------------------------------------- WaveGlow --

def waveglow_init(
    key, n_flows: int, n_group: int, n_channels_for_wn: int, n_wn_layers: int = 8
) -> Dict:
    """Reference WaveGlow(3, C_feat, 120) with 8-layer WN (reference :125-146)."""
    assert n_group % 2 == 0, "n_group must be even (reference :131)"
    n_half = n_group // 2
    keys = jax.random.split(key, 2 * n_flows)
    return {
        "convinv": [inv1x1_init(keys[2 * k], n_group) for k in range(n_flows)],
        "wn": [
            wn_init(keys[2 * k + 1], n_half, n_wn_layers, n_channels_for_wn)
            for k in range(n_flows)
        ],
    }


def _soft_clamp(log_s: jax.Array, cap: float) -> jax.Array:
    """Glow-style soft clamp ``cap * tanh(log_s / cap)`` — smooth, odd, and
    identity-like near 0; bounds |log_s| <= cap so exp(log_s) can't explode
    during the early-phase-5 transient.  cap=0 disables (reference exact)."""
    return cap * jnp.tanh(log_s / cap) if cap else log_s


def waveglow_forward(
    params: Dict, x: jax.Array, n_wn_ch: int, log_s_clamp: float = 0.0,
) -> Tuple[jax.Array, List[jax.Array], List[jax.Array]]:
    """Density direction: features -> noise (reference :148-181).

    Returns (z, log_s_list, log_det_w_list) exactly like the reference so
    the loss and the NoiseTransfer consume the same triple.
    """
    n_flows = len(params["convinv"])
    log_s_list, log_det_w_list = [], []
    audio = x
    for k in range(n_flows):
        audio, log_det_w = inv1x1_forward(params["convinv"][k], audio)
        log_det_w_list.append(log_det_w)
        n_half = audio.shape[-1] // 2
        audio_0, audio_1 = audio[..., :n_half], audio[..., n_half:]
        output = wn_apply(params["wn"][k], audio_0, n_wn_ch)
        # NOTE reference order: b first, log_s second (:172-173).
        b = output[..., :n_half]
        log_s = _soft_clamp(output[..., n_half:], log_s_clamp)
        audio_1, _ = affine_coupling_forward(audio_1, log_s, b)
        log_s_list.append(log_s)
        audio = jnp.concatenate([audio_0, audio_1], axis=-1)
    return audio, log_s_list, log_det_w_list


def waveglow_forward_pair(
    params: Dict, x_a: jax.Array, x_b: jax.Array, n_wn_ch: int,
    log_s_clamp: float = 0.0,
):
    """Run the density direction on two batches in ONE pass.

    Flow ops are strictly per-sample, so concatenating the target and source
    feature batches is exact and halves the kernel count while doubling the
    matmul batch (better MXU utilization at UCR batch sizes).  Returns the
    two (z, log_s_list, log_det_w_list) triples with per-batch logdets
    (``log_det_W = B*T*logdet(W)`` must use each batch's own B).
    """
    ba, bb = x_a.shape[0], x_b.shape[0]
    t = x_a.shape[1]
    z, log_s_list, log_det_list = waveglow_forward(
        params, jnp.concatenate([x_a, x_b], axis=0), n_wn_ch, log_s_clamp,
    )
    z_a, z_b = z[:ba], z[ba:]
    ls_a = [ls[:ba] for ls in log_s_list]
    ls_b = [ls[ba:] for ls in log_s_list]
    # rescale the combined (ba+bb)*T*logdet to each batch's share
    ld_a = [ld * (ba / (ba + bb)) for ld in log_det_list]
    ld_b = [ld * (bb / (ba + bb)) for ld in log_det_list]
    return (z_a, ls_a, ld_a), (z_b, ls_b, ld_b)


def waveglow_infer(
    params: Dict, noise: jax.Array, n_wn_ch: int, sigma: float = 1.0,
    log_s_clamp: float = 0.0,
) -> jax.Array:
    """Synthesis direction: noise -> features (reference :183-203)."""
    n_flows = len(params["convinv"])
    audio = noise
    for k in reversed(range(n_flows)):
        n_half = audio.shape[-1] // 2
        audio_0, audio_1 = audio[..., :n_half], audio[..., n_half:]
        output = wn_apply(params["wn"][k], audio_0, n_wn_ch)
        b = output[..., :n_half]
        s = _soft_clamp(output[..., n_half:], log_s_clamp)
        audio_1 = affine_coupling_inverse(audio_1, s, b)
        audio = jnp.concatenate([audio_0, audio_1], axis=-1)
        audio = inv1x1_inverse(params["convinv"][k], audio)
    return audio


def waveglow_loss(
    model_output: Tuple[jax.Array, List[jax.Array], List[jax.Array]], sigma: float = 1.0
) -> jax.Array:
    """WaveGlow NLL (reference WaveGlowLoss, :223-241)."""
    z, log_s_list, log_det_w_list = model_output
    log_s_total = sum(jnp.sum(ls) for ls in log_s_list)
    log_det_w_total = sum(log_det_w_list)
    loss = jnp.sum(z * z) / (2 * sigma * sigma) - log_s_total - log_det_w_total
    return loss / (z.shape[0] * z.shape[1] * z.shape[2])
