"""Masked omni-scale conv1d — the OS-CNN backbone op.

The reference emulates N parallel conv1d branches with different prime kernel
sizes as ONE conv at the layer's largest kernel size whose weight is
multiplied by a centered zero-mask on every forward
(`/root/reference/OS_CNN/OS_CNN.py:14-77`).  Same design here, TPU-first:

* channel-last layout ``x: (B, T, C_in) -> (B, T, C_out)`` so the channel dim
  rides the 128-wide lanes;
* the mask is a static constant — masking is one elementwise multiply on the
  (tiny) weight, fused by XLA;
* "same" padding is asymmetric ``((K-1)//2, K//2)`` (reference OS_CNN.py:59);
* the Pallas forward kernel keeps each batch element's full time axis
  resident in VMEM (UCR/UEA activations are small) and issues chunked
  shifted-window matmuls on the MXU — zero HBM round-trips between taps.
  The backward pass is expressed with XLA convs via a custom VJP.

Weight layout: ``(K, C_in, C_out)`` ("WIO").
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_interpret, use_pallas
from ..structure import LayerSpec, mask_bounds


def build_os_mask(layer_spec: LayerSpec) -> np.ndarray:
    """(K, 1, C_out) zero/one mask, one centered band per branch.

    Parity with reference ``creat_mask``/``creak_layer_mask``
    (OS_CNN.py:15-41): branch b with kernel size k keeps taps
    ``[left, left+k)`` where left/right come from ``calculate_mask_index``.
    """
    largest = layer_spec[-1][-1]
    cols = []
    for (_, out_ch, k) in layer_spec:
        band = np.zeros((largest, 1, out_ch), np.float32)
        lo, hi = mask_bounds(k, largest)
        band[lo:hi] = 1.0
        cols.append(band)
    return np.concatenate(cols, axis=-1)


def init_os_conv_params(key: jax.Array, layer_spec: LayerSpec, dtype=jnp.float32) -> dict:
    """Kaiming-uniform init per branch placed into its mask band.

    Mirrors the reference, which initializes each branch as an independent
    torch Conv1d then embeds it at its mask offsets (OS_CNN.py:26-41).
    Torch's Conv1d default init is kaiming_uniform(a=sqrt(5)) for weights and
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for bias.
    """
    largest = layer_spec[-1][-1]
    in_ch = layer_spec[0][0]
    keys = jax.random.split(key, 2 * len(layer_spec))
    w_cols, b_cols = [], []
    for i, (_, out_ch, k) in enumerate(layer_spec):
        fan_in = in_ch * k
        gain = np.sqrt(2.0 / (1 + 5.0))  # kaiming_uniform with a=sqrt(5)
        bound_w = gain * np.sqrt(3.0 / fan_in)
        w = jax.random.uniform(
            keys[2 * i], (k, in_ch, out_ch), dtype, minval=-bound_w, maxval=bound_w
        )
        big = jnp.zeros((largest, in_ch, out_ch), dtype)
        lo, hi = mask_bounds(k, largest)
        big = big.at[lo:hi].set(w)
        bound_b = 1.0 / np.sqrt(fan_in)
        b = jax.random.uniform(
            keys[2 * i + 1], (out_ch,), dtype, minval=-bound_b, maxval=bound_b
        )
        w_cols.append(big)
        b_cols.append(b)
    return {
        "weight": jnp.concatenate(w_cols, axis=-1),
        "bias": jnp.concatenate(b_cols, axis=-1),
    }


def conv_impl() -> str:
    """Which formulation the flow's dilated convs use: "pallas" (tap_conv —
    collapsed-batch rolled-matmul kernel, hand-written VJP), "conv"
    (conv_general_dilated), or "im2col" (static-slice unfold + ONE
    dot_general).

    All three are mathematically identical; they differ in lowering.  The
    conv primitive under `jax.vmap` with a mapped (per-run) weight axis —
    the train/multirun.py regime — lowers to a grouped convolution the TPU
    backend serializes; im2col stays a clean batched gemm but materializes
    the k-times-unfolded activations in HBM.  The Pallas tap kernel keeps
    taps VMEM-resident and vmaps into one extra grid dimension (measured:
    results_vmap_flow_internals.json).  Read per call (like use_pallas())
    so experiments can flip it.
    """
    return os.environ.get("FLSTTSC_CONV_IMPL", "conv")


def unfold1d(x_pad: jax.Array, k: int, dilation: int = 1) -> jax.Array:
    """im2col for conv1d: (..., T_pad, C) -> (..., T_out, k, C) via k static
    slices (their transpose under autodiff is k pad+adds — no scatter)."""
    t_pad = x_pad.shape[-2]
    t_out = t_pad - (k - 1) * dilation
    cols = [
        jax.lax.slice_in_dim(x_pad, j * dilation, j * dilation + t_out, axis=-2)
        for j in range(k)
    ]
    return jnp.stack(cols, axis=-2)


def _conv_im2col(x_pad: jax.Array, w: jax.Array, dilation: int = 1) -> jax.Array:
    u = unfold1d(x_pad, w.shape[0], dilation)  # (..., T_out, k, C_in)
    return jnp.einsum(
        "...tki,kio->...to", u, w, preferred_element_type=x_pad.dtype
    )


def _conv_xla(x_pad: jax.Array, w: jax.Array) -> jax.Array:
    if conv_impl() == "im2col":
        return _conv_im2col(x_pad, w)
    return jax.lax.conv_general_dilated(
        x_pad,
        w,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x_pad.dtype,
    )


# ------------------------------------------------------------- tap conv ---
#
# Kernel-k dilation-d conv as k "taps": y[t'] = sum_j x_pad[t' + j*d] @ w[j].
# Built for the flow's WaveNet coupling convs (models/flow.py — kernel 3,
# dilations 1..128), whose XLA lowering is HBM/overhead-bound at UCR shapes
# and collapses under vmapped per-run weights (train/multirun.py):
# results_vmap_flow_internals.json.
#
# TPU formulation: COLLAPSE the batch into the row axis — x2 = reshape(
# (B, t_pad, C) -> (B*t_pad, C)) — so each tap is ONE (rows, C_in)x(C_in,
# C_out) MXU matmul on a pltpu.roll'ed view.  A roll by j*d on the collapsed
# matrix reads row (b, t'+j*d) for t'+j*d < t_pad and WRAPS into the next
# element's head otherwise; wrapped rows land only at t' >= t_out =
# t_pad - (k-1)*d, which the caller discards, so the collapse is EXACT.
# The grid chunks whole batch elements (block = B_blk*t_pad rows) to respect
# VMEM (~16 MB/core); wrap-at-block-boundary pollutes the same discarded
# rows.  Under vmap the call gains a grid dim and per-run weights stay one
# clean matmul per tap — no grouped conv.


def _tap_conv_kernel(x_ref, w_ref, out_ref, *, k: int, dilation: int):
    x = x_ref[...]
    rows = x.shape[0]
    acc = jnp.zeros((rows, out_ref.shape[-1]), jnp.float32)
    for j in range(k):
        xj = pltpu.roll(x, (rows - j * dilation) % rows, 0)
        acc += jnp.dot(xj, w_ref[j], preferred_element_type=jnp.float32)
    out_ref[...] = acc.astype(out_ref.dtype)


def _tap_conv_pallas(x_pad: jax.Array, w: jax.Array, dilation: int) -> jax.Array:
    """(B, t_pad, C_in), (k, C_in, C_out) -> (B, t_out, C_out)."""
    b, t_pad, c_in = x_pad.shape
    k, _, c_out = w.shape
    t_out = t_pad - (k - 1) * dilation
    # pad the time axis to a sublane multiple so the collapsed view reshapes
    # cleanly; extra rows are beyond every kept t' (see note above)
    t_pad8 = -(-t_pad // 8) * 8
    if t_pad8 != t_pad:
        x_pad = jnp.pad(x_pad, ((0, 0), (0, t_pad8 - t_pad), (0, 0)))
    # largest whole-element chunk that keeps in+out blocks under ~4 MB
    per_row = 4 * (c_in + c_out)
    b_blk = max(1, min(b, (4 << 20) // max(per_row * t_pad8, 1)))
    while b % b_blk:
        b_blk -= 1
    x2 = x_pad.reshape(b * t_pad8, c_in)
    rows_blk = b_blk * t_pad8
    kernel = functools.partial(_tap_conv_kernel, k=k, dilation=dilation)
    y2 = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * t_pad8, c_out), x_pad.dtype),
        grid=(b // b_blk,),
        in_specs=[
            pl.BlockSpec((rows_blk, c_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c_in, c_out), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_blk, c_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=pallas_interpret(),
    )(x2, w)
    return y2.reshape(b, t_pad8, c_out)[:, :t_out]


def _tap_conv_xla(x_pad: jax.Array, w: jax.Array, dilation: int) -> jax.Array:
    if conv_impl() == "im2col":
        return _conv_im2col(x_pad, w, dilation)
    return jax.lax.conv_general_dilated(
        x_pad,
        w,
        window_strides=(1,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x_pad.dtype,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def tap_conv(x_pad: jax.Array, w: jax.Array, dilation: int) -> jax.Array:
    """VALID dilated conv1d, channel-last, Pallas-first with a hand-written
    vmap-friendly VJP (both directions stay tap convs / plain gemms — no
    grouped-conv lowering under vmapped per-run weights)."""
    if x_pad.dtype == jnp.float32 and use_pallas():
        return _tap_conv_pallas(x_pad, w, dilation)
    return _tap_conv_xla(x_pad, w, dilation)


def _tap_conv_fwd(x_pad, w, dilation):
    return tap_conv(x_pad, w, dilation), (x_pad, w)


def _tap_conv_bwd(dilation, res, g):
    x_pad, w = res
    k = w.shape[0]
    t_out = x_pad.shape[-2] - (k - 1) * dilation
    # dx_pad[s] = sum_j g_full[s - j*d] @ w[j].T — the same tap conv on g
    # padded by (k-1)*d each side with flipped, transposed taps
    lp = (k - 1) * dilation
    g_pad = jnp.pad(g, [(0, 0)] * (g.ndim - 2) + [(lp, lp), (0, 0)])
    w_flip = jnp.flip(w, axis=0).swapaxes(-1, -2)
    dx = tap_conv(g_pad, w_flip, dilation)
    # dw[j] = x_pad[:, j*d : j*d + t_out].T @ g, contracted over (B, t)
    bt = x_pad.shape[0] * t_out
    dw = jnp.stack(
        [
            jnp.dot(
                jax.lax.slice_in_dim(x_pad, j * dilation, j * dilation + t_out, axis=-2)
                .reshape(bt, x_pad.shape[-1])
                .T,
                g.reshape(bt, g.shape[-1]),
                preferred_element_type=jnp.float32,
            ).astype(w.dtype)
            for j in range(k)
        ]
    )
    return dx, dw


tap_conv.defvjp(_tap_conv_fwd, _tap_conv_bwd)


def _os_conv_kernel(x_ref, w_ref, out_ref, *, k: int, t: int):
    """One batch element: out[t'] = sum_k x[t'+k] @ w[k].

    Each tap contributes one MXU matmul on a ROLLED view of x
    (``roll(x, -j)[t] == x[t+j]``; rolls are the Mosaic-friendly shift —
    shifted *slices* change vector offsets and cannot be concatenated or
    accumulated).  The rolled wrap-around only pollutes rows t' >= t, which
    are discarded.  The whole time axis stays VMEM-resident per batch
    element: measured 1.2-33x faster than XLA's conv at UCR/UEA shapes.
    """
    c_out = out_ref.shape[-1]
    x = x_ref[0]
    t_pad = x.shape[0]
    acc = jnp.zeros((t_pad, c_out), jnp.float32)
    for j in range(k):
        # roll by t_pad - j  ==  roll by -j (pltpu.roll wants shift >= 0)
        xj = pltpu.roll(x, (t_pad - j) % t_pad, 0)
        acc += jnp.dot(xj, w_ref[j], preferred_element_type=jnp.float32)
    out_ref[0] = acc[:t].astype(out_ref.dtype)


# Measured on the v5e (experiments/fused_infer_bench.py): executing the
# epilogue INSIDE the kernel is 0.90-0.96x vs letting XLA fuse it onto the
# kernel's output (extra VMEM operands + a second store path beat nothing).
# Declined by default; flip for remeasurement on new hardware.
def fuse_epilogue_in_kernel() -> bool:
    # read per call (like use_pallas()) so tests/monkeypatch can flip it
    return os.environ.get("FLSTTSC_FUSE_EPILOGUE", "0") == "1"


def _os_conv_fused_kernel(
    x_ref, w_ref, scale_ref, shift_ref, out_ref, *, k: int, t: int, relu: bool
):
    """Inference variant of `_os_conv_kernel` with the folded-BN affine (+
    optional ReLU) applied in VMEM before the single HBM write — the conv
    output never round-trips to HBM un-normalized (ROADMAP kernel item)."""
    c_out = out_ref.shape[-1]
    x = x_ref[0]
    t_pad = x.shape[0]
    acc = jnp.zeros((t_pad, c_out), jnp.float32)
    for j in range(k):
        xj = pltpu.roll(x, (t_pad - j) % t_pad, 0)
        acc += jnp.dot(xj, w_ref[j], preferred_element_type=jnp.float32)
    y = acc[:t] * scale_ref[0] + shift_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu",))
def _conv_pallas_fused(
    x_pad: jax.Array, w: jax.Array, scale: jax.Array, shift: jax.Array, relu: bool
) -> jax.Array:
    b, t_pad, c_in = x_pad.shape
    k, _, c_out = w.shape
    t = t_pad - k + 1
    kernel = functools.partial(_os_conv_fused_kernel, k=k, t=t, relu=relu)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, c_out), x_pad.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t_pad, c_in), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c_in, c_out), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, c_out), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=pallas_interpret(),
    )(x_pad, w, scale[None], shift[None])


@jax.jit
def _conv_pallas(x_pad: jax.Array, w: jax.Array) -> jax.Array:
    b, t_pad, c_in = x_pad.shape
    k, _, c_out = w.shape
    t = t_pad - k + 1
    kernel = functools.partial(_os_conv_kernel, k=k, t=t)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, c_out), x_pad.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t_pad, c_in), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c_in, c_out), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, c_out), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=pallas_interpret(),
    )(x_pad, w)


def _pallas_profitable(t_pad: int, c_in: int, k: int) -> bool:
    """Shape heuristic from TPU microbenchmarks: the rolled-matmul kernel
    wins except for very long series with many taps (roll cost ~ t_pad*k)."""
    return c_in < 8 or t_pad * k <= 64 * 1024


@jax.custom_vjp
def _conv_core(x_pad: jax.Array, w: jax.Array) -> jax.Array:
    # bf16 goes to the XLA conv: Mosaic's dynamic_rotate (pltpu.roll) only
    # supports 32-bit element types, and XLA's conv drives the MXU at
    # native bf16 anyway (compute_dtype knob, config.py).
    if (
        x_pad.dtype == jnp.float32
        and use_pallas()
        and _pallas_profitable(x_pad.shape[1], x_pad.shape[2], w.shape[0])
    ):
        return _conv_pallas(x_pad, w)
    return _conv_xla(x_pad, w)


def _conv_core_fwd(x_pad, w):
    return _conv_core(x_pad, w), (x_pad, w)


def _conv_core_bwd(res, g):
    x_pad, w = res
    _, vjp = jax.vjp(_conv_xla, x_pad, w)
    return vjp(g)


_conv_core.defvjp(_conv_core_fwd, _conv_core_bwd)


def masked_os_conv(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array,
    mask: jax.Array,
    *,
    scale: Optional[jax.Array] = None,
    shift: Optional[jax.Array] = None,
    relu: bool = False,
) -> jax.Array:
    """Masked omni-scale "same" conv1d with optional affine + ReLU epilogue.

    x: (B, T, C_in); weight: (K, C_in, C_out); mask broadcastable to weight.
    Returns (B, T, C_out).  scale/shift (if given) fold an inference-mode
    BatchNorm: ``y*scale + shift`` after bias.
    """
    k = weight.shape[0]
    pad_l, pad_r = (k - 1) // 2, k // 2
    w = weight * mask
    x_pad = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
    if scale is not None:
        # fold bias into the shift: (conv + bias)*scale + shift
        eff_shift = bias * scale + (shift if shift is not None else 0.0)
        if (
            fuse_epilogue_in_kernel()
            and x_pad.dtype == jnp.float32  # pltpu.roll is 32-bit-only
            and use_pallas()
            and _pallas_profitable(x_pad.shape[1], x_pad.shape[2], k)
        ):
            # NO-GRAD inference path (no custom VJP) — eval/voting only.
            return _conv_pallas_fused(x_pad, w, scale, eff_shift, relu)
        y = _conv_core(x_pad, w) * scale + eff_shift
        return jnp.maximum(y, 0.0) if relu else y
    y = _conv_core(x_pad, w) + bias
    if relu:
        y = jnp.maximum(y, 0.0)
    return y
