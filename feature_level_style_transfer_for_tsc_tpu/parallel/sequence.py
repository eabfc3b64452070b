"""Sequence parallelism: time-axis sharding for very long series.

The reference has no long-context handling beyond capping the receptive
field at min(T/4, 89) (SURVEY §5).  For series too long for one chip's
VMEM/HBM, the TPU-native option is to shard the TIME axis across a mesh
axis and exchange conv halos between neighboring shards with
`jax.lax.ppermute` — the 1-D analogue of ring/halo attention.  Everything
else in this model family (1x1 convs, BatchNorm, gates, couplings,
invertible channel mixings) is pointwise in time and needs no comms except
BatchNorm's batch statistics, which reduce with one `psum`.

Working primitives (each verified equal to its unsharded op on the test
mesh, tests/test_parallel.py):

* `time_sharded_os_conv`        — masked omni-scale "same" conv, halos
                                  ((K-1)//2, K//2) (reference OS_CNN.py:59);
* `time_sharded_dilated_conv`   — kernel-3 dilated "same" conv, halo =
                                  dilation on each side (the WN convs,
                                  reference Simplified_NF_WaveGlow.py:84-89);
* `time_sharded_wn_apply`       — the full WN coupling net over sharded
                                  time (per-layer halo exchange inside one
                                  shard_map);
* `time_sharded_waveglow_forward` — the flow's density direction over
                                  sharded time;
* `time_sharded_os_cnn_res_apply` — the OS-CNN residual extractor forward
                                  over sharded time, train-mode BatchNorm
                                  statistics reduced with psum.

Each shard substitutes zeros at the sequence boundary — exactly the
reference's zero "same" padding — so results are bit-comparable to the
unsharded ops.  Halo sizes must fit in one neighbor shard:
``T/n_shards >= max(halo)`` (asserted); for the 8-layer WN that means
time shards of at least 2^(n_layers-1) steps, the regime where SP is
worth using at all.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.batchnorm import BNStats
from ..ops.osconv import _conv_xla
from ..models.common import conv1x1, weight_norm_weight
from ..models.flow import wn_apply
from ..ops.coupling import affine_coupling_forward


def _halo_exchange(x_local, pad_l: int, pad_r: int, axis: str, n_shards: int):
    """[left_halo | local | right_halo] with zero boundaries.

    Sends this shard's trailing ``pad_l`` rows right and leading ``pad_r``
    rows left (two ICI ppermutes); the first/last shard swap their received
    halo for zeros, reproducing zero "same" padding.
    """
    assert x_local.shape[1] >= max(pad_l, pad_r), (
        f"time shard of {x_local.shape[1]} steps cannot donate a "
        f"{max(pad_l, pad_r)}-step halo; use fewer shards"
    )
    idx = jax.lax.axis_index(axis)
    send_right = x_local[:, x_local.shape[1] - pad_l :, :]
    left_halo = jax.lax.ppermute(
        send_right, axis, [(i, (i + 1) % n_shards) for i in range(n_shards)]
    )
    send_left = x_local[:, :pad_r, :]
    right_halo = jax.lax.ppermute(
        send_left, axis, [(i, (i - 1) % n_shards) for i in range(n_shards)]
    )
    left_halo = jnp.where(idx == 0, jnp.zeros_like(left_halo), left_halo)
    right_halo = jnp.where(idx == n_shards - 1, jnp.zeros_like(right_halo), right_halo)
    return jnp.concatenate([left_halo, x_local, right_halo], axis=1)


def _valid_dilated_conv(x_ext, w, bias, dilation: int):
    y = jax.lax.conv_general_dilated(
        x_ext,
        w,
        window_strides=(1,),
        padding=[(0, 0)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x_ext.dtype,
    )
    return y + bias


def _sharded_batch_norm(
    x_local, scale, bias, stats: BNStats, training: bool, axis: str,
    n_global: int, momentum: float = 0.1, eps: float = 1e-5,
):
    """Torch-parity BatchNorm over (B, T_shard, C) with T sharded on
    ``axis``: batch statistics are global via one psum pair."""
    if training:
        local_sum = jnp.sum(x_local, axis=(0, 1))
        local_sq = jnp.sum(jnp.square(x_local), axis=(0, 1))
        gsum = jax.lax.psum(local_sum, axis)
        gsq = jax.lax.psum(local_sq, axis)
        mean = gsum / n_global
        var = gsq / n_global - jnp.square(mean)  # biased
        unbiased = var * (n_global / max(n_global - 1, 1))
        new_stats = BNStats(
            (1 - momentum) * stats.mean + momentum * mean,
            (1 - momentum) * stats.var + momentum * unbiased,
        )
        use_mean, use_var = mean, var
    else:
        new_stats = stats
        use_mean, use_var = stats.mean, stats.var
    inv = jax.lax.rsqrt(use_var + eps)
    return (x_local - use_mean) * (inv * scale) + bias, new_stats


# ---------------------------------------------------------------------------
# standalone conv primitives
# ---------------------------------------------------------------------------

def time_sharded_os_conv(
    mesh: Mesh,
    x: jax.Array,  # (B, T, C_in), T divisible by the axis size
    weight: jax.Array,  # (K, C_in, C_out)
    bias: jax.Array,
    mask: jax.Array,
    axis: str = "data",
) -> jax.Array:
    k = weight.shape[0]
    pad_l, pad_r = (k - 1) // 2, k // 2
    w = weight * mask
    n_shards = mesh.shape[axis]

    def shard_fn(x_local, w, bias):
        x_ext = _halo_exchange(x_local, pad_l, pad_r, axis, n_shards)
        return _conv_xla(x_ext, w) + bias

    shard = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(), P()),
        out_specs=P(None, axis, None),
    )
    x = jax.device_put(x, NamedSharding(mesh, P(None, axis, None)))
    return shard(x, w, bias)


def time_sharded_dilated_conv(
    mesh: Mesh,
    x: jax.Array,  # (B, T, C_in)
    weight: jax.Array,  # (K, C_in, C_out), K odd (WN uses 3)
    bias: jax.Array,
    dilation: int,
    axis: str = "data",
) -> jax.Array:
    """Dilated "same" conv (reference WN padding (k*d-d)/2, i.e. d for k=3)
    over a time-sharded input: halo = dilation*(k-1)//2 rows per side."""
    k = weight.shape[0]
    pad = dilation * (k - 1) // 2
    n_shards = mesh.shape[axis]

    def shard_fn(x_local, w, bias):
        x_ext = _halo_exchange(x_local, pad, pad, axis, n_shards)
        return _valid_dilated_conv(x_ext, w, bias, dilation)

    shard = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(), P()),
        out_specs=P(None, axis, None),
    )
    x = jax.device_put(x, NamedSharding(mesh, P(None, axis, None)))
    return shard(x, weight, bias)


# ---------------------------------------------------------------------------
# model-level consumers
# ---------------------------------------------------------------------------

def time_sharded_wn_apply(
    mesh: Mesh, params: Dict, x: jax.Array, n_channels: int, axis: str = "data"
) -> jax.Array:
    """The WN coupling net (models/flow.py wn_apply) over sharded time.

    One shard_map wraps the whole net; each of the n_layers dilated convs
    exchanges its own (dilation-sized) halo, everything else is local.
    """
    n_shards = mesh.shape[axis]

    def shard_fn(params, x_local):
        def halo_conv(xl, w, bias, dilation):
            x_ext = _halo_exchange(xl, dilation, dilation, axis, n_shards)
            return _valid_dilated_conv(x_ext, w, bias, dilation)

        return wn_apply(params, x_local, n_channels, dilated_conv=halo_conv)

    shard = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None)),
        out_specs=P(None, axis, None),
    )
    x = jax.device_put(x, NamedSharding(mesh, P(None, axis, None)))
    return shard(params, x)


def time_sharded_waveglow_forward(
    mesh: Mesh, params: Dict, x: jax.Array, n_wn_ch: int, axis: str = "data"
):
    """WaveGlow density direction (models/flow.py waveglow_forward) with the
    time axis sharded: WN convs exchange halos, the 1x1 mixings and affine
    couplings are pointwise in time, and log_det_W uses the GLOBAL length.

    Returns the reference triple (z, log_s_list, log_det_w_list).
    """
    n_shards = mesh.shape[axis]
    b, t_global, _ = x.shape

    def shard_fn(params, x_local):
        def halo_conv(xl, w, bias, dilation):
            x_ext = _halo_exchange(xl, dilation, dilation, axis, n_shards)
            return _valid_dilated_conv(x_ext, w, bias, dilation)

        n_flows = len(params["convinv"])
        log_s_list, log_det_list = [], []
        audio = x_local
        for k in range(n_flows):
            w = params["convinv"][k]["weight"]
            _, logdet = jnp.linalg.slogdet(w)
            log_det_list.append(b * t_global * logdet)
            audio = jnp.matmul(audio, w.T, precision=jax.lax.Precision.HIGHEST)
            n_half = audio.shape[-1] // 2
            audio_0, audio_1 = audio[..., :n_half], audio[..., n_half:]
            output = wn_apply(
                params["wn"][k], audio_0, n_wn_ch, dilated_conv=halo_conv
            )
            bcoef = output[..., :n_half]
            log_s = output[..., n_half:]
            audio_1, _ = affine_coupling_forward(audio_1, log_s, bcoef)
            log_s_list.append(log_s)
            audio = jnp.concatenate([audio_0, audio_1], axis=-1)
        return audio, tuple(log_s_list), tuple(log_det_list)

    n_flows = len(params["convinv"])
    shard = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None)),
        out_specs=(
            P(None, axis, None),
            tuple(P(None, axis, None) for _ in range(n_flows)),
            tuple(P() for _ in range(n_flows)),
        ),
        check_vma=False,  # logdets are computed identically on every shard
    )
    x = jax.device_put(x, NamedSharding(mesh, P(None, axis, None)))
    z, log_s_list, log_det_list = shard(params, x)
    return z, list(log_s_list), list(log_det_list)


def time_sharded_os_cnn_res_apply(
    mesh: Mesh,
    params: Dict,
    state: Dict,
    masks: List[jax.Array],
    x: jax.Array,
    axis: str = "data",
    training: bool = False,
):
    """The OS_CNN_res extractor forward (models/os_cnn.py
    os_cnn_res_apply — reference Res_OS_layer, OS_CNN.py:169-220) with the
    time axis sharded.  Masked convs exchange halos; train-mode BatchNorm
    reduces its batch statistics globally with psum, so outputs AND updated
    running stats equal the unsharded op."""
    n_shards = mesh.shape[axis]
    b, t_global, _ = x.shape
    n_elems = b * t_global

    def shard_fn(params, state, x_local):
        n = len(masks)
        h = x_local
        new_layers = []
        layer_triples = zip(
            params["block"]["layers"], state["block"]["layers"], masks
        )
        for i, (p, s, mask) in enumerate(layer_triples):
            w = p["conv"]["weight"] * mask
            k = w.shape[0]
            x_ext = _halo_exchange(h, (k - 1) // 2, k // 2, axis, n_shards)
            y = _conv_xla(x_ext, w) + p["conv"]["bias"]
            y, new_bn = _sharded_batch_norm(
                y, p["bn_scale"], p["bn_bias"], s["bn"], training, axis, n_elems
            )
            if i < n - 1:  # no ReLU on the block's last layer (res variant)
                y = jnp.maximum(y, 0.0)
            new_layers.append({"bn": new_bn})
            h = y
        shortcut = x_local @ params["res"]["weight"] + params["res"]["bias"]
        shortcut, new_res_bn = _sharded_batch_norm(
            shortcut, params["res_bn_scale"], params["res_bn_bias"],
            state["res_bn"], training, axis, n_elems,
        )
        out = jnp.maximum(h + shortcut, 0.0)
        return out, {"block": {"layers": new_layers}, "res_bn": new_res_bn}

    state_specs = jax.tree_util.tree_map(lambda _: P(), state)
    shard = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(None, axis, None)),
        out_specs=(P(None, axis, None), state_specs),
        check_vma=False,  # psum'd stats are replicated by construction
    )
    x = jax.device_put(x, NamedSharding(mesh, P(None, axis, None)))
    return shard(params, state, x)
