"""Loader + weight-transplant helpers for torch-reference parity tests.

`load_reference()` imports the actual reference package from
`/root/reference` (CUDA placement no-op'ed, sktime stubbed — the tests feed
tensors directly).  The `*_params` helpers copy a torch module's weights
into the matching JAX pytree layout so both sides compute from IDENTICAL
parameters; tests then assert forward/loss/grad equality.

Layout conversions (reference is channel-first, ours channel-last):
  * torch Conv1d weight (C_out, C_in, K)  ->  ours (K, C_in, C_out)
  * torch Linear weight (out, in)         ->  ours (in, out)
  * torch 1x1 Conv1d                      ->  ours (C_in, C_out) matrix
  * torch weight_norm (weight_v, weight_g with dim=0) -> ours {"v","g"}
  * activations (B, C, T)                 ->  ours (B, T, C)
"""

from __future__ import annotations

import sys
import types

import numpy as np

_REFERENCE_PATH = "/root/reference"
_loaded = None


def load_reference():
    """Import the reference modules once; returns a namespace object."""
    global _loaded
    if _loaded is not None:
        return _loaded

    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if not hasattr(torch, "qr"):  # removed in newer torch; reference uses it
        torch.qr = lambda a: torch.linalg.qr(a)
    if not hasattr(np, "float"):  # removed in numpy>=1.24; C_DAN.py uses it
        np.float = float

    if "sktime" not in sys.modules:  # absent from this image; import-only
        sk = types.ModuleType("sktime")
        skd = types.ModuleType("sktime.datasets")
        skd.load_from_tsfile = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("sktime stub: not used in tests")
        )
        sk.datasets = skd
        sys.modules["sktime"] = sk
        sys.modules["sktime.datasets"] = skd

    if _REFERENCE_PATH not in sys.path:
        sys.path.insert(0, _REFERENCE_PATH)

    ns = types.SimpleNamespace()
    from OS_CNN.OS_CNN_Structure_build import generate_layer_parameter_list

    from OS_CNN.OS_CNN import (  # noqa: E402
        OS_CNN,
        OS_CNN_res,
        build_layer_with_layer_parameter,
        layer_parameter_list_input_change,
    )
    from Simplified_NF_WaveGlow import WaveGlow, WaveGlowLoss  # noqa: E402
    from widgets import (  # noqa: E402
        AdversarialNetworkforCDAN,
        DimensionUnification,
        FeatureDiscriminatorforSource,
        NoiseTransfer,
        ProbTransfer,
        wgan_loss,
    )
    from C_DAN import CDAN, RandomLayer  # noqa: E402
    from Comparison.SLARDA.train import CPC  # noqa: E402

    ns.torch = torch
    ns.generate_layer_parameter_list = generate_layer_parameter_list
    ns.layer_parameter_list_input_change = layer_parameter_list_input_change
    ns.build_layer_with_layer_parameter = build_layer_with_layer_parameter
    ns.OS_CNN = OS_CNN
    ns.OS_CNN_res = OS_CNN_res
    ns.WaveGlow = WaveGlow
    ns.WaveGlowLoss = WaveGlowLoss
    ns.DimensionUnification = DimensionUnification
    ns.ProbTransfer = ProbTransfer
    ns.NoiseTransfer = NoiseTransfer
    ns.AdversarialNetworkforCDAN = AdversarialNetworkforCDAN
    ns.FeatureDiscriminatorforSource = FeatureDiscriminatorforSource
    ns.wgan_loss = wgan_loss
    ns.CDAN = CDAN
    ns.RandomLayer = RandomLayer
    ns.CPC = CPC
    _loaded = ns
    return ns


# --------------------------------------------------------------------------
# tensor/layout converters
# --------------------------------------------------------------------------

def t2j(t):
    import jax.numpy as jnp

    # .copy() matters: jnp.asarray can zero-copy alias the torch buffer,
    # which torch then mutates in place (BN running stats, masked weights)
    return jnp.asarray(t.detach().cpu().numpy().copy())


def j2t(a):
    import torch

    return torch.from_numpy(np.asarray(a).copy())


def bct(a_btc):
    """Ours (B, T, C) -> torch (B, C, T) numpy."""
    return np.transpose(np.asarray(a_btc), (0, 2, 1))


def btc(t_bct):
    """torch (B, C, T) -> ours (B, T, C) jax array."""
    import jax.numpy as jnp

    return jnp.asarray(np.transpose(t_bct.detach().cpu().numpy(), (0, 2, 1)))


def linear_params(lin):
    return {"weight": t2j(lin.weight.t()), "bias": t2j(lin.bias)}


def conv1x1_params(conv):
    """torch Conv1d(kernel=1) -> channel-last matmul params."""
    return {"weight": t2j(conv.weight[:, :, 0].t()), "bias": t2j(conv.bias)}


def conv1d_weight_kio(conv):
    return t2j(conv.weight.permute(2, 1, 0))


# --------------------------------------------------------------------------
# module transplants (torch module -> our (params, state) pytrees)
# --------------------------------------------------------------------------

def os_layer_params(layer):
    """reference build_layer_with_layer_parameter -> ours os_layer pytrees."""
    from feature_level_style_transfer_for_tsc_tpu.ops.batchnorm import BNStats

    params = {
        "conv": {"weight": conv1d_weight_kio(layer.conv1d), "bias": t2j(layer.conv1d.bias)},
        "bn_scale": t2j(layer.bn.weight),
        "bn_bias": t2j(layer.bn.bias),
    }
    state = {"bn": BNStats(t2j(layer.bn.running_mean), t2j(layer.bn.running_var))}
    return params, state


def os_block_params(seq):
    """nn.Sequential of build_layer_with_layer_parameter -> block pytrees."""
    pairs = [os_layer_params(layer) for layer in seq]
    return {"layers": [p for p, _ in pairs]}, {"layers": [s for _, s in pairs]}


def os_cnn_params(m):
    """reference OS_CNN -> ours (params, state)."""
    block_p, block_s = os_block_params(m.net)
    return (
        {"block": block_p, "hidden": linear_params(m.hidden)},
        {"block": block_s},
    )


def os_cnn_res_params(m):
    """reference OS_CNN_res (n_layers=1) -> ours (params, state)."""
    from feature_level_style_transfer_for_tsc_tpu.ops.batchnorm import BNStats

    block_p, block_s = os_block_params(m.net_1.net.net)
    res = m.net_1.res
    params = {
        "block": block_p,
        "res": conv1x1_params(res.conv1d),
        "res_bn_scale": t2j(res.bn.weight),
        "res_bn_bias": t2j(res.bn.bias),
    }
    state = {
        "block": block_s,
        "res_bn": BNStats(t2j(res.bn.running_mean), t2j(res.bn.running_var)),
    }
    return params, state


def _weight_norm_params(conv):
    """torch weight_norm'ed Conv1d -> ours {"v", "g", "bias"}."""
    return {
        "v": t2j(conv.weight_v.permute(2, 1, 0)),
        "g": t2j(conv.weight_g.reshape(-1)),
        "bias": t2j(conv.bias),
    }


def wn_params(wn):
    return {
        "start": _weight_norm_params(wn.start),
        "cond": _weight_norm_params(wn.cond_layer),
        "end": {"weight": t2j(wn.end.weight[:, :, 0].t()), "bias": t2j(wn.end.bias)},
        "in_layers": [_weight_norm_params(c) for c in wn.in_layers],
        "res_skip_layers": [_weight_norm_params(c) for c in wn.res_skip_layers],
    }


def waveglow_params(glow):
    return {
        "convinv": [{"weight": t2j(c.conv.weight[:, :, 0])} for c in glow.convinv],
        "wn": [wn_params(w) for w in glow.WN],
    }


def ad_net_params(net):
    return {
        "l1": linear_params(net.ad_layer1),
        "l2": linear_params(net.ad_layer2),
        "l3": linear_params(net.ad_layer3),
    }


def feature_discriminator_params(net):
    return {
        "l1": linear_params(net.model[0]),
        "l2": linear_params(net.model[2]),
        "l3": linear_params(net.model[4]),
        "l4": linear_params(net.model[6]),
    }


def random_layer_params(rl):
    import jax.numpy as jnp

    return {
        "matrices": [t2j(m) for m in rl.random_matrix],
        "output_dim": jnp.asarray(float(rl.output_dim)),
    }


def cpc_params(c):
    gru = c.gru
    return {
        "gru": {
            "w_ih": t2j(gru.weight_ih_l0.t()),
            "w_hh": t2j(gru.weight_hh_l0.t()),
            "b_ih": t2j(gru.bias_ih_l0),
            "b_hh": t2j(gru.bias_hh_l0),
        },
        "wk": [linear_params(lin) for lin in c.Wk],
    }


def prob_transfer_params(m):
    lstm = m.model
    return {
        "lstm": {
            "w_ih": t2j(lstm.weight_ih_l0.t()),
            "w_hh": t2j(lstm.weight_hh_l0.t()),
            "b_ih": t2j(lstm.bias_ih_l0),
            "b_hh": t2j(lstm.bias_hh_l0),
        }
    }


def dimension_unification_params(m):
    return {
        "length": linear_params(m.length_unification),
        "channel": conv1x1_params(m.channel_unification),
    }


def noise_transfer_params(m):
    return {"conv": conv1x1_params(m.apply_learnable_weight)}
