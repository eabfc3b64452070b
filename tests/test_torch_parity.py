"""Weight-transplant parity tests against the ACTUAL torch reference.

Every test here initializes the reference module (imported from
`/root/reference`), copies its weights into the matching JAX pytree via
`tests/_torch_ref.py`, and asserts forward/loss/grad equality on a shared
batch.  This is the proof layer on top of the transcription-based golden
tests: both sides compute from identical parameters, so any semantic drift
(layouts, paddings, BN modes, GRL coefficients, state updates) shows up as
a numeric mismatch.

Reference anchors per test are cited inline (file:line into
/root/reference).
"""

from __future__ import annotations

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from _torch_ref import (
    ad_net_params,
    bct,
    btc,
    cpc_params,
    dimension_unification_params,
    feature_discriminator_params,
    j2t,
    load_reference,
    noise_transfer_params,
    os_cnn_params,
    os_cnn_res_params,
    os_layer_params,
    prob_transfer_params,
    random_layer_params,
    t2j,
    waveglow_params,
)

from feature_level_style_transfer_for_tsc_tpu.losses.cdan import cdan_loss
from feature_level_style_transfer_for_tsc_tpu.losses.classification import cross_entropy
from feature_level_style_transfer_for_tsc_tpu.losses.wgan import wgan_loss
from feature_level_style_transfer_for_tsc_tpu.models import (
    cpc_apply,
    critic_state_init,
    dimension_unification_apply,
    feature_discriminator_apply,
    noise_transfer_apply,
    noise_transfer_init,
    os_block_masks,
    os_cnn_apply,
    os_cnn_res_apply,
    prob_transfer_apply,
)
from feature_level_style_transfer_for_tsc_tpu.models.flow import (
    waveglow_forward,
    waveglow_infer,
    waveglow_loss,
)
from feature_level_style_transfer_for_tsc_tpu.models.os_cnn import os_layer_apply
from feature_level_style_transfer_for_tsc_tpu.ops.osconv import build_os_mask


def _allclose(ours, theirs, rtol=1e-4, atol=1e-5, what=""):
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(theirs), rtol=rtol, atol=atol, err_msg=what
    )


@pytest.fixture(scope="module")
def ref():
    return load_reference()


# ---------------------------------------------------------------------------
# Masked omni-scale conv layer (reference OS_CNN/OS_CNN.py:44-77)
# ---------------------------------------------------------------------------

class TestOSLayer:
    SPEC = [(2, 3, 1), (2, 3, 2), (2, 4, 3), (2, 2, 5)]

    def _build(self, ref, relu=True):
        torch = ref.torch
        torch.manual_seed(0)
        layer = ref.build_layer_with_layer_parameter(
            self.SPEC, relu_or_not_at_last_layer=relu, with_nvidia=False
        )
        params, state = os_layer_params(layer)
        mask = jnp.asarray(build_os_mask(self.SPEC))
        return layer, params, state, mask

    def test_forward_train_mode(self, ref):
        torch = ref.torch
        layer, params, state, mask = self._build(ref)
        x = torch.randn(5, 2, 17)
        layer.train()
        y_ref = layer(x)
        y_ours, new_state = os_layer_apply(
            params, state, mask, btc(x), training=True, relu=True
        )
        _allclose(bct(y_ours), y_ref.detach().numpy(), what="train-mode output")
        # running BN stats updated identically (torch BatchNorm1d momentum 0.1)
        _allclose(new_state["bn"].mean, layer.bn.running_mean.detach().numpy(),
                  what="running mean")
        _allclose(new_state["bn"].var, layer.bn.running_var.detach().numpy(),
                  what="running var")

    def test_forward_eval_mode(self, ref):
        torch = ref.torch
        layer, params, state, mask = self._build(ref, relu=False)
        # make the running stats non-trivial first
        layer.train()
        layer(torch.randn(5, 2, 17))
        params, state = os_layer_params(layer)
        layer.eval()
        x = torch.randn(4, 2, 17)
        y_ref = layer(x)
        y_ours, _ = os_layer_apply(params, state, mask, btc(x), training=False, relu=False)
        _allclose(bct(y_ours), y_ref.detach().numpy(), what="eval-mode output")

    def test_input_grad(self, ref):
        torch = ref.torch
        layer, params, state, mask = self._build(ref)
        layer.train()
        x = torch.randn(5, 2, 17, requires_grad=True)
        layer(x).square().mean().backward()

        def loss(xj):
            y, _ = os_layer_apply(params, state, mask, xj, training=True, relu=True)
            return jnp.mean(jnp.square(y))

        g = jax.grad(loss)(btc(x))
        _allclose(bct(g), x.grad.numpy(), rtol=5e-4, what="d loss / d input")


# ---------------------------------------------------------------------------
# OS_CNN classifier + OS_CNN_res extractor (reference OS_CNN.py:80-220)
# ---------------------------------------------------------------------------

def _small_lpl(ref, in_ch=2):
    # tiny builder output shape: two stacked layers + final (k, k+1) pair
    return ref.generate_layer_parameter_list(1, 6, [90 * in_ch, 1500], in_ch)


class TestOSCNN:
    def test_classifier_forward(self, ref):
        torch = ref.torch
        torch.manual_seed(1)
        lpl = _small_lpl(ref)
        model = ref.OS_CNN(lpl, n_class=3)
        model.train()
        params, state = os_cnn_params(model)
        masks = [jnp.asarray(m) for m in os_block_masks(lpl)]
        x = torch.randn(6, 2, 20)
        logits_ref, pooled_ref = model(x)
        logits, pooled, _ = os_cnn_apply(params, state, masks, btc(x), training=True)
        _allclose(logits, logits_ref.detach().numpy(), what="logits")
        _allclose(pooled, pooled_ref.detach().numpy(), what="pooled feature")

    def test_res_extractor_forward_and_grad(self, ref):
        torch = ref.torch
        torch.manual_seed(2)
        lpl = _small_lpl(ref)
        model = ref.OS_CNN_res(lpl)
        model.train()
        params, state = os_cnn_res_params(model)
        masks = [jnp.asarray(m) for m in os_block_masks(lpl)]
        x = torch.randn(5, 2, 20, requires_grad=True)
        feat_ref = model(x)
        feat, new_state = os_cnn_res_apply(params, state, masks, btc(x), training=True)
        _allclose(bct(feat), feat_ref.detach().numpy(), what="extractor features")
        # shortcut-BN running stats too (reference Res_OS_layer, OS_CNN.py:169-180)
        _allclose(
            new_state["res_bn"].mean,
            model.net_1.res.bn.running_mean.detach().numpy(),
            what="res bn mean",
        )
        feat_ref.square().mean().backward()

        def loss(xj):
            y, _ = os_cnn_res_apply(params, state, masks, xj, training=True)
            return jnp.mean(jnp.square(y))

        g = jax.grad(loss)(btc(x))
        _allclose(bct(g), x.grad.numpy(), rtol=5e-4, atol=1e-5, what="d loss / d input")

    def test_res_eval_mode(self, ref):
        torch = ref.torch
        torch.manual_seed(3)
        lpl = _small_lpl(ref)
        model = ref.OS_CNN_res(lpl)
        model.train()
        model(torch.randn(5, 2, 20))  # populate running stats
        model.eval()
        params, state = os_cnn_res_params(model)
        masks = [jnp.asarray(m) for m in os_block_masks(lpl)]
        x = torch.randn(4, 2, 20)
        feat_ref = model(x)
        feat, _ = os_cnn_res_apply(params, state, masks, btc(x), training=False)
        _allclose(bct(feat), feat_ref.detach().numpy(), what="eval features")


# ---------------------------------------------------------------------------
# WaveGlow flow (reference Simplified_NF_WaveGlow.py:125-241)
# ---------------------------------------------------------------------------

class TestWaveGlow:
    N_GROUP, WN_CH, N_FLOWS, T = 8, 16, 3, 30

    def _build(self, ref):
        torch = ref.torch
        torch.manual_seed(4)
        glow = ref.WaveGlow(self.N_FLOWS, self.N_GROUP, self.WN_CH)
        glow.train()
        return glow, waveglow_params(glow)

    def test_forward_and_loss(self, ref):
        torch = ref.torch
        glow, params = self._build(ref)
        x = torch.randn(4, self.N_GROUP, self.T)
        z_ref, log_s_ref, log_det_ref = glow(x)
        out = waveglow_forward(params, btc(x), self.WN_CH)
        z, log_s, log_det = out
        _allclose(bct(z), z_ref.detach().numpy(), rtol=5e-4, what="flow output z")
        for i, (a, b) in enumerate(zip(log_s, log_s_ref)):
            _allclose(bct(a), b.detach().numpy(), rtol=5e-4, what=f"log_s[{i}]")
        for i, (a, b) in enumerate(zip(log_det, log_det_ref)):
            # det(W)=+1 at init so both sides are f32 noise around 0 scaled
            # by B*T; compare with an absolute tolerance of that magnitude
            _allclose(a, b.detach().numpy(), rtol=5e-4, atol=1e-3,
                      what=f"log_det_W[{i}]")
        loss_ref = ref.WaveGlowLoss()((z_ref, log_s_ref, log_det_ref))
        _allclose(waveglow_loss(out), loss_ref.detach().numpy(), rtol=5e-4,
                  what="WaveGlowLoss")

    def test_infer(self, ref):
        torch = ref.torch
        glow, params = self._build(ref)
        noise = torch.randn(4, self.N_GROUP, self.T)
        audio_ref = glow.infer(noise)
        audio = waveglow_infer(params, btc(noise), self.WN_CH)
        _allclose(bct(audio), audio_ref.detach().numpy(), rtol=1e-3, atol=1e-4,
                  what="infer output")

    def test_loss_input_grad(self, ref):
        torch = ref.torch
        glow, params = self._build(ref)
        x = torch.randn(4, self.N_GROUP, self.T, requires_grad=True)
        ref.WaveGlowLoss()(glow(x)).backward()

        def loss(xj):
            return waveglow_loss(waveglow_forward(params, xj, self.WN_CH))

        g = jax.grad(loss)(btc(x))
        _allclose(bct(g), x.grad.numpy(), rtol=1e-3, atol=1e-5, what="d NLL / d x")


# ---------------------------------------------------------------------------
# CDAN loss incl. GRL + iter-counter semantics (reference C_DAN.py:49-82,
# widgets.py:95-131)
# ---------------------------------------------------------------------------

class TestCDAN:
    B, C, T, NCLS, DIM = 6, 4, 10, 3, 64

    def _build(self, ref):
        torch = ref.torch
        torch.manual_seed(5)
        ad_net = ref.AdversarialNetworkforCDAN(self.DIM, 32)
        # dropout off so training-mode forwards are deterministic; the
        # counter/GRL semantics (the point of this test) still exercise
        ad_net.dropout1.p = 0.0
        ad_net.dropout2.p = 0.0
        ad_net.train()
        rl = ref.RandomLayer([self.C * self.T, self.NCLS], output_dim=self.DIM,
                             with_nvidia=False)
        return ad_net, ad_net_params(ad_net), rl, random_layer_params(rl)

    def test_loss_counters_and_grads(self, ref):
        torch = ref.torch
        ad_net, ad_p, rl, rl_p = self._build(ref)
        feats = [torch.randn(self.B, self.C, self.T, requires_grad=True) for _ in range(2)]
        logits = [torch.randn(self.B, self.NCLS, requires_grad=True) for _ in range(2)]

        loss_ref = ref.CDAN(feats[0], feats[1], logits[0], logits[1], ad_net, rl)
        assert ad_net.iter_num == 1  # two training-mode calls from -1
        loss_ref.backward()

        state = critic_state_init()

        def ours(ft, fs, lt, ls):
            loss, new_state = cdan_loss(
                ad_p, state, ft, fs, lt, ls, random_layer=rl_p,
                training=True, dropout_rng=None,
            )
            return loss, new_state

        args = (btc(feats[0]), btc(feats[1]), t2j(logits[0]), t2j(logits[1]))
        (loss, new_state), grads = jax.value_and_grad(
            ours, argnums=(0, 1, 2, 3), has_aux=True
        )(*args)
        _allclose(loss, loss_ref.detach().numpy(), what="CDAN loss")
        assert int(new_state.iter_num) == 1
        # gradients flow through the GRL'd critic inputs AND the GRL'd
        # entropy weights (C_DAN.py:70-71) — full backward-path parity
        _allclose(bct(grads[0]), feats[0].grad.numpy(), rtol=5e-4, atol=1e-6,
                  what="d/d target_feature")
        _allclose(bct(grads[1]), feats[1].grad.numpy(), rtol=5e-4, atol=1e-6,
                  what="d/d s2t_feature")
        _allclose(grads[2], logits[0].grad.numpy(), rtol=5e-4, atol=1e-6,
                  what="d/d target_logits")
        _allclose(grads[3], logits[1].grad.numpy(), rtol=5e-4, atol=1e-6,
                  what="d/d s2t_logits")

    def test_counter_annealing_across_calls(self, ref):
        """Second CDAN call uses the advanced counter's larger coeff."""
        torch = ref.torch
        ad_net, ad_p, rl, rl_p = self._build(ref)
        state = critic_state_init()
        for call in range(3):
            # requires_grad: the reference registers GRL hooks in forward
            feats = [torch.randn(self.B, self.C, self.T, requires_grad=True)
                     for _ in range(2)]
            logits = [torch.randn(self.B, self.NCLS, requires_grad=True)
                      for _ in range(2)]
            loss_ref = ref.CDAN(feats[0], feats[1], logits[0], logits[1], ad_net, rl)
            loss, state = cdan_loss(
                ad_p, state, btc(feats[0]), btc(feats[1]), t2j(logits[0]),
                t2j(logits[1]), random_layer=rl_p, training=True, dropout_rng=None,
            )
            _allclose(loss, loss_ref.detach().numpy(), rtol=5e-4,
                      what=f"CDAN loss call {call}")
            assert int(state.iter_num) == ad_net.iter_num


# ---------------------------------------------------------------------------
# CPC at a fixed anchor (reference Comparison/SLARDA/train.py:41-76)
# ---------------------------------------------------------------------------

class TestCPC:
    C, T, HIDDEN, TIMESTEP, B = 4, 40, 8, 16, 5

    @pytest.mark.parametrize("anchor", [0, 3, 7])
    def test_fixed_anchor_loss(self, ref, anchor):
        torch = ref.torch
        torch.manual_seed(6)
        cpc = ref.CPC(self.C, self.HIDDEN, self.TIMESTEP)
        cpc.train()
        params = cpc_params(cpc)
        x = torch.randn(self.B, self.C, self.T)
        with mock.patch.object(torch, "randint",
                               return_value=torch.tensor([anchor])):
            loss_ref = cpc(x)
        loss = cpc_apply(params, btc(x), jax.random.PRNGKey(0), anchor=anchor)
        _allclose(loss, loss_ref.detach().numpy(), rtol=5e-5, what="InfoNCE loss")

    def test_fixed_anchor_grad(self, ref):
        torch = ref.torch
        torch.manual_seed(7)
        cpc = ref.CPC(self.C, self.HIDDEN, self.TIMESTEP)
        cpc.train()
        params = cpc_params(cpc)
        x = torch.randn(self.B, self.C, self.T, requires_grad=True)
        with mock.patch.object(torch, "randint", return_value=torch.tensor([2])):
            cpc(x).backward()
        g = jax.grad(lambda xj: cpc_apply(params, xj, jax.random.PRNGKey(0), anchor=2))(
            btc(x)
        )
        _allclose(bct(g), x.grad.numpy(), rtol=5e-4, atol=1e-6, what="d CPC / d x")


# ---------------------------------------------------------------------------
# Adapters: DimensionUnification, ProbTransfer, NoiseTransfer
# (reference widgets.py:46-78,136-167)
# ---------------------------------------------------------------------------

class TestAdapters:
    def test_dimension_unification(self, ref):
        torch = ref.torch
        torch.manual_seed(8)
        m = ref.DimensionUnification(5, 3, 12, 20)  # C_s=5->C_t=3, T_s=12->T_t=20
        params = dimension_unification_params(m)
        x = torch.randn(4, 5, 12)
        y_ref = m(x)
        y = dimension_unification_apply(params, btc(x))
        _allclose(bct(y), y_ref.detach().numpy(), what="adapted features")

    def test_prob_transfer(self, ref):
        torch = ref.torch
        torch.manual_seed(9)
        m = ref.ProbTransfer(6)
        params = prob_transfer_params(m)
        x = torch.randn(4, 6)
        y_ref = m(x)
        y = prob_transfer_apply(params, t2j(x))
        _allclose(y, y_ref.detach().numpy(), what="LSTM-twice output")

    def test_noise_transfer_three_calls(self, ref):
        """Growing-average state parity over a 3-call sequence
        (reference widgets.py:150-167: first call adds the plain mean,
        later calls add batch/cal_num * mean, never renormalized)."""
        torch = ref.torch
        torch.manual_seed(10)
        c, t, b = 4, 9, 5
        m = ref.NoiseTransfer(c, t, with_nvidia=False)
        params = noise_transfer_params(m)
        _, state = noise_transfer_init(jax.random.PRNGKey(0), c, t)
        for call in range(3):
            tn = torch.randn(b, c, t)
            sn = torch.randn(b, c, t)
            out_ref = m(tn, sn)
            out, state = noise_transfer_apply(params, state, btc(tn), btc(sn))
            _allclose(bct(out), out_ref.detach().numpy(), rtol=5e-5,
                      what=f"mixed noise call {call}")
            _allclose(state.target_avg, m.target_avg.detach().numpy().T,
                      rtol=5e-5, what=f"target_avg call {call}")
            _allclose(state.source_avg, m.source_avg.detach().numpy().T,
                      rtol=5e-5, what=f"source_avg call {call}")


# ---------------------------------------------------------------------------
# WGAN critic + loss (reference widgets.py:15-42,59-61)
# ---------------------------------------------------------------------------

class TestFeatureDiscriminator:
    def test_three_pass_wgan_loss_and_grad(self, ref):
        torch = ref.torch
        torch.manual_seed(11)
        m = ref.FeatureDiscriminatorforSource(6)
        m.train()
        params = feature_discriminator_params(m)
        xs = [torch.randn(5, 6, requires_grad=True) for _ in range(3)]
        # reference phase-5 calls the critic 3x per batch (:601-603), the
        # iter counter advancing each call
        loss_ref = ref.wgan_loss(m(xs[0]), m(xs[1]), m(xs[2]))
        assert m.iter_num == 2
        loss_ref.backward()

        def ours(a, b, c):
            state = critic_state_init()
            va, state = feature_discriminator_apply(params, state, a, training=True)
            vb, state = feature_discriminator_apply(params, state, b, training=True)
            vc, state = feature_discriminator_apply(params, state, c, training=True)
            return wgan_loss(va, vb, vc)

        loss, grads = jax.value_and_grad(ours, argnums=(0, 1, 2))(
            t2j(xs[0]), t2j(xs[1]), t2j(xs[2])
        )
        _allclose(loss, loss_ref.detach().numpy(), what="wgan loss")
        for i in range(3):
            _allclose(grads[i], xs[i].grad.numpy(), rtol=5e-4, atol=1e-7,
                      what=f"d/d input {i} (GRL coeff at iter {i})")
