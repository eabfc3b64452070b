"""Weight-transplant parity: GradNorm dynamics and the full phase-5 forward.

Two system-level checks on top of tests/test_torch_parity.py's per-module
transplants:

* `TestGradNorm` runs the reference's inline GradNorm update sequence
  (`/root/reference/train_and_test.py:646-761`) verbatim in torch — real
  ``autograd.grad`` on a shared trunk, the σ-ratio inverse train rate, the
  L1 gap loss, torch Adam, the clamp+renorm — and asserts our closed-form
  `gradnorm_step` reproduces the 3-step weight trajectory.

* `TestPhase5Forward` transplants EVERY module of the flagship pipeline
  into `StyleTransferPipeline` and compares all nine phase-5 losses plus
  the d(total)/d(input) gradients against the reference's own modules
  composed exactly like the hot loop (`train_and_test.py:539-621`).  This
  is also the regression test for the s2t BatchNorm-staleness fix: the
  reference's in-place BN means the eval-mode s2t pass sees stats updated
  by the same batch's target pass (:583-586); before the fix our losses
  depending on s2t_logits diverged here.
"""

from __future__ import annotations

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from _torch_ref import (
    ad_net_params,
    bct,
    btc,
    cpc_params,
    dimension_unification_params,
    feature_discriminator_params,
    load_reference,
    noise_transfer_params,
    os_cnn_params,
    os_cnn_res_params,
    prob_transfer_params,
    random_layer_params,
    t2j,
    waveglow_params,
)

from feature_level_style_transfer_for_tsc_tpu.config import FlowConfig, PipelineConfig
from feature_level_style_transfer_for_tsc_tpu.losses.gradnorm import (
    gradnorm_init,
    gradnorm_step,
    per_loss_trunk_grad_norms,
)
from feature_level_style_transfer_for_tsc_tpu.models.structure import (
    default_parameter_budgets,
)
from feature_level_style_transfer_for_tsc_tpu.train.pipeline import StyleTransferPipeline


@pytest.fixture(scope="module")
def ref():
    return load_reference()


# ---------------------------------------------------------------------------
# GradNorm 3-step weight trajectory (reference train_and_test.py:646-761)
# ---------------------------------------------------------------------------

class TestGradNorm:
    """Torch side = the reference's exact inline update sequence on a tiny
    frozen trunk; ours = gradnorm_step.  Both start from the reference's
    init weights [2,5] / [2,2,4] with the reference Adam LRs."""

    def _torch_trajectory(self, ref, n_steps=3):
        torch = ref.torch
        torch.manual_seed(20)
        trunk = torch.nn.Linear(4, 3)
        x = torch.randn(5, 4)
        tgt = torch.randn(5, 3)

        def losses_t():
            out = trunk(x)
            return [out.square().mean(), (out - tgt).square().mean()]

        def losses_s():
            out = trunk(x)
            return [
                torch.tanh(out).square().mean(),
                torch.sigmoid(out).mean(),
                (2.0 * out + 1.0).square().mean(),
            ]

        w_t = torch.nn.Parameter(torch.tensor([2.0, 5.0]))
        w_s = torch.nn.Parameter(torch.tensor([2.0, 2.0, 4.0]))
        opt_t = torch.optim.Adam([w_t], lr=2e-4)  # reference :506
        opt_s = torch.optim.Adam([w_s], lr=1e-3)  # reference :507
        initial_t = initial_s = None
        alpha = 3  # reference :511
        traj = []
        for _ in range(n_steps):
            loss_t_stacked = torch.stack(losses_t())
            loss_s_stacked = torch.stack(losses_s())
            if initial_t is None:  # reference :657-663
                initial_t = 1 / (1 + np.exp(-loss_t_stacked.data.numpy()))
                initial_s = 1 / (1 + np.exp(-loss_s_stacked.data.numpy()))
            norms_t, norms_s = [], []
            for i in range(2):  # reference :685-687
                g = torch.autograd.grad(
                    loss_t_stacked[i], trunk.parameters(), retain_graph=True
                )
                norms_t.append(
                    torch.cat([torch.norm(w_t[i] * gi).unsqueeze(0) for gi in g]).sum()
                )
            for i in range(3):  # reference :688-690
                g = torch.autograd.grad(
                    loss_s_stacked[i], trunk.parameters(), retain_graph=True
                )
                norms_s.append(
                    torch.cat([torch.norm(w_s[i] * gi).unsqueeze(0) for gi in g]).sum()
                )
            norms_t_stack = torch.stack(norms_t)
            norms_s_stack = torch.stack(norms_s)
            # reference :693-700
            ratio_t = (1 / (1 + np.exp(-loss_t_stacked.data.numpy()))) / initial_t
            ratio_s = (1 / (1 + np.exp(-loss_s_stacked.data.numpy()))) / initial_s
            inv_rate_t = ratio_t / np.mean(ratio_t)
            inv_rate_s = ratio_s / np.mean(ratio_s)
            # reference :701-713
            mean_norm_t = np.mean(norms_t_stack.data.numpy())
            mean_norm_s = np.mean(norms_s_stack.data.numpy())
            const_t = torch.tensor(mean_norm_t * (inv_rate_t ** alpha))
            const_s = torch.tensor(mean_norm_s * (inv_rate_s ** alpha))
            gn_loss_t = torch.sum(torch.abs(norms_t_stack - const_t))
            gn_loss_s = torch.sum(torch.abs(norms_s_stack - const_s))
            # reference :714-715,748-751: grads assigned manually, then step
            grad_w_t = torch.autograd.grad(gn_loss_t, w_t, retain_graph=True)[0]
            grad_w_s = torch.autograd.grad(gn_loss_s, w_s)[0]
            opt_t.zero_grad()
            opt_s.zero_grad()
            w_t.grad = grad_w_t
            w_s.grad = grad_w_s
            opt_t.step()
            opt_s.step()
            # reference :756-761: clamp >= 0, renormalize to sums 7 / 8
            w_t.data[:].clamp_(min=0.0)
            w_t.data = w_t.data * (7 / torch.sum(w_t.data))
            w_s.data[:].clamp_(min=0.0)
            w_s.data = w_s.data * (8 / torch.sum(w_s.data))
            traj.append((w_t.data.numpy().copy(), w_s.data.numpy().copy()))
        return trunk, x, tgt, traj

    def test_three_step_trajectory(self, ref):
        trunk, x, tgt, traj_ref = self._torch_trajectory(ref)
        p = {"w": t2j(trunk.weight.t()), "b": t2j(trunk.bias)}
        xj, tgtj = t2j(x), t2j(tgt)

        def losses_t_of(trunk_p):
            out = xj @ trunk_p["w"] + trunk_p["b"]
            return jnp.stack(
                [jnp.mean(jnp.square(out)), jnp.mean(jnp.square(out - tgtj))]
            )

        def losses_s_of(trunk_p):
            out = xj @ trunk_p["w"] + trunk_p["b"]
            return jnp.stack(
                [
                    jnp.mean(jnp.square(jnp.tanh(out))),
                    jnp.mean(jax.nn.sigmoid(out)),
                    jnp.mean(jnp.square(2.0 * out + 1.0)),
                ]
            )

        tx_t = optax.adam(2e-4)
        tx_s = optax.adam(1e-3)
        gn_t = gradnorm_init((2.0, 5.0), tx_t)
        gn_s = gradnorm_init((2.0, 2.0, 4.0), tx_s)
        for step, (wt_ref, ws_ref) in enumerate(traj_ref):
            losses_t, n_t = per_loss_trunk_grad_norms(losses_t_of, p, 2)
            losses_s, n_s = per_loss_trunk_grad_norms(losses_s_of, p, 3)
            gn_t = gradnorm_step(gn_t, losses_t, n_t, tx_t, alpha=3.0, weight_sum=7.0)
            gn_s = gradnorm_step(gn_s, losses_s, n_s, tx_s, alpha=3.0, weight_sum=8.0)
            np.testing.assert_allclose(
                np.asarray(gn_t.weights), wt_ref, rtol=1e-4, atol=1e-6,
                err_msg=f"target-group weights, step {step}",
            )
            np.testing.assert_allclose(
                np.asarray(gn_s.weights), ws_ref, rtol=1e-4, atol=1e-6,
                err_msg=f"source-group weights, step {step}",
            )


# ---------------------------------------------------------------------------
# Full phase-5 forward (reference train_and_test.py:539-621)
# ---------------------------------------------------------------------------

class TestPhase5Forward:
    B = 6
    C_T, T_T, N_T = 1, 40, 2
    C_S, T_S, N_S = 2, 32, 3
    WN_CH = 16
    MULT = 0.02
    ANCHORS = (3, 5)

    @pytest.fixture(scope="class")
    def setup(self, ref):
        torch = ref.torch
        torch.manual_seed(30)
        cfg = PipelineConfig(
            budget_multiplier=self.MULT,
            flow=FlowConfig(wn_channels=self.WN_CH),
        )
        pipe = StyleTransferPipeline(
            self.C_T, self.T_T, self.N_T, self.C_S, self.T_S, self.N_S, cfg
        )

        # reference-side builder (train_and_test.py:38-67) must agree
        budgets_t = [int(b * self.MULT) for b in default_parameter_budgets(self.C_T)]
        budgets_s = [int(b * self.MULT) for b in default_parameter_budgets(self.C_S)]
        lpl_t = ref.generate_layer_parameter_list(
            1, min(self.T_T // 4, 89), budgets_t, self.C_T
        )
        lpl_s = ref.generate_layer_parameter_list(
            1, min(self.T_S // 4, 89), budgets_s, self.C_S
        )
        assert [tuple(t) for layer in lpl_t for t in layer] == [
            tuple(t) for layer in pipe.t_ext_specs for t in layer
        ]
        feat = pipe.feat_channels
        assert feat == sum(p[1] for p in lpl_t[-1])

        cls_lpl = ref.layer_parameter_list_input_change(lpl_t, feat)
        m = {}
        m["t_ext"] = ref.OS_CNN_res(lpl_t)
        m["t_cls"] = ref.OS_CNN(cls_lpl, self.N_T)
        m["s_ext"] = ref.OS_CNN_res(lpl_s)
        s_feat = sum(p[1] for p in lpl_s[-1])
        m["dim_uni"] = ref.DimensionUnification(s_feat, feat, self.T_S, self.T_T)
        m["s_cls"] = ref.OS_CNN(cls_lpl, self.N_S)
        m["prob_trans"] = ref.ProbTransfer(feat)
        m["nf"] = ref.WaveGlow(3, feat, self.WN_CH)
        m["noise"] = ref.NoiseTransfer(feat, self.T_T, with_nvidia=False)
        m["rl"] = ref.RandomLayer([feat * self.T_T, self.N_T], with_nvidia=False)
        m["ad"] = ref.AdversarialNetworkforCDAN(1024, 1024)
        m["ad"].dropout1.p = 0.0  # deterministic training-mode forward
        m["ad"].dropout2.p = 0.0
        m["fd"] = ref.FeatureDiscriminatorforSource(feat)
        m["cpc"] = ref.CPC(feat, cfg.cpc_hidden, self.T_T // 2)
        for mod in m.values():
            if isinstance(mod, torch.nn.Module):
                mod.train()

        state = pipe.init_state(jax.random.PRNGKey(0))
        params = dict(state["params"])
        mstate = dict(state["mstate"])
        params["t_ext"], mstate["t_ext"] = os_cnn_res_params(m["t_ext"])
        params["t_cls"], mstate["t_cls"] = os_cnn_params(m["t_cls"])
        params["s_ext"], mstate["s_ext"] = os_cnn_res_params(m["s_ext"])
        params["dim_uni"] = dimension_unification_params(m["dim_uni"])
        params["s_cls"], mstate["s_cls"] = os_cnn_params(m["s_cls"])
        params["prob_trans"] = prob_transfer_params(m["prob_trans"])
        params["nf"] = waveglow_params(m["nf"])
        params["noise"] = noise_transfer_params(m["noise"])
        params["ad"] = ad_net_params(m["ad"])
        params["fd"] = feature_discriminator_params(m["fd"])
        params["cpc"] = cpc_params(m["cpc"])
        consts = {"random_layer": random_layer_params(m["rl"])}

        xt = torch.randn(self.B, self.C_T, self.T_T, requires_grad=True)
        yt = torch.randint(0, self.N_T, (self.B,))
        xs = torch.randn(self.B, self.C_S, self.T_S, requires_grad=True)
        ys = torch.randint(0, self.N_S, (self.B,))
        return pipe, m, params, mstate, consts, (xt, yt, xs, ys)

    def _reference_losses(self, ref, m, batch):
        """The reference hot-loop body, composed from the reference's own
        modules exactly as train_and_test.py:539-621 does."""
        torch = ref.torch
        xt, yt, xs, ys = batch
        ce = torch.nn.CrossEntropyLoss()
        nf_loss_mod = ref.WaveGlowLoss()
        anchors = iter(self.ANCHORS)
        with mock.patch.object(
            torch, "randint",
            side_effect=lambda *a, **k: torch.tensor([next(anchors)]),
        ):
            t_feat = m["t_ext"](xt)  # :547
            t_sl = m["cpc"](t_feat)  # :548
            s_feat = m["dim_uni"](m["s_ext"](xs))  # :549-550
            s_sl = m["cpc"](s_feat)  # :551
        t_nf_out = m["nf"](t_feat)  # :552
        s_nf_out = m["nf"](s_feat)  # :553
        t_nf = nf_loss_mod(t_nf_out)  # :554
        s_nf = nf_loss_mod(s_nf_out)  # :556
        s2t_noise = m["noise"](t_nf_out[0], s_nf_out[0])  # :560
        s2t_feat = m["nf"].infer(s2t_noise)  # :561
        t_logits, t_pool = m["t_cls"](t_feat)  # :583
        m["t_cls"].eval()  # :584 — BN stats already updated by the t pass
        s2t_logits, s2t_pool = m["t_cls"](s2t_feat)  # :585
        m["t_cls"].train()  # :586
        s_logits, s_pool = m["s_cls"](s_feat)  # :587
        t_c = ce(t_logits, yt)  # :588
        s_c = ce(s_logits, ys)  # :590
        cdan = ref.CDAN(t_feat, s2t_feat, t_logits, s2t_logits, m["ad"], m["rl"])  # :593
        t2s = m["prob_trans"](t_pool)  # :596
        s2t2s = m["prob_trans"](s2t_pool)  # :597
        s2t2s_logits = m["s_cls"].hidden(s2t2s)  # :598
        s2t2s_c = ce(s2t2s_logits, ys)  # :599
        fd = ref.wgan_loss(
            m["fd"](t2s), m["fd"](s2t2s), m["fd"](s_pool)
        )  # :601-603
        return {
            "t_nf": t_nf, "s_nf": s_nf, "t_c": t_c, "s_c": s_c,
            "t_sl": t_sl, "s_sl": s_sl, "cdan": cdan, "s2t2s_c": s2t2s_c,
            "fd": fd,
        }

    def test_all_losses_and_input_grads(self, ref, setup, monkeypatch):
        torch = ref.torch
        pipe, m, params, mstate, consts, batch = setup
        xt, yt, xs, ys = batch

        # our ad_net applies real dropout when given an rng; the torch side
        # has p=0 — disable ours for determinism (rate is not the subject)
        import feature_level_style_transfer_for_tsc_tpu.models.critics as critics

        monkeypatch.setattr(critics, "dropout", lambda key, x, rate, training: x)

        ref_losses = self._reference_losses(ref, m, batch)
        # epoch 0 staged weights (reference :665-666): total =
        # Σ w_t·loss_t + Σ w_s·loss_s + 3·cdan + 3·fd + 2·t_sl + 2·s_sl
        total_ref = (
            2 * ref_losses["t_nf"] + 5 * ref_losses["t_c"]
            + 2 * ref_losses["s_nf"] + 2 * ref_losses["s_c"]
            + 4 * ref_losses["s2t2s_c"]
            + 3 * ref_losses["cdan"] + 3 * ref_losses["fd"]
            + 2 * ref_losses["t_sl"] + 2 * ref_losses["s_sl"]
        )
        total_ref.backward()

        yt_j = t2j(yt).astype(jnp.int32)
        ys_j = t2j(ys).astype(jnp.int32)

        def run(bt, bs):
            losses, new_m, _ = pipe._phase5_forward(
                params, mstate, consts, bt, yt_j, bs, ys_j,
                jax.random.PRNGKey(0), cpc_anchors=self.ANCHORS,
            )
            total = (
                2 * losses["t_nf"] + 5 * losses["t_c"]
                + 2 * losses["s_nf"] + 2 * losses["s_c"]
                + 4 * losses["s2t2s_c"]
                + 3 * losses["cdan"] + 3 * losses["fd"]
                + 2 * losses["t_sl"] + 2 * losses["s_sl"]
            )
            return total, (losses, new_m)

        (total, (losses, new_m)), grads = jax.value_and_grad(
            run, argnums=(0, 1), has_aux=True
        )(btc(xt), btc(xs))

        for name, ref_val in ref_losses.items():
            np.testing.assert_allclose(
                float(losses[name]), float(ref_val.detach()), rtol=2e-3, atol=1e-4,
                err_msg=f"phase-5 loss {name}",
            )
        np.testing.assert_allclose(
            float(total), float(total_ref.detach()), rtol=2e-3, err_msg="total"
        )
        # d total / d inputs crosses EVERY module incl. the GRL'd critics,
        # the NoiseTransfer current-batch path, and the flow inverse
        np.testing.assert_allclose(
            bct(grads[0]), xt.grad.numpy(), rtol=2e-2, atol=2e-4,
            err_msg="d total / d target input",
        )
        np.testing.assert_allclose(
            bct(grads[1]), xs.grad.numpy(), rtol=2e-2, atol=2e-4,
            err_msg="d total / d source input",
        )
        # BN-staleness regression (the fix this test guards): the s2t eval
        # pass must see the target-pass-updated running stats.  With stale
        # (init) stats the s2t-dependent losses move by >> the tolerances
        # above, so equality on cdan/s2t2s_c IS the regression assertion;
        # double-check the updated stats really differ from the init ones.
        stale = mstate["t_cls"]["block"]["layers"][0]["bn"].mean
        fresh = new_m["t_cls"]["block"]["layers"][0]["bn"].mean
        assert float(jnp.max(jnp.abs(fresh - stale))) > 1e-3
