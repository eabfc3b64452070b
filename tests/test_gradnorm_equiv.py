"""The unified one-forward/multi-pullback GradNorm in phase5 must produce
the same trunk gradient norms and weight updates as the explicit
per-trunk recompute (the reference's autograd.grad semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from feature_level_style_transfer_for_tsc_tpu.config import FlowConfig, PipelineConfig
from feature_level_style_transfer_for_tsc_tpu.data.batching import epoch_batches
from feature_level_style_transfer_for_tsc_tpu.data.synthetic import make_dataset
from feature_level_style_transfer_for_tsc_tpu.losses.gradnorm import (
    gradnorm_step,
    per_loss_trunk_grad_norms,
)
from feature_level_style_transfer_for_tsc_tpu.models import (
    noise_transfer_apply,
    os_cnn_head,
    prob_transfer_apply,
    waveglow_forward,
    waveglow_infer,
    waveglow_loss,
)
from feature_level_style_transfer_for_tsc_tpu.train.pipeline import StyleTransferPipeline


def test_phase5_gradnorm_matches_explicit_recompute():
    cfg = PipelineConfig(
        batch_size=6, max_kernel_size=5, cdan_dim=32, cpc_hidden=8,
        budget_multiplier=0.02, flow=FlowConfig(n_flows=2, wn_channels=8, wn_layers=2),
    )
    pipe = StyleTransferPipeline(2, 16, 2, 1, 12, 3, cfg)
    state = pipe.init_state(jax.random.PRNGKey(0))
    td, sd = {}, {}
    t_train = make_dataset(6, 2, 16, 2, seed=0, label_dict=td)
    s_train = make_dataset(6, 1, 12, 3, seed=1, label_dict=sd)
    xt, yt = epoch_batches(t_train.x, t_train.y, jax.random.PRNGKey(2), 6)
    xs, ys = epoch_batches(s_train.x, s_train.y, jax.random.PRNGKey(3), 6)
    xt, yt, xs, ys = map(jnp.asarray, (xt, yt, xs, ys))
    bt, lt, bs, ls = xt[0], yt[0], xs[0], ys[0]

    # --- manual: replicate the rng split the epoch's scan performs ---
    rng = state["rng"]
    _, sub = jax.random.split(rng)
    params, mstate, consts = state["params"], state["mstate"], state["consts"]
    wn_ch = cfg.flow.wn_channels

    losses, _, feats = pipe._phase5_forward(params, mstate, consts, bt, lt, bs, ls, sub)

    def losses_of_trunk_t(trunk):
        p = dict(params)
        p["t_ext"] = dict(params["t_ext"])
        p["t_ext"]["block"] = trunk
        t_feat, _ = pipe.target_features(p, mstate, bt, True)
        t_nf = waveglow_loss(waveglow_forward(p["nf"], t_feat, wn_ch))
        t_logits, _, _ = pipe.classify_target(p, mstate, t_feat, True)
        from feature_level_style_transfer_for_tsc_tpu.losses.classification import cross_entropy

        return jnp.stack([t_nf, cross_entropy(t_logits, lt)])

    def losses_of_trunk_s(trunk):
        from feature_level_style_transfer_for_tsc_tpu.losses.classification import cross_entropy

        p = dict(params)
        p["s_ext"] = dict(params["s_ext"])
        p["s_ext"]["block"] = trunk
        s_feat, _ = pipe.source_features(p, mstate, bs, True)
        s_nf_out = waveglow_forward(p["nf"], s_feat, wn_ch)
        s_nf = waveglow_loss(s_nf_out)
        s_logits, _, _ = pipe.classify_source(p, mstate, s_feat, True)
        s_ce = cross_entropy(s_logits, ls)
        t_nf_out = waveglow_forward(p["nf"], jax.lax.stop_gradient(feats["t_feat"]), wn_ch)
        s2t_noise, _ = noise_transfer_apply(
            p["noise"], mstate["noise"], jax.lax.stop_gradient(t_nf_out[0]), s_nf_out[0]
        )
        s2t_feat = waveglow_infer(p["nf"], s2t_noise, wn_ch)
        _, s2t_pool, _ = pipe.classify_target(p, mstate, s2t_feat, False)
        s2t2s_pool = prob_transfer_apply(p["prob_trans"], s2t_pool)
        s2t2s_logits = os_cnn_head(p["s_cls"], s2t2s_pool)
        return jnp.stack([s_nf, s_ce, cross_entropy(s2t2s_logits, ls)])

    lt_vec, n_t = per_loss_trunk_grad_norms(losses_of_trunk_t, params["t_ext"]["block"], 2)
    ls_vec, n_s = per_loss_trunk_grad_norms(losses_of_trunk_s, params["s_ext"]["block"], 3)
    gn_t_expect = gradnorm_step(
        state["gradnorm"]["t"], lt_vec, n_t, pipe.tx_weights_t,
        alpha=cfg.gradnorm.alpha, weight_sum=cfg.gradnorm.weights_t_sum,
    )
    gn_s_expect = gradnorm_step(
        state["gradnorm"]["s"], ls_vec, n_s, pipe.tx_weights_s,
        alpha=cfg.gradnorm.alpha, weight_sum=cfg.gradnorm.weights_s_sum,
    )

    # --- actual: one-batch phase5 epoch ---
    new_state, _ = pipe.phase5_epoch(
        state, xt[:1], yt[:1], xs[:1], ys[:1], jnp.asarray(0)
    )
    np.testing.assert_allclose(
        np.asarray(new_state["gradnorm"]["t"].weights),
        np.asarray(gn_t_expect.weights), rtol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(new_state["gradnorm"]["s"].weights),
        np.asarray(gn_s_expect.weights), rtol=2e-4,
    )
