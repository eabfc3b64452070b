"""The five-phase feature-level style-transfer training pipeline.

TPU-native re-design of the reference's 777-line `train()`
(`/root/reference/train_and_test.py:22-798`).  The curriculum, losses,
optimizer groups, scheduler cadences and GradNorm dynamics are replicated;
the execution model is not: every phase-epoch is ONE jitted function that
`lax.scan`s over stacked batches with all mutable state (BatchNorm stats,
NoiseTransfer averages, critic GRL counters, GradNorm weights, optimizer
hyperparams) carried explicitly — no per-batch host syncs.

Phases (reference line refs):
  1 target pretrain, 3 epochs:   CE_t + CPC_t                     (:141-180)
  2 source pretrain, 70 epochs:  CE_s (through DimensionUnification) (:181-220)
  3 self-supervised, 325 epochs: CPC_t+CPC_s (+0.8 CE_t + 1.2 CE_s every
    50th epoch, classifier heads frozen otherwise)                (:221-363)
  4 NF pretrain, 600 epochs:     flow NLL on detached features (joint with
    5*CE + 3*CPC every 75th epoch)                                (:374-494)
  5 joint adversarial, 720 epochs: GradNorm-weighted NF+CE+s2t2s losses +
    epoch-staged CDAN / WGAN-critic / CPC terms, WGAN clipping    (:513-797)
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from ..data.batching import epoch_batches
from ..losses.cdan import cdan_loss
from ..losses.classification import cross_entropy
from ..losses.gradnorm import gradnorm_init, gradnorm_step
from ..losses.wgan import wgan_loss
from ..models import (
    ad_net_init,
    cpc_apply,
    cpc_apply_pair,
    cpc_init,
    dimension_unification_apply,
    dimension_unification_init,
    feature_discriminator_apply,
    feature_discriminator_init,
    generate_layer_parameter_list,
    layer_parameter_list_input_change,
    noise_transfer_apply,
    noise_transfer_init,
    os_block_masks,
    os_cnn_apply,
    os_cnn_head,
    os_cnn_init,
    os_cnn_res_apply,
    os_cnn_res_init,
    prob_transfer_apply,
    prob_transfer_init,
    random_layer_init,
    receptive_field,
    total_out_channels,
    waveglow_forward_pair,
    waveglow_infer,
    waveglow_init,
    waveglow_loss,
)
from ..models.structure import default_parameter_budgets
from .optim import (
    clip_params,
    fused_rmsprop_init,
    fused_rmsprop_update,
    make_adam,
    make_rmsprop,
    plateau_init,
    plateau_step,
    set_lr,
    step_lr,
)

import optax

# module -> (base_lr attr, stepLR (step,gamma) or None-if-plateau)
STEPLR_MODULES = ("t_ext", "t_cls", "s_ext", "dim_uni", "s_cls", "noise", "cpc")
PLATEAU_MODULES = ("prob_trans", "nf", "ad", "fd")


class StyleTransferPipeline:
    """Static definition of the paired target/source model stack."""

    def __init__(
        self,
        target_channels: int,
        target_length: int,
        target_classes: int,
        source_channels: int,
        source_length: int,
        source_classes: int,
        config: Optional[PipelineConfig] = None,
    ):
        self.config = config or PipelineConfig()
        cfg = self.config
        self.t_shape = (target_channels, target_length, target_classes)
        self.s_shape = (source_channels, source_length, source_classes)

        # --- architecture builder (reference :38-67) ---
        rf_t = receptive_field(target_length, cfg.max_kernel_size)
        budgets_t = [int(b * cfg.budget_multiplier) for b in default_parameter_budgets(target_channels)]
        self.t_ext_specs = generate_layer_parameter_list(1, rf_t, budgets_t, target_channels)
        self.feat_channels = total_out_channels(self.t_ext_specs[-1])
        self.cls_specs = layer_parameter_list_input_change(
            self.t_ext_specs, self.feat_channels
        )
        rf_s = receptive_field(source_length, cfg.max_kernel_size)
        budgets_s = [int(b * cfg.budget_multiplier) for b in default_parameter_budgets(source_channels)]
        self.s_ext_specs = generate_layer_parameter_list(1, rf_s, budgets_s, source_channels)
        self.s_feat_channels = total_out_channels(self.s_ext_specs[-1])

        self.t_ext_masks = [jnp.asarray(m) for m in os_block_masks(self.t_ext_specs)]
        self.cls_masks = [jnp.asarray(m) for m in os_block_masks(self.cls_specs)]
        self.s_ext_masks = [jnp.asarray(m) for m in os_block_masks(self.s_ext_specs)]
        self.compute_dtype = (
            jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        )
        # opt-in flow stabilizer (config.log_s_clamp; 0.0 = reference exact)
        self.log_s_clamp = float(cfg.log_s_clamp)

        # --- optimizers (reference :97-134) ---
        o = cfg.optim
        self.tx = {
            "t_ext": make_rmsprop(o.lr_target_ext),
            "t_cls": make_rmsprop(o.lr_target_cls),
            "s_ext": make_rmsprop(o.lr_source_ext),
            "dim_uni": make_rmsprop(o.lr_dim_uni),
            "s_cls": make_rmsprop(o.lr_source_cls),
            "prob_trans": make_rmsprop(o.lr_prob_trans),
            "nf": make_rmsprop(o.lr_nf),
            "noise": make_rmsprop(o.lr_noise_trans),
            "ad": make_rmsprop(o.lr_ad_net),
            "fd": make_rmsprop(o.lr_feat_disc),
            "cpc": make_adam(o.lr_cpc),
        }
        g = cfg.gradnorm
        self.tx_weights_t = optax.adam(g.lr_weights_t)
        self.tx_weights_s = optax.adam(g.lr_weights_s)

        # fused RMSprop: the 10 torch-RMSprop modules as one flat update
        # (SORTED order must match jax's dict-pytree flattening order)
        self.rms_modules = tuple(sorted(
            ("t_ext", "t_cls", "s_ext", "dim_uni", "s_cls", "prob_trans",
             "nf", "noise", "ad", "fd")
        ))
        self.rms_index = {n: i for i, n in enumerate(self.rms_modules)}
        self.rms_base_lrs = [
            {"t_ext": o.lr_target_ext, "t_cls": o.lr_target_cls,
             "s_ext": o.lr_source_ext, "dim_uni": o.lr_dim_uni,
             "s_cls": o.lr_source_cls, "prob_trans": o.lr_prob_trans,
             "nf": o.lr_nf, "noise": o.lr_noise_trans,
             "ad": o.lr_ad_net, "fd": o.lr_feat_disc}[n]
            for n in self.rms_modules
        ]

    # ----------------------------------------------------------------------
    # state
    # ----------------------------------------------------------------------

    def init_state(self, key: jax.Array) -> Dict:
        cfg = self.config
        (c_t, t_t, n_t), (c_s, t_s, n_s) = self.t_shape, self.s_shape
        keys = jax.random.split(key, 13)
        t_ext_p, t_ext_s = os_cnn_res_init(keys[0], self.t_ext_specs)
        t_cls_p, t_cls_s = os_cnn_init(keys[1], self.cls_specs, n_t)
        s_ext_p, s_ext_s = os_cnn_res_init(keys[2], self.s_ext_specs)
        dim_uni_p = dimension_unification_init(
            keys[3], self.s_feat_channels, self.feat_channels, t_s, t_t
        )
        s_cls_p, s_cls_s = os_cnn_init(keys[4], self.cls_specs, n_s)
        prob_trans_p = prob_transfer_init(keys[5], self.feat_channels)
        nf_p = waveglow_init(
            keys[6], cfg.flow.n_flows, self.feat_channels, cfg.flow.wn_channels,
            cfg.flow.wn_layers,
        )
        noise_p, noise_s = noise_transfer_init(keys[7], self.feat_channels, t_t)
        ad_p, ad_s = ad_net_init(keys[8], cfg.cdan_dim, 1024)
        fd_p, fd_s = feature_discriminator_init(keys[9], self.feat_channels)
        cpc_p = cpc_init(keys[10], self.feat_channels, cfg.cpc_hidden, t_t // 2)
        random_layer = random_layer_init(
            keys[11], [self.feat_channels * t_t, n_t], cfg.cdan_dim
        )

        params = {
            "t_ext": t_ext_p, "t_cls": t_cls_p, "s_ext": s_ext_p,
            "dim_uni": dim_uni_p, "s_cls": s_cls_p, "prob_trans": prob_trans_p,
            "nf": nf_p, "noise": noise_p, "ad": ad_p, "fd": fd_p, "cpc": cpc_p,
        }
        mstate = {
            "t_ext": t_ext_s, "t_cls": t_cls_s, "s_ext": s_ext_s, "s_cls": s_cls_s,
            "noise": noise_s, "ad": ad_s, "fd": fd_s,
        }
        if cfg.fused_optimizers:
            opt = {
                "fused": fused_rmsprop_init(
                    {n: params[n] for n in self.rms_modules}, self.rms_base_lrs
                ),
                "cpc": self.tx["cpc"].init(params["cpc"]),
            }
        else:
            opt = {name: self.tx[name].init(params[name]) for name in self.tx}
        o = cfg.optim
        g = cfg.gradnorm
        return {
            "params": params,
            "mstate": mstate,
            "consts": {"random_layer": random_layer},
            "opt": opt,
            "sched": {name: jnp.zeros((), jnp.int32) for name in STEPLR_MODULES},
            "plateau": {
                "prob_trans": plateau_init(o.lr_prob_trans),
                "nf": plateau_init(o.lr_nf),
                "ad": plateau_init(o.lr_ad_net),
                "fd": plateau_init(o.lr_feat_disc),
            },
            "gradnorm": {
                "t": gradnorm_init(g.weights_t_init, self.tx_weights_t),
                "s": gradnorm_init(g.weights_s_init, self.tx_weights_s),
            },
            "rng": keys[12],
        }

    # ----------------------------------------------------------------------
    # forward building blocks
    # ----------------------------------------------------------------------

    def target_features(self, params, mstate, x, training, fused_infer=False):
        feat, new_s = os_cnn_res_apply(
            params["t_ext"], mstate["t_ext"], self.t_ext_masks, x, training,
            compute_dtype=self.compute_dtype, fused_infer=fused_infer,
        )
        return feat, new_s

    def source_features(self, params, mstate, x, training, fused_infer=False):
        """s_ext + DimensionUnification -> target-shaped features."""
        feat, new_s = os_cnn_res_apply(
            params["s_ext"], mstate["s_ext"], self.s_ext_masks, x, training,
            compute_dtype=self.compute_dtype, fused_infer=fused_infer,
        )
        return dimension_unification_apply(params["dim_uni"], feat), new_s

    def classify_target(self, params, mstate, feat, training, fused_infer=False):
        return os_cnn_apply(
            params["t_cls"], mstate["t_cls"], self.cls_masks, feat, training,
            compute_dtype=self.compute_dtype, fused_infer=fused_infer,
        )

    def classify_source(self, params, mstate, feat, training, fused_infer=False):
        return os_cnn_apply(
            params["s_cls"], mstate["s_cls"], self.cls_masks, feat, training,
            compute_dtype=self.compute_dtype, fused_infer=fused_infer,
        )

    # ----------------------------------------------------------------------
    # generic optimizer machinery
    # ----------------------------------------------------------------------

    def _rms_mask_and_offsets(self, params, names):
        """Static flat step-mask + per-module (start, end) offsets; flat
        order matches jax's sorted-dict pytree flattening."""
        mask, offsets, pos = [], {}, 0
        for n in self.rms_modules:
            size = sum(
                int(np.prod(l.shape))
                for l in jax.tree_util.tree_leaves(params[n])
            )
            offsets[n] = (pos, pos + size)
            pos += size
            mask.append(np.full(size, 1.0 if n in names else 0.0, np.float32))
        return np.concatenate(mask), offsets

    def _apply_updates(self, params, opt, grads, names):
        new_params = dict(params)
        new_opt = dict(opt)
        rms_names = tuple(n for n in names if n in self.rms_index)
        if self.config.fused_optimizers:
            if rms_names:
                mask, _ = self._rms_mask_and_offsets(params, rms_names)
                sub, new_opt["fused"] = fused_rmsprop_update(
                    {n: params[n] for n in self.rms_modules},
                    {n: grads[n] for n in self.rms_modules},
                    opt["fused"], mask,
                )
                new_params.update(sub)
            rest = tuple(n for n in names if n not in self.rms_index)
        else:
            rest = names
        for name in rest:
            upd, new_opt[name] = self.tx[name].update(grads[name], opt[name], params[name])
            new_params[name] = optax.apply_updates(params[name], upd)
        return new_params, new_opt

    def _set_module_lr(self, state, name, lr):
        """Write a module's LR into whichever optimizer layout is active."""
        if self.config.fused_optimizers and name in self.rms_index:
            _, offsets = self._rms_mask_and_offsets(state["params"], ())
            lo, hi = offsets[name]
            f = state["opt"]["fused"]
            state["opt"]["fused"] = f._replace(
                lr=f.lr.at[lo:hi].set(jnp.asarray(lr, jnp.float32))
            )
        else:
            state["opt"][name] = set_lr(state["opt"][name], lr)
        return state

    def _step_steplr(self, state, names):
        """Increment scheduler counters and refresh LRs (torch StepLR)."""
        o = self.config.optim
        base = {
            "t_ext": (o.lr_target_ext, o.steplr_step, o.steplr_gamma),
            "t_cls": (o.lr_target_cls, o.steplr_step, o.steplr_gamma),
            "s_ext": (o.lr_source_ext, o.steplr_step, o.steplr_gamma),
            "dim_uni": (o.lr_dim_uni, o.steplr_step, o.steplr_gamma),
            "s_cls": (o.lr_source_cls, o.steplr_step, o.steplr_gamma),
            "noise": (o.lr_noise_trans, o.noise_steplr_step, o.noise_steplr_gamma),
            "cpc": (o.lr_cpc, o.steplr_step, o.cpc_steplr_gamma),
        }
        for n in names:
            state["sched"][n] = state["sched"][n] + 1
            lr0, step, gamma = base[n]
            state = self._set_module_lr(state, n, step_lr(lr0, state["sched"][n], step, gamma))
        return state

    def _step_plateau(self, state, name, metric):
        o = self.config.optim
        ps = plateau_step(
            state["plateau"][name], metric, factor=o.plateau_factor, min_lr=o.plateau_min_lr
        )
        state["plateau"][name] = ps
        return self._set_module_lr(state, name, ps.lr)

    # ----------------------------------------------------------------------
    # phase 1: target pretrain (reference :141-180)
    # ----------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def phase1_epoch(self, state, xb, yb):
        def loss_fn(params, mstate, x, y, rng):
            feat, t_ext_s = self.target_features(params, mstate, x, True)
            sl = cpc_apply(params["cpc"], feat, rng)
            logits, _, t_cls_s = self.classify_target(params, mstate, feat, True)
            ce = cross_entropy(logits, y)
            new_m = dict(mstate)
            new_m.update({"t_ext": t_ext_s, "t_cls": t_cls_s})
            return ce + sl, (ce, sl, new_m)

        def step(carry, batch):
            params, mstate, opt, rng = carry
            x, y = batch
            rng, sub = jax.random.split(rng)
            grads, (ce, sl, new_m) = jax.grad(loss_fn, has_aux=True)(params, mstate, x, y, sub)
            params, opt = self._apply_updates(params, opt, grads, ("t_ext", "t_cls", "cpc"))
            return (params, new_m, opt, rng), (ce, sl)

        (params, mstate, opt, rng), (ces, sls) = jax.lax.scan(
            step, (state["params"], state["mstate"], state["opt"], state["rng"]), (xb, yb)
        )
        state = dict(state)
        state.update(params=params, mstate=mstate, opt=opt, rng=rng)
        state = self._step_steplr(state, ("t_ext", "t_cls", "cpc"))
        return state, {"t_c_loss": jnp.mean(ces), "t_sl_loss": jnp.mean(sls)}

    # ----------------------------------------------------------------------
    # phase 2: source pretrain (reference :181-220)
    # ----------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def phase2_epoch(self, state, xb, yb):
        def loss_fn(params, mstate, x, y):
            feat, s_ext_s = self.source_features(params, mstate, x, True)
            logits, _, s_cls_s = self.classify_source(params, mstate, feat, True)
            ce = cross_entropy(logits, y)
            new_m = dict(mstate)
            new_m.update({"s_ext": s_ext_s, "s_cls": s_cls_s})
            return ce, (ce, new_m)

        def step(carry, batch):
            params, mstate, opt = carry
            x, y = batch
            grads, (ce, new_m) = jax.grad(loss_fn, has_aux=True)(params, mstate, x, y)
            params, opt = self._apply_updates(params, opt, grads, ("s_ext", "dim_uni", "s_cls"))
            return (params, new_m, opt), ce

        (params, mstate, opt), ces = jax.lax.scan(
            step, (state["params"], state["mstate"], state["opt"]), (xb, yb)
        )
        state = dict(state)
        state.update(params=params, mstate=mstate, opt=opt)
        state = self._step_steplr(state, ("s_ext", "dim_uni", "s_cls"))
        return state, {"s_c_loss": jnp.mean(ces)}

    # ----------------------------------------------------------------------
    # phase 3: joint self-supervised (reference :221-363)
    # ----------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 6))
    def phase3_epoch(self, state, xt, yt, xs, ys, supervised: bool):
        def loss_fn(params, mstate, bt, lt, bs, ls, rng):
            r1, r2 = jax.random.split(rng)
            t_feat, t_ext_s = self.target_features(params, mstate, bt, True)
            t_logits, _, t_cls_s = self.classify_target(params, mstate, t_feat, True)
            t_ce = cross_entropy(t_logits, lt)
            s_feat, s_ext_s = self.source_features(params, mstate, bs, True)
            # one vmapped scan for both CPC losses (models/cpc.py)
            t_sl, s_sl = cpc_apply_pair(params["cpc"], t_feat, s_feat, r1, r2)
            s_logits, _, s_cls_s = self.classify_source(params, mstate, s_feat, True)
            s_ce = cross_entropy(s_logits, ls)
            if supervised:  # every 50th epoch (reference :260)
                total = t_sl + s_sl + 0.8 * t_ce + 1.2 * s_ce
            else:  # heads frozen (reference :328-342)
                total = t_sl + s_sl
            new_m = dict(mstate)
            new_m.update(
                {"t_ext": t_ext_s, "t_cls": t_cls_s, "s_ext": s_ext_s, "s_cls": s_cls_s}
            )
            return total, ((t_ce, t_sl, s_ce, s_sl), new_m)

        stepped = (
            ("t_ext", "t_cls", "cpc", "s_ext", "dim_uni", "s_cls")
            if supervised
            else ("t_ext", "cpc", "s_ext", "dim_uni")
        )

        def step(carry, batch):
            params, mstate, opt, rng = carry
            bt, lt, bs, ls = batch
            rng, sub = jax.random.split(rng)
            grads, (losses, new_m) = jax.grad(loss_fn, has_aux=True)(
                params, mstate, bt, lt, bs, ls, sub
            )
            params, opt = self._apply_updates(params, opt, grads, stepped)
            return (params, new_m, opt, rng), losses

        (params, mstate, opt, rng), losses = jax.lax.scan(
            step, (state["params"], state["mstate"], state["opt"], state["rng"]),
            (xt, yt, xs, ys),
        )
        state = dict(state)
        state.update(params=params, mstate=mstate, opt=opt, rng=rng)
        state = self._step_steplr(
            state,
            ("t_ext", "t_cls", "cpc", "s_ext", "dim_uni", "s_cls")
            if supervised
            else ("t_ext", "cpc", "s_ext", "dim_uni"),
        )
        t_ce, t_sl, s_ce, s_sl = losses
        return state, {
            "t_c_loss": jnp.mean(t_ce), "t_sl_loss": jnp.mean(t_sl),
            "s_c_loss": jnp.mean(s_ce), "s_sl_loss": jnp.mean(s_sl),
        }

    # ----------------------------------------------------------------------
    # phase 4: NF pretrain (reference :374-494)
    # ----------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 6))
    def phase4_epoch(self, state, xt, yt, xs, ys, supervised: bool):
        wn_ch = self.config.flow.wn_channels

        def loss_fn(params, mstate, bt, lt, bs, ls, rng):
            new_m = dict(mstate)
            if supervised:  # every 75th epoch: joint with CE + CPC (:388-420)
                r1, r2 = jax.random.split(rng)
                t_feat, new_m["t_ext"] = self.target_features(params, mstate, bt, True)
                t_logits, _, new_m["t_cls"] = self.classify_target(params, mstate, t_feat, True)
                t_ce = cross_entropy(t_logits, lt)
                s_feat, new_m["s_ext"] = self.source_features(params, mstate, bs, True)
                t_sl, s_sl = cpc_apply_pair(params["cpc"], t_feat, s_feat, r1, r2)
                s_logits, _, new_m["s_cls"] = self.classify_source(params, mstate, s_feat, True)
                s_ce = cross_entropy(s_logits, ls)
                t_out, s_out = waveglow_forward_pair(params["nf"], t_feat, s_feat, wn_ch, self.log_s_clamp)
                t_nf = waveglow_loss(t_out)
                s_nf = waveglow_loss(s_out)
                total = t_nf + s_nf + 5 * t_ce + 5 * s_ce + 3 * t_sl + 3 * s_sl
                return total, ((t_nf, s_nf, t_ce, s_ce), new_m)
            else:  # pure flow likelihood on DETACHED features (:466-481)
                t_feat, new_m["t_ext"] = self.target_features(params, mstate, bt, True)
                s_feat, new_m["s_ext"] = self.source_features(params, mstate, bs, True)
                t_feat = jax.lax.stop_gradient(t_feat)
                s_feat = jax.lax.stop_gradient(s_feat)
                t_out, s_out = waveglow_forward_pair(params["nf"], t_feat, s_feat, wn_ch, self.log_s_clamp)
                t_nf = waveglow_loss(t_out)
                s_nf = waveglow_loss(s_out)
                total = t_nf + s_nf
                zero = jnp.zeros(())
                return total, ((t_nf, s_nf, zero, zero), new_m)

        # In the unsupervised branch the reference steps t_ext/s_ext/dim_uni
        # too, but their grads are None after detach so torch skips them —
        # only the flow actually trains (:483-489).
        stepped = (
            ("t_ext", "t_cls", "s_ext", "dim_uni", "s_cls", "nf", "cpc")
            if supervised
            else ("nf",)
        )

        def step(carry, batch):
            params, mstate, opt, rng = carry
            bt, lt, bs, ls = batch
            rng, sub = jax.random.split(rng)
            grads, (losses, new_m) = jax.grad(loss_fn, has_aux=True)(
                params, mstate, bt, lt, bs, ls, sub
            )
            params, opt = self._apply_updates(params, opt, grads, stepped)
            return (params, new_m, opt, rng), losses

        (params, mstate, opt, rng), losses = jax.lax.scan(
            step, (state["params"], state["mstate"], state["opt"], state["rng"]),
            (xt, yt, xs, ys),
        )
        state = dict(state)
        state.update(params=params, mstate=mstate, opt=opt, rng=rng)
        sched_names = (
            ("t_ext", "t_cls", "s_ext", "dim_uni", "s_cls", "cpc")
            if supervised
            else ("t_ext", "s_ext", "dim_uni")
        )
        state = self._step_steplr(state, sched_names)
        t_nf, s_nf, t_ce, s_ce = losses
        # nf plateau stepped with the LAST batch's total loss (:444,:494)
        last_total = (
            t_nf[-1] + s_nf[-1] + 5 * t_ce[-1] + 5 * s_ce[-1]
            if supervised
            else t_nf[-1] + s_nf[-1]
        )
        state = self._step_plateau(state, "nf", last_total)
        return state, {
            "t_nf_loss": jnp.mean(t_nf), "s_nf_loss": jnp.mean(s_nf),
            "t_c_loss": jnp.mean(t_ce), "s_c_loss": jnp.mean(s_ce),
        }

    # ----------------------------------------------------------------------
    # phase 5: joint adversarial training (reference :513-797)
    # ----------------------------------------------------------------------

    def _phase5_forward(
        self, params, mstate, consts, bt, lt, bs, ls, rng, cpc_anchors=None,
    ):
        """The full hot-loop forward (reference :539-621).  Returns every
        loss plus updated model state.  ``cpc_anchors`` pins the two CPC
        anchor draws (parity tests only)."""
        wn_ch = self.config.flow.wn_channels
        r1, r2, r3 = jax.random.split(rng, 3)
        new_m = dict(mstate)

        t_feat, new_m["t_ext"] = self.target_features(params, mstate, bt, True)
        s_feat, new_m["s_ext"] = self.source_features(params, mstate, bs, True)
        # batched pair passes: one CPC scan, one flow traversal (exact)
        t_sl, s_sl = cpc_apply_pair(
            params["cpc"], t_feat, s_feat, r1, r2, anchors=cpc_anchors
        )
        t_nf_out, s_nf_out = waveglow_forward_pair(
            params["nf"], t_feat, s_feat, wn_ch, self.log_s_clamp
        )
        t_nf_loss = waveglow_loss(t_nf_out)
        s_nf_loss = waveglow_loss(s_nf_out)
        t_noise, s_noise = t_nf_out[0], s_nf_out[0]
        s2t_noise, new_m["noise"] = noise_transfer_apply(
            params["noise"], mstate["noise"], t_noise, s_noise
        )
        s2t_feat = waveglow_infer(
            params["nf"], s2t_noise, wn_ch, log_s_clamp=self.log_s_clamp,
        )

        t_logits, t_pool, new_m["t_cls"] = self.classify_target(params, mstate, t_feat, True)
        # eval-mode flip for the s2t pass: running BN stats, no stat update.
        # The reference's in-place BatchNorm means this eval pass sees stats
        # *just updated* by the same batch's target pass (train_and_test.py
        # :583-586), so read from new_m, not the pre-batch mstate.
        s2t_logits, s2t_pool, _ = self.classify_target(params, new_m, s2t_feat, False)
        s_logits, s_pool, new_m["s_cls"] = self.classify_source(params, mstate, s_feat, True)

        t_c_loss = cross_entropy(t_logits, lt)
        s_c_loss = cross_entropy(s_logits, ls)

        cdan, new_m["ad"] = cdan_loss(
            params["ad"], mstate["ad"], t_feat, s2t_feat, t_logits, s2t_logits,
            random_layer=consts["random_layer"], training=True, dropout_rng=r3,
        )

        t2s_pool = prob_transfer_apply(params["prob_trans"], t_pool)
        s2t2s_pool = prob_transfer_apply(params["prob_trans"], s2t_pool)
        s2t2s_logits = os_cnn_head(params["s_cls"], s2t2s_pool)
        s2t2s_c_loss = cross_entropy(s2t2s_logits, ls)

        fd_t, fd_state = feature_discriminator_apply(
            params["fd"], mstate["fd"], t2s_pool, training=True
        )
        fd_s2t2s, fd_state = feature_discriminator_apply(
            params["fd"], fd_state, s2t2s_pool, training=True
        )
        fd_src, new_m["fd"] = feature_discriminator_apply(
            params["fd"], fd_state, s_pool, training=True
        )
        fd_loss = wgan_loss(fd_t, fd_s2t2s, fd_src)

        losses = {
            "t_nf": t_nf_loss, "s_nf": s_nf_loss, "t_c": t_c_loss, "s_c": s_c_loss,
            "t_sl": t_sl, "s_sl": s_sl, "cdan": cdan, "s2t2s_c": s2t2s_c_loss,
            "fd": fd_loss,
        }
        feats = {
            "t_feat": t_feat, "s2t_feat": s2t_feat, "s_feat": s_feat,
            "s_pool": s_pool, "t2s_pool": t2s_pool, "s2t2s_pool": s2t2s_pool,
        }
        return losses, new_m, feats

    @staticmethod
    def _staged_weights(epoch):
        """Epoch-staged adversarial/CPC coefficients (reference :665-672)."""
        stages = jnp.asarray(
            [
                [3.0, 3.0, 2.0, 2.0],
                [2.0, 3.0, 1.8, 1.5],
                [1.5, 2.0, 1.8, 1.8],
                [1.5, 1.5, 2.5, 2.5],
            ]
        )
        idx = jnp.sum(jnp.asarray(epoch) >= jnp.asarray([12, 24, 50]))
        return stages[idx]

    @functools.partial(jax.jit, static_argnums=(0, 7))
    def phase5_epoch(self, state, xt, yt, xs, ys, epoch, collect_features: bool = False):
        cfg = self.config

        def total_loss_fn(
            params, mstate, consts, gw_t, gw_s, bt, lt, bs, ls, rng, epoch,
        ):
            losses, new_m, feats = self._phase5_forward(
                params, mstate, consts, bt, lt, bs, ls, rng,
            )
            loss_t = jnp.stack([losses["t_nf"], losses["t_c"]])
            loss_s = jnp.stack([losses["s_nf"], losses["s_c"], losses["s2t2s_c"]])
            base = jnp.sum(jax.lax.stop_gradient(gw_t) * loss_t) + jnp.sum(
                jax.lax.stop_gradient(gw_s) * loss_s
            )
            w = self._staged_weights(epoch)
            total = (
                base
                + w[0] * losses["cdan"]
                + w[1] * losses["fd"]
                + w[2] * losses["t_sl"]
                + w[3] * losses["s_sl"]
            )
            return total, (losses, new_m, feats)

        def step(carry, batch):
            params, mstate, opt, gn, rng = carry
            bt, lt, bs, ls = batch
            rng, sub = jax.random.split(rng)

            # ONE forward; one VJP pullback per output: [total | t-losses |
            # s-losses].  Seeding the pullback with a one-hot CONSTANT lets
            # XLA dead-code-eliminate the other outputs' backward branches,
            # so each per-loss pull traverses only that loss's ancestors —
            # the same work as the reference's ``autograd.grad(loss_i,
            # shared_trunk)`` (train_and_test.py:681-690) without its two
            # extra forward recomputes.
            def all_losses(p):
                total, (losses, new_m, feats) = total_loss_fn(
                    p, mstate, state["consts"], gn["t"].weights, gn["s"].weights,
                    bt, lt, bs, ls, sub, epoch,
                )
                vec = jnp.stack(
                    [total, losses["t_nf"], losses["t_c"], losses["s_nf"],
                     losses["s_c"], losses["s2t2s_c"]]
                )
                return vec, (losses, new_m, feats)

            vec, pullback, (losses, new_m, feats) = jax.vjp(
                all_losses, params, has_aux=True
            )

            # (Deleted round 5: `xonly_pullbacks`, a second vjp routing the
            # trunk pulls through an input-grad-only fused-WN backward.  It
            # measured 1.13-1.15x at K<=8 but was an fp-schedule perturbation
            # that relocated a non-finite RMSprop basin unpredictably across
            # program geometries — wrong in both directions within round 4.
            # Ledger: docs/DESIGN.md "GradNorm pullback knobs".)

            def pull(i, pb=pullback):
                (g,) = pb(jnp.asarray(np.eye(6, dtype=np.float32)[i]))
                return g

            def trunk_norm(g, trunk_key):
                leaves = jax.tree_util.tree_leaves(g[trunk_key]["block"])
                return jnp.sum(jnp.stack([jnp.linalg.norm(l.reshape(-1)) for l in leaves]))

            # (Measured alternative: vmapping the pullback over ALL of
            # eye(6) to batch the 6 backwards into one loses the
            # constant-seed DCE — every pull then traverses the full graph —
            # and ran 0.40x on the v5e.  config.stacked_pullbacks batches
            # only the flow-traversing rows instead, keeping the
            # classifier pull's DCE.)
            if cfg.merged_pullbacks:
                # Structural-zero merge: t_nf sees only the t_ext trunk and
                # s_nf only s_ext (waveglow_forward_pair is per-sample, so
                # d t_nf/d s_feat == 0 and vice versa); t_c/s_c likewise.
                # One pullback seeded with BOTH one-hots therefore returns
                # both per-loss trunk grads exactly — 6 backwards -> 4.
                # s2t2s_c touches BOTH trunks (s2t_feat descends from
                # t_noise), so its pull stays solo and only its s_ext norm
                # is read (reference semantics, train_and_test.py:688-690).
                eye = np.eye(6, dtype=np.float32)

                def pull_seed(seed, pb=pullback):
                    (g,) = pb(jnp.asarray(seed))
                    return g

                if cfg.stacked_pullbacks:
                    # Batch the flow-traversing pulls — [total,] nf-merged,
                    # s2t2s — as ONE vmapped pullback over a stacked
                    # cotangent matrix: the flow backward (dominant under
                    # the K-run vmap, results_vmap_phase5_breakdown.json)
                    # runs once with a small cotangent batch instead of
                    # once per pull.  The classifier pull stays separate:
                    # its constant one-hot seed lets XLA's DCE skip the
                    # flow backward entirely, which batching would forfeit.
                    # Same pullback linear map, batched (exactness tested
                    # in tests/test_multirun.py).
                    rows = np.stack([eye[0], eye[1] + eye[3], eye[5]])
                    g_rows = jax.vmap(lambda s: pullback(s)[0])(
                        jnp.asarray(rows)
                    )
                    grads = jax.tree_util.tree_map(lambda l: l[0], g_rows)
                    g_nf = jax.tree_util.tree_map(lambda l: l[1], g_rows)
                    g_5 = jax.tree_util.tree_map(lambda l: l[2], g_rows)
                else:
                    grads = pull(0)
                    g_nf = pull_seed(eye[1] + eye[3])
                    g_5 = pull_seed(eye[5])
                g_c = pull_seed(eye[2] + eye[4])
                n_t = jnp.stack(
                    [trunk_norm(g_nf, "t_ext"), trunk_norm(g_c, "t_ext")]
                )
                n_s = jnp.stack(
                    [trunk_norm(g_nf, "s_ext"), trunk_norm(g_c, "s_ext"),
                     trunk_norm(g_5, "s_ext")]
                )
            else:
                grads = pull(0)
                n_t = jnp.stack(
                    [trunk_norm(pull(i), "t_ext") for i in (1, 2)]
                )
                n_s = jnp.stack(
                    [trunk_norm(pull(i), "s_ext") for i in (3, 4, 5)]
                )
            losses_t_vec = vec[1:3]
            losses_s_vec = vec[3:6]
            gn_t = gradnorm_step(
                gn["t"], losses_t_vec, n_t, self.tx_weights_t,
                alpha=cfg.gradnorm.alpha, weight_sum=cfg.gradnorm.weights_t_sum,
            )
            gn_s = gradnorm_step(
                gn["s"], losses_s_vec, n_s, self.tx_weights_s,
                alpha=cfg.gradnorm.alpha, weight_sum=cfg.gradnorm.weights_s_sum,
            )

            # ---- module updates: all 10 + cpc (reference :750-753) ----
            params, opt = self._apply_updates(
                params, opt, grads,
                ("t_ext", "t_cls", "s_ext", "dim_uni", "s_cls", "prob_trans",
                 "nf", "noise", "ad", "fd", "cpc"),
            )
            # WGAN clipping (reference :763-766)
            params["ad"] = clip_params(params["ad"], cfg.optim.ad_net_clip)
            params["fd"] = clip_params(params["fd"], cfg.optim.feat_disc_clip)

            outs = (losses, feats) if collect_features else (losses,)
            return (params, new_m, opt, {"t": gn_t, "s": gn_s}, rng), outs

        carry0 = (
            state["params"], state["mstate"], state["opt"], state["gradnorm"], state["rng"]
        )
        carry, outs = jax.lax.scan(step, carry0, (xt, yt, xs, ys))
        params, mstate, opt, gn, rng = carry
        losses = outs[0]
        state = dict(state)
        state.update(params=params, mstate=mstate, opt=opt, gradnorm=gn, rng=rng)

        # per-epoch schedulers (reference :767-777)
        state = self._step_steplr(
            state, ("t_ext", "t_cls", "cpc", "s_ext", "dim_uni", "s_cls", "noise")
        )
        state = self._step_plateau(state, "prob_trans", losses["s2t2s_c"][-1])
        state = self._step_plateau(state, "nf", losses["t_nf"][-1])
        state = self._step_plateau(state, "ad", losses["cdan"][-1])
        state = self._step_plateau(state, "fd", losses["fd"][-1])

        metrics = {k: jnp.mean(v) for k, v in losses.items()}
        metrics["gradnorm_w_t"] = gn["t"].weights
        metrics["gradnorm_w_s"] = gn["s"].weights
        if collect_features:
            return state, metrics, outs[1]
        return state, metrics

    # ----------------------------------------------------------------------
    # evaluation (reference utils.py)
    # ----------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def _predict_target(self, params, mstate, x):
        # no-grad context: the fused conv+BN+ReLU inference kernel is safe
        feat, _ = self.target_features(params, mstate, x, False, fused_infer=True)
        logits, _, _ = self.classify_target(params, mstate, feat, False, fused_infer=True)
        return logits

    @functools.partial(jax.jit, static_argnums=0)
    def _predict_source(self, params, mstate, x):
        feat, _ = self.source_features(params, mstate, x, False, fused_infer=True)
        logits, _, _ = self.classify_source(params, mstate, feat, False, fused_infer=True)
        return logits

    def _batched_predictions(self, predict, state, x) -> np.ndarray:
        bs = self.config.batch_size
        n = x.shape[0]
        preds = []
        for i in range(0, n, bs):
            xe = x[i : i + bs]
            pad = bs - xe.shape[0]
            if pad:
                xe = np.concatenate([xe, np.repeat(xe[-1:], pad, 0)], 0)
            logits = predict(state["params"], state["mstate"], jnp.asarray(xe))
            take = bs - pad if pad else bs
            preds.append(np.asarray(jnp.argmax(logits, -1))[:take])
        return np.concatenate(preds)[:n]

    def _batched_accuracy(self, predict, state, x, y):
        return float(np.mean(self._batched_predictions(predict, state, x) == y))

    def predict_target(self, state, x) -> np.ndarray:
        """Batched argmax class predictions on the target head (serving path:
        fixed-shape jitted batches, fused conv+BN+ReLU inference kernel)."""
        return self._batched_predictions(self._predict_target, state, x)

    def evaluate_target(self, state, x, y):
        return self._batched_accuracy(self._predict_target, state, x, y)

    def evaluate_source(self, state, x, y):
        return self._batched_accuracy(self._predict_source, state, x, y)

    # ----------------------------------------------------------------------
    # orchestration
    # ----------------------------------------------------------------------

    def run(
        self,
        target_train,
        target_test,
        source_train,
        source_test,
        *,
        epochs: Optional[Dict[str, int]] = None,
        state: Optional[Dict] = None,
        verbose: bool = True,
        eval_hook=None,
        checkpoint_hook=None,
        phase_checkpoint_hook=None,
        artifact_dir: Optional[str] = None,
        log_every: int = 1,
        log_file: Optional[str] = None,
        pretrain_eval_every: int = 1,
        seed: Optional[int] = None,
    ):
        """Run the full curriculum (phase lengths overridable for testing).

        ``pretrain_eval_every`` controls the phases-1-4 accuracy cadence.
        The reference evaluates EVERY pretrain epoch (phases 1-3; phase 4
        only on its supervised every-75th epochs) via
        ``eval_*_model_being_pretrained`` (utils.py:135-183, called at
        train_and_test.py:177-179,217-219,286-293,354-361,448-455), so the
        default 1 emits the same signal; 0 disables.

        ``phase_checkpoint_hook(phase, state)`` fires at each phase
        boundary — the analogue of the reference's post-phase-3
        ``target/source_classifier_itself.tar`` saves
        (train_and_test.py:364-372), generalized to every phase so
        mid-curriculum members can feed ``cli.multi_source``.
        """
        cfg = self.config
        ep = {
            "p1": cfg.target_pretrain_epochs,
            "p2": cfg.source_pretrain_epochs,
            "p3": cfg.selfsup_epochs,
            "p4": cfg.nf_pretrain_epochs,
            "p5": cfg.joint_epochs,
        }
        if epochs:
            ep.update(epochs)
        if seed is None:
            seed = cfg.seed
        if state is None:
            state = self.init_state(jax.random.PRNGKey(seed))
        skey = jax.random.PRNGKey(seed + 1)
        history = []
        file_logger = None
        if log_file:
            from ..utils.logging import FileLogger

            file_logger = FileLogger(log_file)

        def log(phase, e, metrics):
            # Materializing metrics forces a device sync; throttle with
            # log_every to keep long curricula dispatch-bound, not sync-bound.
            if e % log_every and phase not in ("p5_eval",):
                return
            rec = {"phase": phase, "epoch": e}
            rec.update(
                {
                    k: (np.asarray(v).tolist() if np.ndim(v) else float(v))
                    for k, v in metrics.items()
                }
            )
            history.append(rec)
            if file_logger:
                file_logger.log(rec)
            if verbose:
                print(rec)

        def batches(ds, key):
            xb, yb = epoch_batches(ds.x, ds.y, key, cfg.batch_size)
            return jnp.asarray(xb), jnp.asarray(yb)

        def paired_batches(key):
            k1, k2 = jax.random.split(key)
            xt, yt = batches(target_train, k1)
            xs, ys = batches(source_train, k2)
            nb = min(xt.shape[0], xs.shape[0])  # reference rounds_per_epoch
            return xt[:nb], yt[:nb], xs[:nb], ys[:nb]

        def target_accs(state):
            return {
                "target_train_acc": self.evaluate_target(state, target_train.x, target_train.y),
                "target_test_acc": self.evaluate_target(state, target_test.x, target_test.y),
            }

        def source_accs(state):
            return {
                "source_train_acc": self.evaluate_source(state, source_train.x, source_train.y),
                "source_test_acc": self.evaluate_source(state, source_test.x, source_test.y),
            }

        def pretrain_eval(phase, e, which):
            if not pretrain_eval_every or e % pretrain_eval_every:
                return
            accs = {}
            if "t" in which:
                accs.update(target_accs(state))
            if "s" in which:
                accs.update(source_accs(state))
            log(phase + "_eval", e, accs)

        def phase_done(phase):
            if phase_checkpoint_hook:
                phase_checkpoint_hook(phase, state)

        for e in range(ep["p1"]):
            skey, sk = jax.random.split(skey)
            state, m = self.phase1_epoch(state, *batches(target_train, sk))
            log("p1", e, m)
            pretrain_eval("p1", e, "t")  # reference :177-179, every epoch
        phase_done("p1")
        for e in range(ep["p2"]):
            skey, sk = jax.random.split(skey)
            state, m = self.phase2_epoch(state, *batches(source_train, sk))
            log("p2", e, m)
            pretrain_eval("p2", e, "s")  # reference :217-219, every epoch
        phase_done("p2")
        for e in range(ep["p3"]):
            skey, sk = jax.random.split(skey)
            supervised = e % cfg.selfsup_supervised_every == 0
            state, m = self.phase3_epoch(state, *paired_batches(sk), supervised)
            log("p3", e, m)
            pretrain_eval("p3", e, "ts")  # reference :286-293,354-361
        phase_done("p3")  # reference saves *_classifier_itself.tar here (:364-372)
        for e in range(ep["p4"]):
            skey, sk = jax.random.split(skey)
            supervised = e % cfg.nf_supervised_every == 0
            state, m = self.phase4_epoch(state, *paired_batches(sk), supervised)
            log("p4", e, m)
            if supervised:  # reference evals only the supervised branch (:448-455)
                pretrain_eval("p4", e, "ts")
        phase_done("p4")
        for e in range(ep["p5"]):
            skey, sk = jax.random.split(skey)
            collect = artifact_dir is not None and e % cfg.eval_every == 0
            if collect:
                state, m, feats = self.phase5_epoch(
                    state, *paired_batches(sk), jnp.asarray(e), True
                )
                from ..io.artifacts import save_feature_dumps

                save_feature_dumps(
                    artifact_dir, e, {k: np.asarray(v) for k, v in feats.items()}
                )
            else:
                state, m = self.phase5_epoch(state, *paired_batches(sk), jnp.asarray(e))
            log("p5", e, m)
            if e % cfg.eval_every == 0:
                accs = {
                    "target_train_acc": self.evaluate_target(state, target_train.x, target_train.y),
                    "target_test_acc": self.evaluate_target(state, target_test.x, target_test.y),
                    "source_train_acc": self.evaluate_source(state, source_train.x, source_train.y),
                    "source_test_acc": self.evaluate_source(state, source_test.x, source_test.y),
                }
                log("p5_eval", e, accs)
                if eval_hook:
                    eval_hook(e, state, accs)
                if checkpoint_hook:
                    checkpoint_hook(e, state)
        phase_done("p5")
        return state, history
