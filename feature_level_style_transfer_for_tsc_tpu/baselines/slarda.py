"""SLARDA self-supervised adversarial domain-adaptation baseline.

TPU-native re-design of `/root/reference/Comparison/SLARDA/train.py:78-271`
(+ `models.py:6-24`):

* Phase A — source pretrain (70 epochs): raw source -> 1x1 channel resize
  (C_s -> C_t) -> OS_CNN_res (TARGET-shaped specs) -> OS_CNN head;
  loss = 2*CPC + CE, Adam(2e-3) + StepLR(25, 0.5)              (:149-187)
* Weight transfer: target extractor <- source extractor; target classifier
  <- source classifier SKIPPING the 'hidden' head; source stack frozen
  (and left in eval mode, so its BN uses running stats)        (:189-198)
* Phase B — ADDA-style target adaptation (450 epochs), two sub-steps/batch:
  1. critic step on DETACHED concat(source_feat, len_trans(target_feat))
     with BCE-with-logits labels [1 | 0] -> update critic only  (:222-235)
  2. encoder step: fool the critic (labels=1) + target CE ->
     update target extractor / length adapter / classifier      (:242-250)
  The critic is the Seq_Transformer WITHOUT gradient reversal (models.py).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import PipelineConfig
from ..data.batching import epoch_batches
from ..losses.classification import cross_entropy
from ..models import (
    cpc_apply,
    cpc_init,
    discriminator_att_apply,
    discriminator_att_init,
    generate_layer_parameter_list,
    layer_parameter_list_input_change,
    os_block_masks,
    os_cnn_apply,
    os_cnn_init,
    os_cnn_res_apply,
    os_cnn_res_init,
    receptive_field,
    total_out_channels,
)
from ..models.common import conv1x1, conv1x1_init, linear_init
from ..structure import default_parameter_budgets
from .common import make_adam_steplr, steplr_value


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """torch BCEWithLogitsLoss (mean reduction)."""
    x, z = logits, targets
    return jnp.mean(jnp.maximum(x, 0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x))))


class SLARDAPipeline:
    def __init__(
        self,
        target_shape: Tuple[int, int, int],
        source_shape: Tuple[int, int, int],
        config: Optional[PipelineConfig] = None,
        disc_hid: int = 128,
        disc_depth: int = 8,
        disc_heads: int = 8,
        disc_mlp: int = 64,
    ):
        self.config = config or PipelineConfig()
        cfg = self.config
        self.target_shape = target_shape
        self.source_shape = source_shape
        c_t, t_t, n_t = target_shape
        c_s, t_s, n_s = source_shape

        # BOTH extractors use target-derived specs (reference :104-115)
        budgets = [int(b * cfg.budget_multiplier) for b in default_parameter_budgets(c_t)]
        rf = receptive_field(t_t, cfg.max_kernel_size)
        self.ext_specs = generate_layer_parameter_list(1, rf, budgets, c_t)
        self.feat_channels = total_out_channels(self.ext_specs[-1])
        self.cls_specs = layer_parameter_list_input_change(self.ext_specs, self.feat_channels)
        self.ext_masks = [jnp.asarray(m) for m in os_block_masks(self.ext_specs)]
        self.cls_masks = [jnp.asarray(m) for m in os_block_masks(self.cls_specs)]

        self.disc_cfg = dict(
            patch_size=t_s, att_hid_dim=disc_hid, depth=disc_depth,
            heads=disc_heads, mlp_dim=disc_mlp,
        )
        self.lr = 2e-3
        self.tx_src = make_adam_steplr(self.lr)
        self.tx_tgt = make_adam_steplr(self.lr)
        self.tx_disc = make_adam_steplr(self.lr)

    # ------------------------------------------------------------- state --

    def init_state(self, key) -> Dict:
        c_t, t_t, n_t = self.target_shape
        c_s, t_s, n_s = self.source_shape
        keys = jax.random.split(key, 9)
        s_ext_p, s_ext_s = os_cnn_res_init(keys[0], self.ext_specs)
        t_ext_p, t_ext_s = os_cnn_res_init(keys[1], self.ext_specs)
        s_cls_p, s_cls_s = os_cnn_init(keys[2], self.cls_specs, n_s)
        t_cls_p, t_cls_s = os_cnn_init(keys[3], self.cls_specs, n_t)
        params = {
            "resize": conv1x1_init(keys[4], c_s, c_t),
            "s_ext": s_ext_p, "t_ext": t_ext_p,
            "s_cls": s_cls_p, "t_cls": t_cls_p,
            "len_trans": linear_init(keys[5], t_t, t_s),
            "cpc": cpc_init(keys[6], self.feat_channels, 64, t_s // 2),
            "disc": discriminator_att_init(
                keys[7], t_s, self.disc_cfg["att_hid_dim"], self.disc_cfg["depth"],
                self.disc_cfg["heads"], self.disc_cfg["mlp_dim"], 1,
            ),
        }
        mstate = {"s_ext": s_ext_s, "t_ext": t_ext_s, "s_cls": s_cls_s, "t_cls": t_cls_s}
        src_group = {k: params[k] for k in ("resize", "s_ext", "s_cls", "cpc")}
        tgt_group = {k: params[k] for k in ("t_ext", "len_trans", "t_cls")}
        return {
            "params": params,
            "mstate": mstate,
            "opt_src": self.tx_src.init(src_group),
            "opt_tgt": self.tx_tgt.init(tgt_group),
            "opt_disc": self.tx_disc.init(params["disc"]),
            "sched_src": jnp.zeros((), jnp.int32),
            "sched_tgt": jnp.zeros((), jnp.int32),
            "rng": keys[8],
        }

    # ----------------------------------------------- phase A: source ------

    @functools.partial(jax.jit, static_argnums=0)
    def source_epoch(self, state, xb, yb):
        def loss_fn(group, mstate, x, y, rng):
            resized = conv1x1(group["resize"], x)
            feat, s_ext_s = os_cnn_res_apply(
                group["s_ext"], mstate["s_ext"], self.ext_masks, resized, True
            )
            sl = cpc_apply(group["cpc"], feat, rng)
            logits, _, s_cls_s = os_cnn_apply(
                group["s_cls"], mstate["s_cls"], self.cls_masks, feat, True
            )
            ce = cross_entropy(logits, y)
            new_m = dict(mstate)
            new_m.update({"s_ext": s_ext_s, "s_cls": s_cls_s})
            return 2 * sl + ce, ((ce, sl), new_m)

        def step(carry, batch):
            params, mstate, opt, rng = carry
            x, y = batch
            rng, sub = jax.random.split(rng)
            group = {k: params[k] for k in ("resize", "s_ext", "s_cls", "cpc")}
            grads, (losses, new_m) = jax.grad(loss_fn, has_aux=True)(group, mstate, x, y, sub)
            upd, opt = self.tx_src.update(grads, opt, group)
            group = optax.apply_updates(group, upd)
            params = dict(params)
            params.update(group)
            return (params, new_m, opt, rng), losses

        (params, mstate, opt, rng), (ces, sls) = jax.lax.scan(
            step, (state["params"], state["mstate"], state["opt_src"], state["rng"]), (xb, yb)
        )
        state = dict(state)
        sched = state["sched_src"] + 1
        opt.hyperparams["learning_rate"] = steplr_value(self.lr, sched)
        state.update(params=params, mstate=mstate, opt_src=opt, sched_src=sched, rng=rng)
        return state, {"s_c_loss": jnp.mean(ces), "s_sl_loss": jnp.mean(sls)}

    # ------------------------------------------- weight transfer ----------

    def transfer_weights(self, state) -> Dict:
        """target <- source, classifier skips the 'hidden' head (:189-198)."""
        params = dict(state["params"])
        params["t_ext"] = jax.tree_util.tree_map(lambda x: x, params["s_ext"])
        t_cls = dict(params["t_cls"])
        t_cls["block"] = jax.tree_util.tree_map(lambda x: x, params["s_cls"]["block"])
        params["t_cls"] = t_cls  # 'hidden' stays target-initialized
        mstate = dict(state["mstate"])
        mstate["t_ext"] = jax.tree_util.tree_map(lambda x: x, mstate["s_ext"])
        t_cls_m = dict(mstate["t_cls"])
        t_cls_m["block"] = jax.tree_util.tree_map(lambda x: x, mstate["s_cls"]["block"])
        mstate["t_cls"] = t_cls_m
        state = dict(state)
        state.update(params=params, mstate=mstate)
        # re-init the target optimizer so moments don't leak across phases
        tgt_group = {k: params[k] for k in ("t_ext", "len_trans", "t_cls")}
        state["opt_tgt"] = self.tx_tgt.init(tgt_group)
        return state

    # --------------------------------------------- phase B: target --------

    def _len_trans(self, params, feat):
        w = params["len_trans"]
        return jnp.einsum("btc,ts->bsc", feat, w["weight"]) + w["bias"][None, :, None]

    @functools.partial(jax.jit, static_argnums=0)
    def target_epoch(self, state, xt, yt, xs):
        patch, heads = self.disc_cfg["patch_size"], self.disc_cfg["heads"]

        def step(carry, batch):
            params, mstate, opt_tgt, opt_disc = carry
            bt, lt, bs = batch

            # frozen source path, left in eval mode (:196-198)
            resized = conv1x1(params["resize"], bs)
            s_feat, _ = os_cnn_res_apply(
                params["s_ext"], mstate["s_ext"], self.ext_masks, resized, False
            )
            s_feat = jax.lax.stop_gradient(s_feat)

            # --- sub-step 1: critic on detached features (:222-235) ---
            def disc_loss_fn(disc_params, t_feat_detached):
                concat = jnp.concatenate([s_feat, t_feat_detached], axis=0)
                pred = discriminator_att_apply(disc_params, concat, patch, heads)[:, 0]
                labels = jnp.concatenate(
                    [jnp.ones((s_feat.shape[0],)), jnp.zeros((t_feat_detached.shape[0],))]
                )
                return bce_with_logits(pred, labels)

            t_feat_pre, _ = os_cnn_res_apply(
                params["t_ext"], mstate["t_ext"], self.ext_masks, bt, True
            )
            t_feat_changed_pre = self._len_trans(params, t_feat_pre)
            d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(
                params["disc"], jax.lax.stop_gradient(t_feat_changed_pre)
            )
            d_upd, opt_disc = self.tx_disc.update(d_grads, opt_disc, params["disc"])
            params = dict(params)
            params["disc"] = optax.apply_updates(params["disc"], d_upd)

            # --- sub-step 2: encoder fools the (updated) critic (:242-250) --
            def tgt_loss_fn(group, mstate):
                t_feat, t_ext_s = os_cnn_res_apply(
                    group["t_ext"], mstate["t_ext"], self.ext_masks, bt, True
                )
                changed = jnp.einsum(
                    "btc,ts->bsc", t_feat, group["len_trans"]["weight"]
                ) + group["len_trans"]["bias"][None, :, None]
                pred = discriminator_att_apply(params["disc"], changed, patch, heads)[:, 0]
                loss_tgt = bce_with_logits(pred, jnp.ones_like(pred))
                logits, _, t_cls_s = os_cnn_apply(
                    group["t_cls"], mstate["t_cls"], self.cls_masks, t_feat, True
                )
                ce = cross_entropy(logits, lt)
                new_m = dict(mstate)
                new_m.update({"t_ext": t_ext_s, "t_cls": t_cls_s})
                return ce + loss_tgt, ((ce, loss_tgt), new_m)

            group = {k: params[k] for k in ("t_ext", "len_trans", "t_cls")}
            grads, (losses, new_m) = jax.grad(tgt_loss_fn, has_aux=True)(group, mstate)
            upd, opt_tgt = self.tx_tgt.update(grads, opt_tgt, group)
            group = optax.apply_updates(group, upd)
            params.update(group)
            ce, loss_tgt = losses
            return (params, new_m, opt_tgt, opt_disc), (ce, loss_tgt, d_loss)

        (params, mstate, opt_tgt, opt_disc), losses = jax.lax.scan(
            step,
            (state["params"], state["mstate"], state["opt_tgt"], state["opt_disc"]),
            (xt, yt, xs),
        )
        state = dict(state)
        sched = state["sched_tgt"] + 1
        opt_tgt.hyperparams["learning_rate"] = steplr_value(self.lr, sched)
        state.update(
            params=params, mstate=mstate, opt_tgt=opt_tgt, opt_disc=opt_disc, sched_tgt=sched
        )
        ce, loss_tgt, d_loss = losses
        return state, {
            "t_c_loss": jnp.mean(ce),
            "adapt_loss": jnp.mean(loss_tgt),
            "disc_loss": jnp.mean(d_loss),
        }

    # --------------------------------------------------------------- eval --

    @functools.partial(jax.jit, static_argnums=0)
    def predict_target(self, params, mstate, x):
        feat, _ = os_cnn_res_apply(params["t_ext"], mstate["t_ext"], self.ext_masks, x, False)
        logits, _, _ = os_cnn_apply(params["t_cls"], mstate["t_cls"], self.cls_masks, feat, False)
        return logits

    def evaluate_target(self, state, x, y) -> float:
        bs = self.config.batch_size
        preds = []
        n = x.shape[0]
        for i in range(0, n, bs):
            xe = x[i : i + bs]
            pad = bs - xe.shape[0]
            if pad:
                xe = np.concatenate([xe, np.repeat(xe[-1:], pad, 0)], 0)
            logits = self.predict_target(state["params"], state["mstate"], jnp.asarray(xe))
            preds.append(np.asarray(jnp.argmax(logits, -1))[: bs - pad if pad else bs])
        return float(np.mean(np.concatenate(preds)[:n] == y))

    # ----------------------------------------------------------------- fit --

    def fit(
        self,
        target_train,
        target_test,
        source_train,
        source_epochs: int = 70,
        target_epochs: int = 450,
        verbose: bool = True,
    ):
        cfg = self.config
        state = self.init_state(jax.random.PRNGKey(cfg.seed))
        skey = jax.random.PRNGKey(cfg.seed + 1)
        history = []
        for e in range(source_epochs):
            skey, sk = jax.random.split(skey)
            xb, yb = epoch_batches(source_train.x, source_train.y, sk, cfg.batch_size)
            state, m = self.source_epoch(state, jnp.asarray(xb), jnp.asarray(yb))
            rec = {"phase": "source", "epoch": e, **{k: float(v) for k, v in m.items()}}
            history.append(rec)
            if verbose:
                print(rec)
        state = self.transfer_weights(state)
        for e in range(target_epochs):
            skey, k1, k2 = jax.random.split(skey, 3)
            xt, yt = epoch_batches(target_train.x, target_train.y, k1, cfg.batch_size)
            xs, _ = epoch_batches(source_train.x, source_train.y, k2, cfg.batch_size)
            nb = min(xt.shape[0], xs.shape[0])
            state, m = self.target_epoch(
                state, jnp.asarray(xt[:nb]), jnp.asarray(yt[:nb]), jnp.asarray(xs[:nb])
            )
            rec = {"phase": "target", "epoch": e, **{k: float(v) for k, v in m.items()}}
            rec["test_acc"] = self.evaluate_target(state, target_test.x, target_test.y)
            history.append(rec)
            if verbose:
                print(rec)
        return state, history
