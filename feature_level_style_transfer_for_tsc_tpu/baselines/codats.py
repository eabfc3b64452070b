"""CoDATS multi-source adversarial domain-adaptation baseline.

TPU-native re-design of `/root/reference/Comparison/CoDATS/main.py:13-243`
and its transformer discriminator (`discriminator.py:13-150`), generalized
from 3 to K source domains:

* per-source 1x1 channel resize on the RAW signal + Linear(T_s -> T_t) time
  adapter on the extracted features (main.py:43-45,64-66);
* ONE shared target `OS_CNN_res` trunk — run in TRAIN mode for the target
  batch and flipped to EVAL for every source batch so only target data
  updates the BatchNorm statistics (main.py:158-165; the flip is the
  documented BN-freeze trick and is replicated via the explicit `training`
  flag);
* per-domain OS_CNN classification heads (target-shaped specs);
* a (K+1)-way domain classifier: Seq_Transformer with gradient reversal at
  fixed coefficient 1.2 (discriminator.py:25-33);
* joint loss CE_t + sum_k CE_sk + CE_disc, Adam(2e-3) + StepLR(25, 0.5)
  everywhere (main.py:81-103,184).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import PipelineConfig
from ..data.batching import epoch_batches
from ..losses.classification import cross_entropy
from ..models import (
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
from .common import steplr_value


class CoDATSPipeline:
    def __init__(
        self,
        target_shape: Tuple[int, int, int],  # (C, T, n_class)
        source_shapes: Sequence[Tuple[int, int, int]],
        config: Optional[PipelineConfig] = None,
        disc_hid: int = 128,
        disc_depth: int = 8,
        disc_heads: int = 8,
        disc_mlp: int = 64,
    ):
        self.config = config or PipelineConfig()
        cfg = self.config
        self.target_shape = target_shape
        self.source_shapes = list(source_shapes)
        c_t, t_t, n_t = target_shape

        budgets = [int(b * cfg.budget_multiplier) for b in default_parameter_budgets(c_t)]
        rf = receptive_field(t_t, cfg.max_kernel_size)
        self.ext_specs = generate_layer_parameter_list(1, rf, budgets, c_t)
        self.feat_channels = total_out_channels(self.ext_specs[-1])
        self.cls_specs = layer_parameter_list_input_change(self.ext_specs, self.feat_channels)
        self.ext_masks = [jnp.asarray(m) for m in os_block_masks(self.ext_specs)]
        self.cls_masks = [jnp.asarray(m) for m in os_block_masks(self.cls_specs)]

        self.disc_cfg = dict(
            patch_size=t_t, att_hid_dim=disc_hid, depth=disc_depth,
            heads=disc_heads, mlp_dim=disc_mlp, num_class=len(source_shapes) + 1,
        )
        self.lr = 2e-3
        self.tx = optax.inject_hyperparams(optax.adam)(learning_rate=self.lr)

    # ------------------------------------------------------------- state --

    def init_state(self, key) -> Dict:
        c_t, t_t, n_t = self.target_shape
        n_src = len(self.source_shapes)
        keys = jax.random.split(key, 4 + 3 * n_src)
        ext_p, ext_s = os_cnn_res_init(keys[0], self.ext_specs)
        t_cls_p, t_cls_s = os_cnn_init(keys[1], self.cls_specs, n_t)
        disc_p = discriminator_att_init(
            keys[2],
            self.disc_cfg["patch_size"], self.disc_cfg["att_hid_dim"],
            self.disc_cfg["depth"], self.disc_cfg["heads"], self.disc_cfg["mlp_dim"],
            self.disc_cfg["num_class"],
        )
        params: Dict = {"ext": ext_p, "t_cls": t_cls_p, "disc": disc_p,
                        "resize": [], "trans": [], "s_cls": []}
        mstate: Dict = {"ext": ext_s, "t_cls": t_cls_s, "s_cls": []}
        for i, (c_s, t_s, n_s) in enumerate(self.source_shapes):
            params["resize"].append(conv1x1_init(keys[3 + 3 * i], c_s, c_t))
            params["trans"].append(linear_init(keys[4 + 3 * i], t_s, t_t))
            sc_p, sc_s = os_cnn_init(keys[5 + 3 * i], self.cls_specs, n_s)
            params["s_cls"].append(sc_p)
            mstate["s_cls"].append(sc_s)
        opt = self.tx.init(params)
        return {
            "params": params, "mstate": mstate, "opt": opt,
            "sched": jnp.zeros((), jnp.int32), "rng": keys[3 + 3 * n_src],
        }

    # ----------------------------------------------------------- forward --

    def _source_feature(self, params, mstate, i, x):
        """resize -> SHARED trunk in EVAL mode -> time adapter (main.py:158-165)."""
        resized = conv1x1(params["resize"][i], x)
        feat, _ = os_cnn_res_apply(params["ext"], mstate["ext"], self.ext_masks, resized, False)
        w = params["trans"][i]
        return jnp.einsum("bsc,st->btc", feat, w["weight"]) + w["bias"][None, :, None]

    # -------------------------------------------------------------- train --

    @functools.partial(jax.jit, static_argnums=0)
    def train_epoch(self, state, xt, yt, xs_list, ys_list):
        n_src = len(self.source_shapes)

        def loss_fn(params, mstate, bt, lt, bs_list, ls_list):
            new_m = dict(mstate)
            t_feat, new_m["ext"] = os_cnn_res_apply(
                params["ext"], mstate["ext"], self.ext_masks, bt, True
            )
            feats = [t_feat]
            ce_s = []
            new_s_cls = []
            for i in range(n_src):
                s_feat = self._source_feature(params, mstate, i, bs_list[i])
                feats.append(s_feat)
                logits, _, sc_s = os_cnn_apply(
                    params["s_cls"][i], mstate["s_cls"][i], self.cls_masks, s_feat, True
                )
                ce_s.append(cross_entropy(logits, ls_list[i]))
                new_s_cls.append(sc_s)
            new_m["s_cls"] = new_s_cls
            t_logits, _, new_m["t_cls"] = os_cnn_apply(
                params["t_cls"], mstate["t_cls"], self.cls_masks, t_feat, True
            )
            ce_t = cross_entropy(t_logits, lt)

            feat_concat = jnp.concatenate(feats, axis=0)
            domain_labels = jnp.concatenate(
                [jnp.full((f.shape[0],), i, jnp.int32) for i, f in enumerate(feats)]
            )
            disc_logits = discriminator_att_apply(
                params["disc"], feat_concat, self.disc_cfg["patch_size"],
                self.disc_cfg["heads"], grl=1.2,
            )
            ce_disc = cross_entropy(disc_logits, domain_labels)
            total = ce_t + sum(ce_s) + ce_disc
            return total, ((ce_t, jnp.stack(ce_s), ce_disc), new_m)

        def step(carry, batch):
            params, mstate, opt = carry
            bt, lt, bs_list, ls_list = batch
            grads, (losses, new_m) = jax.grad(loss_fn, has_aux=True)(
                params, mstate, bt, lt, list(bs_list), list(ls_list)
            )
            upd, opt = self.tx.update(grads, opt, params)
            params = optax.apply_updates(params, upd)
            return (params, new_m, opt), losses

        # per-source batches ride the scan as a tuple pytree (sources have
        # heterogeneous (T, C) so they cannot be stacked into one array)
        (params, mstate, opt), losses = jax.lax.scan(
            step, (state["params"], state["mstate"], state["opt"]),
            (xt, yt, tuple(xs_list), tuple(ys_list)),
        )
        state = dict(state)
        sched = state["sched"] + 1
        opt = jax.tree_util.tree_map(lambda x: x, opt)
        opt.hyperparams["learning_rate"] = steplr_value(self.lr, sched, 25, 0.5)
        state.update(params=params, mstate=mstate, opt=opt, sched=sched)
        ce_t, ce_s, ce_disc = losses
        return state, {
            "loss_t": jnp.mean(ce_t),
            "loss_s": jnp.mean(ce_s, axis=0),
            "loss_disc": jnp.mean(ce_disc),
        }

    # --------------------------------------------------------------- eval --

    @functools.partial(jax.jit, static_argnums=0)
    def predict_target(self, params, mstate, x):
        feat, _ = os_cnn_res_apply(params["ext"], mstate["ext"], self.ext_masks, x, False)
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

    def fit(self, target_train, target_test, source_trains, epochs: int = 600, verbose=True):
        cfg = self.config
        state = self.init_state(jax.random.PRNGKey(cfg.seed))
        skey = jax.random.PRNGKey(cfg.seed + 1)
        history = []
        for e in range(epochs):
            skey, *sks = jax.random.split(skey, 2 + len(source_trains))
            xt, yt = epoch_batches(target_train.x, target_train.y, sks[0], cfg.batch_size)
            xs_list, ys_list = [], []
            nb = xt.shape[0]
            for i, ds in enumerate(source_trains):
                xs, ys = epoch_batches(ds.x, ds.y, sks[1 + i], cfg.batch_size)
                nb = min(nb, xs.shape[0])
                xs_list.append(xs)
                ys_list.append(ys)
            xt, yt = jnp.asarray(xt[:nb]), jnp.asarray(yt[:nb])
            xs_list = [jnp.asarray(x[:nb]) for x in xs_list]
            ys_list = [jnp.asarray(y[:nb]) for y in ys_list]
            state, m = self.train_epoch(state, xt, yt, xs_list, ys_list)
            rec = {"epoch": e, **{k: np.asarray(v).tolist() for k, v in m.items()}}
            rec["train_acc"] = self.evaluate_target(state, target_train.x, target_train.y)
            rec["test_acc"] = self.evaluate_target(state, target_test.x, target_test.y)
            history.append(rec)
            if verbose:
                print(rec)
        return state, history
