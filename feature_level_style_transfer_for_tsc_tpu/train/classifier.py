"""Standalone OS-CNN classifier trainer (extractor + classifier + CPC).

This is the reference's target-pretraining slice as a reusable pipeline
(`/root/reference/train_and_test.py:141-180`): an `OS_CNN_res` feature
extractor feeding an `OS_CNN` classifier with cross-entropy plus the CPC
self-supervised auxiliary loss, RMSprop(1e-3 / 3e-3) + Adam(2e-3) with
StepLR(25, 0.8 / 0.7).

TPU-first: the whole epoch is ONE jitted function — batches live in a
stacked device array and a `lax.scan` walks them, so there are zero
host<->device syncs inside an epoch (the reference syncs every batch for
loss printing, train_and_test.py:150-165).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from ..data.batching import epoch_batches
from ..losses.classification import cross_entropy
from ..models import (
    cpc_apply,
    cpc_init,
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
from ..models.structure import default_parameter_budgets
from .optim import make_adam, make_rmsprop, set_lr, step_lr


class OSCNNClassifier:
    """Static model definition + pure train/eval functions."""

    def __init__(
        self,
        in_channels: int,
        time_length: int,
        num_class: int,
        config: Optional[PipelineConfig] = None,
        with_cpc: bool = True,
    ):
        self.config = config or PipelineConfig()
        self.in_channels = in_channels
        self.time_length = time_length
        self.num_class = num_class
        self.with_cpc = with_cpc

        budgets = [int(b * self.config.budget_multiplier) for b in default_parameter_budgets(in_channels)]
        rf = receptive_field(time_length, self.config.max_kernel_size)
        self.ext_specs = generate_layer_parameter_list(1, rf, budgets, in_channels)
        self.feature_channels = total_out_channels(self.ext_specs[-1])
        self.cls_specs = layer_parameter_list_input_change(
            self.ext_specs, self.feature_channels
        )
        self.ext_masks = [jnp.asarray(m) for m in os_block_masks(self.ext_specs)]
        self.cls_masks = [jnp.asarray(m) for m in os_block_masks(self.cls_specs)]

        self.opt_ext = make_rmsprop(self.config.optim.lr_target_ext)
        self.opt_cls = make_rmsprop(self.config.optim.lr_target_cls)
        self.opt_cpc = make_adam(self.config.optim.lr_cpc)

    # ------------------------------------------------------------- state --

    def init_state(self, key: jax.Array) -> Dict:
        k_ext, k_cls, k_cpc, k_rng = jax.random.split(key, 4)
        ext_p, ext_s = os_cnn_res_init(k_ext, self.ext_specs)
        cls_p, cls_s = os_cnn_init(k_cls, self.cls_specs, self.num_class)
        params = {"ext": ext_p, "cls": cls_p}
        mstate = {"ext": ext_s, "cls": cls_s}
        opt = {
            "ext": self.opt_ext.init(params["ext"]),
            "cls": self.opt_cls.init(params["cls"]),
        }
        if self.with_cpc:
            params["cpc"] = cpc_init(
                k_cpc, self.feature_channels, self.config.cpc_hidden, self.time_length // 2
            )
            opt["cpc"] = self.opt_cpc.init(params["cpc"])
        return {
            "params": params,
            "mstate": mstate,
            "opt": opt,
            "rng": k_rng,
            "epoch": jnp.zeros((), jnp.int32),
        }

    # ----------------------------------------------------------- forward --

    def forward(self, params, mstate, x, training: bool, fused_infer: bool = False):
        feat, ext_s = os_cnn_res_apply(
            params["ext"], mstate["ext"], self.ext_masks, x, training,
            fused_infer=fused_infer,
        )
        logits, pooled, cls_s = os_cnn_apply(
            params["cls"], mstate["cls"], self.cls_masks, feat, training,
            fused_infer=fused_infer,
        )
        return logits, pooled, feat, {"ext": ext_s, "cls": cls_s}

    # -------------------------------------------------------- train step --

    def _loss(self, params, mstate, x, y, rng):
        logits, _, feat, new_mstate = self.forward(params, mstate, x, True)
        c_loss = cross_entropy(logits, y)
        sl_loss = (
            cpc_apply(params["cpc"], feat, rng) if self.with_cpc else jnp.zeros(())
        )
        return c_loss + sl_loss, (c_loss, sl_loss, new_mstate)

    @functools.partial(jax.jit, static_argnums=0)
    def train_epoch(self, state: Dict, xb: jax.Array, yb: jax.Array) -> Tuple[Dict, Dict]:
        """One jitted epoch: scan over stacked batches (nb, B, T, C)."""

        def step(carry, batch):
            params, mstate, opt, rng = carry
            x, y = batch
            rng, sub = jax.random.split(rng)
            grads, (c_loss, sl_loss, new_mstate) = jax.grad(
                self._loss, has_aux=True
            )(params, mstate, x, y, sub)
            new_params = dict(params)
            new_opt = dict(opt)
            for name, tx in (
                ("ext", self.opt_ext),
                ("cls", self.opt_cls),
            ) + ((("cpc", self.opt_cpc),) if self.with_cpc else ()):
                upd, new_opt[name] = tx.update(grads[name], opt[name], params[name])
                new_params[name] = jax.tree_util.tree_map(
                    lambda p, u: p + u, params[name], upd
                )
            return (new_params, new_mstate, new_opt, rng), (c_loss, sl_loss)

        (params, mstate, opt, rng), (c_losses, sl_losses) = jax.lax.scan(
            step,
            (state["params"], state["mstate"], state["opt"], state["rng"]),
            (xb, yb),
        )
        epoch = state["epoch"] + 1
        # StepLR per epoch (reference :97-107,131-134)
        o = self.config.optim
        opt["ext"] = set_lr(opt["ext"], step_lr(o.lr_target_ext, epoch, o.steplr_step, o.steplr_gamma))
        opt["cls"] = set_lr(opt["cls"], step_lr(o.lr_target_cls, epoch, o.steplr_step, o.steplr_gamma))
        if self.with_cpc:
            opt["cpc"] = set_lr(opt["cpc"], step_lr(o.lr_cpc, epoch, o.steplr_step, o.cpc_steplr_gamma))
        new_state = {
            "params": params,
            "mstate": mstate,
            "opt": opt,
            "rng": rng,
            "epoch": epoch,
        }
        metrics = {
            "c_loss": jnp.mean(c_losses),
            "sl_loss": jnp.mean(sl_losses),
        }
        return new_state, metrics

    # --------------------------------------------------------------- eval --

    @functools.partial(jax.jit, static_argnums=0)
    def predict_logits(self, params, mstate, x):
        # no-grad context: fused conv+BN+ReLU inference kernel
        logits, _, _, _ = self.forward(params, mstate, x, False, fused_infer=True)
        return logits

    def evaluate(self, state: Dict, x: np.ndarray, y: np.ndarray, batch_size: int = 0) -> float:
        """Batched argmax accuracy (reference utils.py eval helpers)."""
        bs = batch_size or self.config.batch_size
        n = x.shape[0]
        preds = []
        for i in range(0, n, bs):
            xe = x[i : i + bs]
            pad = bs - xe.shape[0]
            if pad:
                xe = np.concatenate([xe, np.repeat(xe[-1:], pad, 0)], 0)
            logits = self.predict_logits(state["params"], state["mstate"], jnp.asarray(xe))
            preds.append(np.asarray(jnp.argmax(logits, -1))[: bs - pad if pad else bs])
        pred = np.concatenate(preds)[:n]
        return float(np.mean(pred == y))

    # ----------------------------------------------------------------- fit --

    def fit(self, train_ds, test_ds=None, epochs: int = 0, log_every: int = 1, verbose: bool = True):
        """Host-side epoch loop: shuffle+stack batches, run jitted epochs."""
        epochs = epochs or self.config.target_pretrain_epochs
        key = jax.random.PRNGKey(self.config.seed)
        state = self.init_state(key)
        history = []
        shuffle_key = jax.random.PRNGKey(self.config.seed + 1)
        for ep in range(epochs):
            shuffle_key, sk = jax.random.split(shuffle_key)
            xb, yb = epoch_batches(train_ds.x, train_ds.y, sk, self.config.batch_size)
            state, metrics = self.train_epoch(state, jnp.asarray(xb), jnp.asarray(yb))
            rec = {"epoch": ep, **{k: float(v) for k, v in metrics.items()}}
            if test_ds is not None and (ep % self.config.eval_every == 0 or ep == epochs - 1):
                rec["train_acc"] = self.evaluate(state, train_ds.x, train_ds.y)
                rec["test_acc"] = self.evaluate(state, test_ds.x, test_ds.y)
            history.append(rec)
            if verbose and ep % log_every == 0:
                print(rec)
        return state, history
