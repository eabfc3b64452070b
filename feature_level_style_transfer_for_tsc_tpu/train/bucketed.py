"""Bucketed OS-CNN trainer: one compiled program per shape bucket.

Archive-sweep compile hygiene (SURVEY §7 "shape polymorphism"): a UCR/UEA
sweep pays one jit compile per dataset because every (C, T, n_class, N)
differs.  Here datasets are grouped into buckets keyed by

    (C, receptive_field(T), T_bucket, class_bucket)

— the first two fix the ARCHITECTURE (the builder derives the layer specs
from C and min(T//4, max_kernel); for the univariate archive every
T >= 4*89 = 356 shares one architecture), the last two are padded shapes.
Within a bucket the dataset's true T and n_class are runtime data (masks),
so every dataset reuses the same compiled train/predict programs — exact
semantics via models/os_cnn_padded.py (padded == unpadded, tested).

The train step is per-BATCH jitted (not the per-epoch scan the unbucketed
`OSCNNClassifier` uses) so the number of batches per epoch — which varies
per dataset — stays out of the compile key.  Per-batch dispatch costs
~100us/step on host; a saved compile is tens of seconds.

CPC is not offered on this path: its prediction horizon ``timestep = T//2``
sizes the parameter pytree itself, which cannot be masked.  Sweeps use the
supervised slice (the reference's sweep-equivalent single runs do the same
CE training, train_and_test.py:141-180 without the auxiliary loss).
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
    generate_layer_parameter_list,
    layer_parameter_list_input_change,
    os_block_masks,
    os_cnn_init,
    os_cnn_res_init,
    receptive_field,
    total_out_channels,
)
from ..models.os_cnn_padded import (
    class_mask,
    os_cnn_apply_padded,
    os_cnn_res_apply_padded,
    time_mask,
)
from ..models.structure import default_parameter_budgets
from .optim import make_rmsprop, set_lr, step_lr


def bucket_t(t: int, granularity: float = 1.5, t_min: int = 64) -> int:
    """Smallest bucket length >= t from a geometric series (ratio 1.5)."""
    b = t_min
    while b < t:
        b = int(np.ceil(b * granularity))
    return b


def bucket_classes(n: int, step: int = 4) -> int:
    return max(step, -(-n // step) * step)


def bucket_key(
    in_channels: int, t: int, n_class: int, max_kernel_size: int = 89
) -> Tuple[int, int, int, int]:
    """(C, rf, T_bucket, class_bucket) — rf fixes the architecture."""
    return (
        in_channels,
        receptive_field(t, max_kernel_size),
        bucket_t(t),
        bucket_classes(n_class),
    )


class BucketedOSCNNClassifier:
    """OS-CNN classifier whose compiled programs serve a whole bucket."""

    def __init__(
        self,
        in_channels: int,
        rf: int,
        t_bucket: int,
        class_bucket: int,
        config: Optional[PipelineConfig] = None,
    ):
        self.config = config or PipelineConfig()
        self.in_channels = in_channels
        self.rf = rf
        self.t_bucket = t_bucket
        self.class_bucket = class_bucket
        budgets = [
            int(b * self.config.budget_multiplier)
            for b in default_parameter_budgets(in_channels)
        ]
        self.ext_specs = generate_layer_parameter_list(1, rf, budgets, in_channels)
        self.feature_channels = total_out_channels(self.ext_specs[-1])
        self.cls_specs = layer_parameter_list_input_change(
            self.ext_specs, self.feature_channels
        )
        self.ext_masks = [jnp.asarray(m) for m in os_block_masks(self.ext_specs)]
        self.cls_masks = [jnp.asarray(m) for m in os_block_masks(self.cls_specs)]
        self.opt_ext = make_rmsprop(self.config.optim.lr_target_ext)
        self.opt_cls = make_rmsprop(self.config.optim.lr_target_cls)

    @classmethod
    def for_dataset(cls, in_channels: int, t: int, n_class: int, config=None):
        cfg = config or PipelineConfig()
        key = bucket_key(in_channels, t, n_class, cfg.max_kernel_size)
        return cls(*key, config=cfg)

    # -------------------------------------------------------------- state --

    def init_state(self, key: jax.Array) -> Dict:
        k_ext, k_cls, k_rng = jax.random.split(key, 3)
        ext_p, ext_s = os_cnn_res_init(k_ext, self.ext_specs)
        cls_p, cls_s = os_cnn_init(k_cls, self.cls_specs, self.class_bucket)
        params = {"ext": ext_p, "cls": cls_p}
        return {
            "params": params,
            "mstate": {"ext": ext_s, "cls": cls_s},
            "opt": {
                "ext": self.opt_ext.init(params["ext"]),
                "cls": self.opt_cls.init(params["cls"]),
            },
            "rng": k_rng,
            "epoch": jnp.zeros((), jnp.int32),
        }

    # -------------------------------------------------------------- steps --

    def _forward(self, params, mstate, x, training, tmask, t_valid, cmask):
        feat, ext_s = os_cnn_res_apply_padded(
            params["ext"], mstate["ext"], self.ext_masks, x, training, tmask, t_valid
        )
        logits, pooled, cls_s = os_cnn_apply_padded(
            params["cls"], mstate["cls"], self.cls_masks, feat, training,
            tmask, t_valid, cmask,
        )
        return logits, pooled, {"ext": ext_s, "cls": cls_s}

    @functools.partial(jax.jit, static_argnums=0)
    def train_batch(self, state: Dict, x, y, t_valid, cmask) -> Tuple[Dict, jax.Array]:
        tmask = time_mask(self.t_bucket, t_valid)

        def loss_fn(params, mstate):
            logits, _, new_m = self._forward(
                params, mstate, x, True, tmask, t_valid, cmask
            )
            ce = cross_entropy(logits, y)
            return ce, (ce, new_m)

        grads, (ce, new_m) = jax.grad(loss_fn, has_aux=True)(
            state["params"], state["mstate"]
        )
        params = dict(state["params"])
        opt = dict(state["opt"])
        for name, tx in (("ext", self.opt_ext), ("cls", self.opt_cls)):
            upd, opt[name] = tx.update(grads[name], opt[name], params[name])
            params[name] = jax.tree_util.tree_map(lambda p, u: p + u, params[name], upd)
        new_state = dict(state)
        new_state.update(params=params, mstate=new_m, opt=opt)
        return new_state, ce

    @functools.partial(jax.jit, static_argnums=0)
    def _step_schedulers(self, state: Dict) -> Dict:
        o = self.config.optim
        epoch = state["epoch"] + 1
        opt = dict(state["opt"])
        opt["ext"] = set_lr(opt["ext"], step_lr(o.lr_target_ext, epoch, o.steplr_step, o.steplr_gamma))
        opt["cls"] = set_lr(opt["cls"], step_lr(o.lr_target_cls, epoch, o.steplr_step, o.steplr_gamma))
        new_state = dict(state)
        new_state.update(opt=opt, epoch=epoch)
        return new_state

    @functools.partial(jax.jit, static_argnums=0)
    def predict_logits(self, params, mstate, x, t_valid, cmask):
        tmask = time_mask(self.t_bucket, t_valid)
        logits, _, _ = self._forward(params, mstate, x, False, tmask, t_valid, cmask)
        return logits

    # ---------------------------------------------------------------- fit --

    def _pad_x(self, x: np.ndarray) -> np.ndarray:
        pad = self.t_bucket - x.shape[1]
        assert pad >= 0, f"T={x.shape[1]} exceeds bucket {self.t_bucket}"
        return np.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x

    def fit(self, train_ds, test_ds=None, epochs: int = 0, verbose: bool = True):
        epochs = epochs or self.config.target_pretrain_epochs
        t_valid = jnp.asarray(float(train_ds.time_length))
        cmask = class_mask(self.class_bucket, jnp.asarray(train_ds.num_class))
        x_pad = self._pad_x(train_ds.x)
        state = self.init_state(jax.random.PRNGKey(self.config.seed))
        shuffle_key = jax.random.PRNGKey(self.config.seed + 1)
        history = []
        for ep in range(epochs):
            shuffle_key, sk = jax.random.split(shuffle_key)
            xb, yb = epoch_batches(x_pad, train_ds.y, sk, self.config.batch_size)
            for i in range(xb.shape[0]):
                state, ce = self.train_batch(
                    state, jnp.asarray(xb[i]), jnp.asarray(yb[i]), t_valid, cmask
                )
            state = self._step_schedulers(state)
            # one device sync per epoch (last batch's loss), not per batch
            rec = {"epoch": ep, "c_loss": float(ce)}
            if test_ds is not None and (
                ep % self.config.eval_every == 0 or ep == epochs - 1
            ):
                rec["test_acc"] = self.evaluate(state, test_ds.x, test_ds.y,
                                                train_ds.num_class)
            history.append(rec)
            if verbose:
                print(rec)
        return state, history

    def evaluate(self, state: Dict, x: np.ndarray, y: np.ndarray, n_class: int) -> float:
        t_valid = jnp.asarray(float(x.shape[1]))
        cmask = class_mask(self.class_bucket, jnp.asarray(n_class))
        x = self._pad_x(x)
        bs = self.config.batch_size
        n = x.shape[0]
        preds = []
        for i in range(0, n, bs):
            xe = x[i : i + bs]
            pad = bs - xe.shape[0]
            if pad:
                xe = np.concatenate([xe, np.repeat(xe[-1:], pad, 0)], 0)
            logits = self.predict_logits(
                state["params"], state["mstate"], jnp.asarray(xe), t_valid, cmask
            )
            preds.append(np.asarray(jnp.argmax(logits, -1))[: bs - pad if pad else bs])
        return float(np.mean(np.concatenate(preds)[:n] == y))
