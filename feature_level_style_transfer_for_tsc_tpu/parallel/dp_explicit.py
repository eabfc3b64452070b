"""Hand-written-collective data parallelism (the shard_map fallback to dp.py).

`parallel/dp.py` gets DP from GSPMD: shard the batch axis, replicate the
state, and the partitioner inserts every reduction.  That is the right
default, but it leaves the collective placement to the compiler; if the
partitioner's choices ever regress on a new shape, there is nothing to fall
back on.  This module is that fallback: the same train-epoch math with every
cross-device reduction written by hand inside one `jax.shard_map`:

* **gradients** — each device differentiates its *contribution* to the
  global loss (local CE summands / global batch size, local InfoNCE rows)
  and the grads are summed with one `psum`;
* **BatchNorm batch moments** — train-mode statistics must be computed over
  the GLOBAL batch to match single-device math (torch BatchNorm1d semantics,
  reference OS_CNN.py:65); `ops.batchnorm.bn_cross_replica` switches the
  existing module forwards to psum'd moments without duplicating them;
* **CPC InfoNCE negatives** — the reference's InfoNCE softmax runs over the
  whole batch (Comparison/SLARDA/train.py:69-76), so the per-step prediction
  vectors are `all_gather`ed across the axis and each device scores its
  local rows against ALL columns; the diagonal picks the global (b, b)
  entries.

The demonstration target is the phase-1 target-pretrain epoch
(train/pipeline.py `phase1_epoch`, reference train_and_test.py:141-180): it
exercises all three collective patterns (batch-mean CE, BatchNorm stacks in
both the extractor and the classifier head, batch-global InfoNCE).
`tests/test_dp_explicit.py` asserts the epoch equals the single-device one
leaf for leaf on the 8-virtual-device mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..losses.classification import cross_entropy
from ..models.common import gru_scan
from ..ops.batchnorm import bn_cross_replica


def _cpc_contrib(params, z_local, rng, axis: str) -> jax.Array:
    """This device's contribution to the global CPC InfoNCE loss.

    Mirrors models/cpc.py `cpc_apply` (reference train.py:51-76) with the
    batch axis sharded over ``axis``: the GRU and the per-step predictions
    are per-sample (local), the batch-wide softmax needs every device's
    prediction columns (one all_gather).  psum of the returned contributions
    equals the unsharded loss.
    """
    b_loc, _, _ = z_local.shape
    timestep = len(params["wk"])
    hidden = params["gru"]["w_hh"].shape[0]
    # replicated rng -> identical anchor draw on every device (matches the
    # single-device draw bit for bit)
    t_samples = jax.random.randint(rng, (), 0, timestep // 2)

    idx = t_samples + 1 + jnp.arange(timestep)
    encode_local = jnp.take(z_local, idx, axis=1).transpose(1, 0, 2)  # (ts,Bl,C)

    prefix = max(timestep // 2, 1)
    output = gru_scan(params["gru"], z_local[:, :prefix], jnp.zeros((b_loc, hidden)))
    c_t = jnp.take(output, t_samples, axis=1)  # (Bl, hidden)
    pred_local = jnp.stack(
        [c_t @ p["weight"] + p["bias"] for p in params["wk"]]
    )  # (ts, Bl, C)

    # all prediction columns, in global batch order (device order == shard
    # order of the batch axis)
    pred_all = jax.lax.all_gather(pred_local, axis, axis=1, tiled=True)  # (ts,Bg,C)
    total = jnp.einsum("sbc,sdc->sbd", encode_local, pred_all)  # (ts, Bl, Bg)
    log_sm = jax.nn.log_softmax(total, axis=-1)

    i = jax.lax.axis_index(axis)
    cols = i * b_loc + jnp.arange(b_loc)  # global diagonal for local rows
    diag = jnp.take_along_axis(log_sm, cols[None, :, None], axis=2)[..., 0]
    b_glob = b_loc * jax.lax.axis_size(axis)
    return jnp.sum(diag) / (-1.0 * b_glob * timestep)


def make_dp_phase1_epoch(pipe, mesh: Mesh, axis: str = "data"):
    """Build a jitted phase-1 epoch equal to `pipe.phase1_epoch` with every
    DP collective hand-placed.

    Inputs follow `dp.shard_epoch_batches` / `dp.replicate`: stacked epoch
    batches (nb, B, ...) with B sharded over ``axis``, replicated state.
    """
    n_dev = mesh.shape[axis]

    def local_contrib(params, mstate, x_loc, y_loc, rng):
        with bn_cross_replica(axis):
            feat, t_ext_s = pipe.target_features(params, mstate, x_loc, True)
            logits, _, t_cls_s = pipe.classify_target(params, mstate, feat, True)
        sl_c = _cpc_contrib(params["cpc"], feat, rng, axis)
        # local CE summands over the global batch size: psum == global mean
        ce_c = cross_entropy(logits, y_loc) / n_dev
        new_m = dict(mstate)
        new_m.update({"t_ext": t_ext_s, "t_cls": t_cls_s})
        return ce_c + sl_c, (ce_c, sl_c, new_m)

    def sharded_grad(params, mstate, x, y, rng):
        grads, (ce_c, sl_c, new_m) = jax.grad(local_contrib, has_aux=True)(
            params, mstate, x, y, rng
        )
        grads = jax.lax.psum(grads, axis)
        ce = jax.lax.psum(ce_c, axis)
        sl = jax.lax.psum(sl_c, axis)
        return grads, ce, sl, new_m

    shard = jax.shard_map(
        sharded_grad,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P()),
        out_specs=(P(), P(), P(), P()),
        # psum'd grads/losses and psum'd-moment BN stats are replicated by
        # construction
        check_vma=False,
    )

    @jax.jit
    def epoch(state, xb, yb):
        def step(carry, batch):
            params, mstate, opt, rng = carry
            x, y = batch
            rng, sub = jax.random.split(rng)
            grads, ce, sl, new_m = shard(params, mstate, x, y, sub)
            params, opt = pipe._apply_updates(params, opt, grads, ("t_ext", "t_cls", "cpc"))
            return (params, new_m, opt, rng), (ce, sl)

        (params, mstate, opt, rng), (ces, sls) = jax.lax.scan(
            step, (state["params"], state["mstate"], state["opt"], state["rng"]), (xb, yb)
        )
        state = dict(state)
        state.update(params=params, mstate=mstate, opt=opt, rng=rng)
        state = pipe._step_steplr(state, ("t_ext", "t_cls", "cpc"))
        return state, {"t_c_loss": jnp.mean(ces), "t_sl_loss": jnp.mean(sls)}

    return epoch
