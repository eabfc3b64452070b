"""Hand-written-collective DP (parallel/dp_explicit) equals the single-device
epoch — the explicit shard_map fallback to the GSPMD annotations in
parallel/dp.py, exercising psum'd grads, psum'd BatchNorm moments, and
all_gather'd CPC InfoNCE negatives."""

import jax
import jax.numpy as jnp
import numpy as np

from feature_level_style_transfer_for_tsc_tpu.config import FlowConfig, PipelineConfig
from feature_level_style_transfer_for_tsc_tpu.data.batching import epoch_batches
from feature_level_style_transfer_for_tsc_tpu.data.synthetic import make_dataset
from feature_level_style_transfer_for_tsc_tpu.parallel import (
    make_mesh,
    replicate,
    shard_epoch_batches,
)
from feature_level_style_transfer_for_tsc_tpu.parallel.dp_explicit import (
    make_dp_phase1_epoch,
)
from feature_level_style_transfer_for_tsc_tpu.train.pipeline import StyleTransferPipeline


def _tiny_pipe():
    cfg = PipelineConfig(
        batch_size=8, max_kernel_size=5, cdan_dim=32, cpc_hidden=8,
        budget_multiplier=0.02, flow=FlowConfig(n_flows=2, wn_channels=8, wn_layers=2),
    )
    return StyleTransferPipeline(2, 16, 2, 1, 12, 3, cfg), cfg


def test_dp_explicit_phase1_matches_single_device():
    pipe, cfg = _tiny_pipe()
    state0 = pipe.init_state(jax.random.PRNGKey(0))
    ds = make_dataset(16, 2, 16, 2, seed=0)
    xb, yb = epoch_batches(ds.x, ds.y, jax.random.PRNGKey(1), cfg.batch_size)
    xb, yb = jnp.asarray(xb), jnp.asarray(yb)

    state_single, m_single = pipe.phase1_epoch(state0, xb, yb)

    mesh = make_mesh(data=4, domain=1)
    dp_epoch = make_dp_phase1_epoch(pipe, mesh)
    xs, ys = shard_epoch_batches(mesh, xb, yb)
    state_dp, m_dp = dp_epoch(replicate(mesh, state0), xs, ys)

    # losses are global quantities on both sides — tight equality
    for k in m_single:
        np.testing.assert_allclose(
            np.asarray(m_dp[k]), np.asarray(m_single[k]), rtol=1e-5, atol=1e-6,
            err_msg=f"metric {k}",
        )
    # BatchNorm running stats: psum'd moments vs single-device moments.
    # Batch-2 stats sit downstream of one RMSprop step, and BN-fed conv
    # biases take lr-sized steps on reduction-order noise (zero true grad);
    # the normalized OUTPUT is invariant to those biases but the recorded
    # pre-normalization running mean is not — hence lr-scale tolerance.
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(state_dp["mstate"]),
        jax.tree_util.tree_leaves_with_path(state_single["mstate"]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3,
            err_msg=jax.tree_util.keystr(path),
        )
    # params after the epoch (BN-degenerate bias leaves excluded — see the
    # note on test_parallel.test_dp_grads_match_single_device)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(state_dp["params"]),
        jax.tree_util.tree_leaves_with_path(state_single["params"]),
    ):
        key = jax.tree_util.keystr(path)
        if "bias" in key:
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, err_msg=key,
        )
    # scheduler advanced identically
    np.testing.assert_allclose(
        np.asarray(state_dp["sched"]["t_ext"]), np.asarray(state_single["sched"]["t_ext"])
    )


def test_dp_explicit_grads_match_single_device():
    """One step's psum'd gradient tree equals the unsharded gradient tree
    (tight: no optimizer amplification in the comparison)."""
    from feature_level_style_transfer_for_tsc_tpu.losses.classification import (
        cross_entropy,
    )
    from feature_level_style_transfer_for_tsc_tpu.models.cpc import cpc_apply

    pipe, cfg = _tiny_pipe()
    state0 = pipe.init_state(jax.random.PRNGKey(0))
    ds = make_dataset(8, 2, 16, 2, seed=0)
    x, y = jnp.asarray(ds.x), jnp.asarray(ds.y)
    rng = jax.random.PRNGKey(7)

    def single_loss(params, mstate):
        feat, _ = pipe.target_features(params, mstate, x, True)
        logits, _, _ = pipe.classify_target(params, mstate, feat, True)
        return cross_entropy(logits, y) + cpc_apply(params["cpc"], feat, rng)

    g_single = jax.jit(jax.grad(single_loss))(state0["params"], state0["mstate"])

    mesh = make_mesh(data=4, domain=1)
    from jax.sharding import PartitionSpec as P

    from feature_level_style_transfer_for_tsc_tpu.ops.batchnorm import bn_cross_replica
    from feature_level_style_transfer_for_tsc_tpu.parallel.dp_explicit import (
        _cpc_contrib,
    )

    def local_loss(params, mstate, x_loc, y_loc):
        with bn_cross_replica("data"):
            feat, _ = pipe.target_features(params, mstate, x_loc, True)
            logits, _, _ = pipe.classify_target(params, mstate, feat, True)
        return cross_entropy(logits, y_loc) / 4 + _cpc_contrib(
            params["cpc"], feat, rng, "data"
        )

    def sharded_grads(params, mstate, x, y):
        return jax.lax.psum(jax.grad(local_loss)(params, mstate, x, y), "data")

    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, P("data"))
    g_dp = jax.jit(
        jax.shard_map(
            sharded_grads,
            mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data")),
            out_specs=P(),
            check_vma=False,
        )
    )(*(replicate(mesh, (state0["params"], state0["mstate"]))),
      jax.device_put(x, sh), jax.device_put(y, sh))

    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_dp),
        jax.tree_util.tree_leaves_with_path(g_single),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )
