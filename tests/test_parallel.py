"""Distributed tests on the 8-device virtual CPU mesh: DP math parity and
domain-sharded ensemble voting."""

import jax
import jax.numpy as jnp
import numpy as np

from feature_level_style_transfer_for_tsc_tpu.config import PipelineConfig
from feature_level_style_transfer_for_tsc_tpu.data.batching import epoch_batches
from feature_level_style_transfer_for_tsc_tpu.data.synthetic import make_dataset
from feature_level_style_transfer_for_tsc_tpu.parallel import (
    MultiSourceEnsemble,
    make_mesh,
    replicate,
    shard_epoch_batches,
)
from feature_level_style_transfer_for_tsc_tpu.train.classifier import OSCNNClassifier


def tiny_config(bs=8):
    return PipelineConfig(batch_size=bs, max_kernel_size=7, budget_multiplier=0.02)


def test_mesh_axes():
    mesh = make_mesh(data=4, domain=2)
    assert mesh.axis_names == ("data", "domain")
    assert mesh.devices.shape == (4, 2)


def test_dp_grads_match_single_device():
    """Batch-sharded per-batch gradients equal the unsharded gradients.

    (Param trajectories are NOT compared bitwise: conv biases feeding
    BatchNorm have mathematically-zero gradients, so RMSprop turns float
    noise into lr-sized steps — a degeneracy the reference shares; DP only
    changes the reduction order of that noise.)
    """
    cfg = tiny_config()
    ds = make_dataset(16, 1, 24, 2, seed=0)
    clf = OSCNNClassifier(1, 24, 2, config=cfg, with_cpc=False)
    state = clf.init_state(jax.random.PRNGKey(0))
    xb, yb = epoch_batches(ds.x, ds.y, jax.random.PRNGKey(1), cfg.batch_size)
    xb, yb = jnp.asarray(xb), jnp.asarray(yb)

    def grads_fn(params, mstate, x, y, rng):
        g, _ = jax.grad(clf._loss, has_aux=True)(params, mstate, x, y, rng)
        return g

    rng = jax.random.PRNGKey(7)
    g_single = jax.jit(grads_fn)(state["params"], state["mstate"], xb[0], yb[0], rng)

    mesh = make_mesh(data=4, domain=1)
    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(xb[0], NamedSharding(mesh, P("data")))
    ys = jax.device_put(yb[0], NamedSharding(mesh, P("data")))
    sr = replicate(mesh, state)
    g_dp = jax.jit(grads_fn)(sr["params"], sr["mstate"], xs, ys, rng)

    for a, b in zip(jax.tree_util.tree_leaves(g_single), jax.tree_util.tree_leaves(g_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dp_epoch_runs_and_weights_stay_close():
    """A full sharded epoch stays functionally equivalent (non-degenerate
    leaves close; conv biases excluded per the degeneracy note above)."""
    cfg = tiny_config()
    ds = make_dataset(16, 1, 24, 2, seed=0)
    clf = OSCNNClassifier(1, 24, 2, config=cfg, with_cpc=False)
    state = clf.init_state(jax.random.PRNGKey(0))
    xb, yb = epoch_batches(ds.x, ds.y, jax.random.PRNGKey(1), cfg.batch_size)
    xb, yb = jnp.asarray(xb), jnp.asarray(yb)

    state_single, _ = clf.train_epoch(state, xb, yb)
    mesh = make_mesh(data=4, domain=1)
    xb_s, yb_s = shard_epoch_batches(mesh, xb, yb)
    state_dp, _ = clf.train_epoch(replicate(mesh, state), xb_s, yb_s)

    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(state_single["params"]),
        jax.tree_util.tree_leaves_with_path(state_dp["params"]),
    ):
        if "bias" in jax.tree_util.keystr(path):
            continue
        # BN's scale invariance leaves a degenerate direction in every
        # preceding weight as well; tolerance reflects one epoch of
        # RMSprop-amplified reduction-order noise along those directions.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def test_domain_sharded_ensemble_matches_sequential():
    cfg = tiny_config()
    d = {}
    train = make_dataset(20, 1, 24, 3, seed=1, label_dict=d)
    test = make_dataset(12, 1, 24, 3, seed=2, label_dict=d, is_train=False)

    # three independently-initialized member models (stand-ins for three
    # source-adapted checkpoints)
    members = []
    clf = OSCNNClassifier(1, 24, 3, config=cfg, with_cpc=False)
    for seed in range(3):
        st = clf.init_state(jax.random.PRNGKey(seed))
        members.append({"params": st["params"], "mstate": st["mstate"]})

    # sequential (host-loop) reference
    seq = MultiSourceEnsemble(1, 24, 3, config=cfg)
    stacked_seq = seq.stack(members)
    res_seq = seq.evaluate(stacked_seq, train, test)

    # domain-sharded
    mesh = make_mesh(data=1, domain=4)
    ens = MultiSourceEnsemble(1, 24, 3, config=cfg, mesh=mesh)
    # 4-way domain axis with 3 models: pad by repeating a member is NOT
    # equivalent; use domain=3 sub-mesh instead
    mesh3 = make_mesh(data=1, domain=3, devices=jax.devices()[:3])
    ens = MultiSourceEnsemble(1, 24, 3, config=cfg, mesh=mesh3)
    stacked = ens.stack(members)
    res = ens.evaluate(stacked, train, test)

    assert res["ensemble_acc"] == res_seq["ensemble_acc"]
    np.testing.assert_array_equal(res["predictions"], res_seq["predictions"])
    np.testing.assert_allclose(res["class_weights"], res_seq["class_weights"], atol=1e-6)


def test_time_sharded_conv_matches_unsharded():
    """SP halo-exchange conv == unsharded masked conv (bitwise-close)."""
    from feature_level_style_transfer_for_tsc_tpu.ops.osconv import (
        build_os_mask,
        init_os_conv_params,
        masked_os_conv,
    )
    from feature_level_style_transfer_for_tsc_tpu.parallel.sequence import (
        time_sharded_os_conv,
    )

    spec = [(3, 4, 1), (3, 4, 3), (3, 4, 5)]
    params = init_os_conv_params(jax.random.PRNGKey(0), spec)
    mask = jnp.asarray(build_os_mask(spec))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 3))

    want = masked_os_conv(x, params["weight"], params["bias"], mask)
    mesh = make_mesh(data=4, domain=1)
    got = time_sharded_os_conv(mesh, x, params["weight"], params["bias"], mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_phase5_dp_epoch_matches_single_device():
    """The FLAGSHIP sharded claim: a batch-sharded phase5_epoch (GradNorm,
    staged adversarial weights, 11 optimizers, clipping) equals the same
    epoch on one device — metrics and one-step params (BN-degenerate bias
    leaves excluded per the note on test_dp_grads_match_single_device)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from feature_level_style_transfer_for_tsc_tpu.config import FlowConfig
    from feature_level_style_transfer_for_tsc_tpu.train.pipeline import (
        StyleTransferPipeline,
    )

    cfg = PipelineConfig(
        batch_size=8, max_kernel_size=5, cdan_dim=32, cpc_hidden=8,
        budget_multiplier=0.02, flow=FlowConfig(n_flows=2, wn_channels=8, wn_layers=2),
    )
    pipe = StyleTransferPipeline(2, 16, 2, 1, 12, 3, cfg)
    state0 = pipe.init_state(jax.random.PRNGKey(0))
    t_train = make_dataset(16, 2, 16, 2, seed=0)
    s_train = make_dataset(16, 1, 12, 3, seed=1)
    mesh = make_mesh(data=4, domain=1)
    sh = NamedSharding(mesh, P(None, "data"))

    # THREE-epoch trajectory (VERDICT r2 #4): metrics compared every epoch so
    # cumulative drift can't hide inside one epoch's tolerance
    state_single = state0
    state_dp = replicate(mesh, state0)
    xt = None
    for e in range(3):
        xt, yt = epoch_batches(
            t_train.x, t_train.y, jax.random.PRNGKey(2 + 10 * e), cfg.batch_size
        )
        xs, ys = epoch_batches(
            s_train.x, s_train.y, jax.random.PRNGKey(3 + 10 * e), cfg.batch_size
        )
        xt, yt, xs, ys = (jnp.asarray(a) for a in (xt, yt, xs, ys))
        state_single, m_single = pipe.phase5_epoch(
            state_single, xt, yt, xs, ys, jnp.asarray(e)
        )
        state_dp, m_dp = pipe.phase5_epoch(
            state_dp,
            jax.device_put(xt, sh), jax.device_put(yt, sh),
            jax.device_put(xs, sh), jax.device_put(ys, sh),
            jnp.asarray(e),
        )
        for k in m_single:
            np.testing.assert_allclose(
                np.asarray(m_dp[k]), np.asarray(m_single[k]), rtol=2e-3, atol=2e-4,
                err_msg=f"metric {k} at epoch {e}",
            )
    # param equality, excluding the degenerate directions where RMSprop
    # amplifies reduction-order noise: BN-fed biases (zero grads) and the
    # flow's weight-norm (v, g) reparameterization (v-scale is a null
    # direction); those are covered by the functional probe below
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(state_dp["params"]),
        jax.tree_util.tree_leaves_with_path(state_single["params"]),
    ):
        key = jax.tree_util.keystr(path)
        if "bias" in key or ("'nf'" in key and ("'v'" in key or "'g'" in key)):
            continue
        # loose bound — see __graft_entry__.py note: metric equality and the
        # functional probe are the strong invariants; this only catches
        # gross divergence
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-2, err_msg=key,
        )
    # GradNorm states advanced identically
    np.testing.assert_allclose(
        np.asarray(state_dp["gradnorm"]["t"].weights),
        np.asarray(state_single["gradnorm"]["t"].weights), rtol=1e-3,
    )
    # functional probe: the full phase-5 forward from each side's updated
    # params/mstate computes the same losses
    probe = jax.random.PRNGKey(99)
    l_dp, _, _ = pipe._phase5_forward(
        jax.device_get(state_dp["params"]), jax.device_get(state_dp["mstate"]),
        state_single["consts"], xt[0], yt[0], xs[0], ys[0], probe,
    )
    l_1, _, _ = pipe._phase5_forward(
        state_single["params"], state_single["mstate"], state_single["consts"],
        xt[0], yt[0], xs[0], ys[0], probe,
    )
    for k in l_1:
        np.testing.assert_allclose(
            np.asarray(l_dp[k]), np.asarray(l_1[k]), rtol=5e-3, atol=2e-3,
            err_msg=f"functional probe loss {k}",
        )


def test_time_sharded_dilated_conv_matches_unsharded():
    """SP dilated conv (the WN convs' primitive) == unsharded, per dilation."""
    from feature_level_style_transfer_for_tsc_tpu.models.flow import _dilated_conv_same
    from feature_level_style_transfer_for_tsc_tpu.parallel.sequence import (
        time_sharded_dilated_conv,
    )

    mesh = make_mesh(data=4, domain=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 6))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 6, 10)) * 0.2
    b = jax.random.normal(jax.random.PRNGKey(2), (10,)) * 0.1
    for dilation in (1, 2, 4, 8):
        want = _dilated_conv_same(x, w, b, dilation)
        got = time_sharded_dilated_conv(mesh, x, w, b, dilation)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5,
            err_msg=f"dilation {dilation}",
        )


def test_time_sharded_wn_matches_unsharded():
    """The full WN coupling net over sharded time == unsharded wn_apply."""
    from feature_level_style_transfer_for_tsc_tpu.models.flow import wn_apply, wn_init
    from feature_level_style_transfer_for_tsc_tpu.parallel.sequence import (
        time_sharded_wn_apply,
    )

    mesh = make_mesh(data=4, domain=1)
    params = wn_init(jax.random.PRNGKey(0), 4, n_layers=3, n_channels=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 4))
    want = wn_apply(params, x, 8)
    got = time_sharded_wn_apply(mesh, params, x, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_time_sharded_waveglow_matches_unsharded():
    """Flow density direction over sharded time == unsharded, incl. the NLL."""
    from feature_level_style_transfer_for_tsc_tpu.models.flow import (
        waveglow_forward,
        waveglow_init,
        waveglow_loss,
    )
    from feature_level_style_transfer_for_tsc_tpu.parallel.sequence import (
        time_sharded_waveglow_forward,
    )

    mesh = make_mesh(data=4, domain=1)
    params = waveglow_init(jax.random.PRNGKey(0), 2, 6, 8, n_wn_layers=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 6))
    z_w, ls_w, ld_w = waveglow_forward(params, x, 8)
    z_g, ls_g, ld_g = time_sharded_waveglow_forward(mesh, params, x, 8)
    np.testing.assert_allclose(np.asarray(z_g), np.asarray(z_w), atol=1e-5)
    for a, b in zip(ls_g, ls_w):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(ld_g, ld_w):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    np.testing.assert_allclose(
        float(waveglow_loss((z_g, ls_g, ld_g))),
        float(waveglow_loss((z_w, ls_w, ld_w))),
        rtol=1e-5,
    )


def test_time_sharded_extractor_matches_unsharded():
    """OS_CNN_res forward over sharded time == unsharded, both BN modes;
    train mode also reproduces the updated running statistics (psum)."""
    from feature_level_style_transfer_for_tsc_tpu.models import (
        os_block_masks,
        os_cnn_res_apply,
        os_cnn_res_init,
    )
    from feature_level_style_transfer_for_tsc_tpu.parallel.sequence import (
        time_sharded_os_cnn_res_apply,
    )

    mesh = make_mesh(data=4, domain=1)
    spec = [(3, 4, 1), (3, 4, 3), (3, 4, 5)]
    specs = [spec, [(12, 5, 1), (12, 5, 2)]]
    params, state = os_cnn_res_init(jax.random.PRNGKey(0), specs)
    masks = [jnp.asarray(m) for m in os_block_masks(specs)]
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 3))

    for training in (False, True):
        want, want_state = os_cnn_res_apply(params, state, masks, x, training)
        got, got_state = time_sharded_os_cnn_res_apply(
            mesh, params, state, masks, x, training=training
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5,
            err_msg=f"features, training={training}",
        )
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(got_state),
            jax.tree_util.tree_leaves_with_path(want_state),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5,
                err_msg=f"state {jax.tree_util.keystr(path)}, training={training}",
            )


def test_train_members_parallel_matches_sequential():
    """Round-robin device-pinned member training == sequential results."""
    from feature_level_style_transfer_for_tsc_tpu.parallel.multi_pipeline import (
        train_members_parallel,
    )

    cfg = tiny_config(bs=4)
    datasets = [make_dataset(8, 1, 16, 2, seed=s) for s in (0, 1, 2)]

    def make_member(seed, ds):
        def fn():
            clf = OSCNNClassifier(1, 16, 2, config=cfg, with_cpc=False)
            state, _ = clf.fit(ds, None, epochs=2, verbose=False)
            return clf.evaluate(state, ds.x, ds.y)

        return fn

    fns = [make_member(s, ds) for s, ds in enumerate(datasets)]
    seq = [fn() for fn in fns]
    par = train_members_parallel(fns, devices=jax.devices()[:3])
    assert par == seq
