"""Five-phase pipeline smoke/behavior tests on tiny shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feature_level_style_transfer_for_tsc_tpu.config import (
    FlowConfig,
    GradNormConfig,
    OptimConfig,
    PipelineConfig,
)
from feature_level_style_transfer_for_tsc_tpu.data.synthetic import make_dataset
from feature_level_style_transfer_for_tsc_tpu.train.pipeline import StyleTransferPipeline


def tiny_config():
    return PipelineConfig(
        batch_size=6,
        max_kernel_size=5,
        cdan_dim=32,
        cpc_hidden=8,
        budget_multiplier=0.02,
        flow=FlowConfig(n_flows=2, wn_channels=8, wn_layers=2),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    td, sd = {}, {}
    t_train = make_dataset(12, 2, 16, 2, seed=0, label_dict=td)
    t_test = make_dataset(6, 2, 16, 2, seed=1, label_dict=td, is_train=False)
    s_train = make_dataset(12, 1, 12, 3, seed=2, label_dict=sd)
    s_test = make_dataset(6, 1, 12, 3, seed=3, label_dict=sd, is_train=False)
    pipe = StyleTransferPipeline(2, 16, 2, 1, 12, 3, cfg)
    return pipe, t_train, t_test, s_train, s_test


def test_feature_channels_even(setup):
    pipe = setup[0]
    assert pipe.feat_channels % 2 == 0  # WaveGlow n_group must be even


def test_full_curriculum_tiny(setup):
    pipe, t_train, t_test, s_train, s_test = setup
    state, history = pipe.run(
        t_train, t_test, s_train, s_test,
        epochs={"p1": 1, "p2": 1, "p3": 2, "p4": 2, "p5": 2},
        verbose=False,
    )
    phases = {h["phase"] for h in history}
    assert phases == {
        "p1", "p1_eval", "p2", "p2_eval", "p3", "p3_eval", "p4", "p4_eval",
        "p5", "p5_eval",
    }
    # pretrain eval cadence parity: phases 1-3 every epoch, phase 4 only on
    # its supervised (every-75th) epochs (reference train_and_test.py
    # :177-179,217-219,286-293,448-455)
    assert len([h for h in history if h["phase"] == "p3_eval"]) == 2
    assert len([h for h in history if h["phase"] == "p4_eval"]) == 1
    p1_eval = [h for h in history if h["phase"] == "p1_eval"][0]
    assert set(p1_eval) == {"phase", "epoch", "target_train_acc", "target_test_acc"}
    p2_eval = [h for h in history if h["phase"] == "p2_eval"][0]
    assert set(p2_eval) == {"phase", "epoch", "source_train_acc", "source_test_acc"}
    # every logged loss is finite
    for h in history:
        for k, v in h.items():
            if k.endswith("_loss") or k in ("cdan", "fd"):
                assert np.all(np.isfinite(v)), f"{k} not finite in {h}"
    # gradnorm weights keep their fixed sums (7 / 8)
    last_p5 = [h for h in history if h["phase"] == "p5"][-1]
    np.testing.assert_allclose(np.sum(last_p5["gradnorm_w_t"]), 7.0, rtol=1e-4)
    np.testing.assert_allclose(np.sum(last_p5["gradnorm_w_s"]), 8.0, rtol=1e-4)
    # eval accuracies are valid probabilities
    ev = [h for h in history if h["phase"] == "p5_eval"][-1]
    for k in ("target_test_acc", "source_test_acc"):
        assert 0.0 <= ev[k] <= 1.0
    # WGAN clipping applied
    ad_leaves = jax.tree_util.tree_leaves(state["params"]["ad"])
    assert max(float(jnp.max(jnp.abs(l))) for l in ad_leaves) <= 5e-4 + 1e-8
    fd_leaves = jax.tree_util.tree_leaves(state["params"]["fd"])
    assert max(float(jnp.max(jnp.abs(l))) for l in fd_leaves) <= 1e-2 + 1e-8


def test_phase_checkpoint_hook_fires_at_boundaries(setup):
    pipe, t_train, t_test, s_train, s_test = setup
    seen = []
    pipe.run(
        t_train, t_test, s_train, s_test,
        epochs={"p1": 1, "p2": 1, "p3": 1, "p4": 1, "p5": 1},
        verbose=False, pretrain_eval_every=0,
        phase_checkpoint_hook=lambda phase, state: seen.append(phase),
    )
    assert seen == ["p1", "p2", "p3", "p4", "p5"]


def test_noise_transfer_state_advances(setup):
    pipe, t_train, t_test, s_train, s_test = setup
    state, _ = pipe.run(
        t_train, t_test, s_train, s_test,
        epochs={"p1": 0, "p2": 0, "p3": 0, "p4": 0, "p5": 1},
        verbose=False,
    )
    ns = state["mstate"]["noise"]
    assert int(ns.time) == 2  # 2 batches in one epoch (12 samples / bs 6)
    assert int(ns.cal_num_target) == 12
    assert float(jnp.sum(jnp.abs(ns.target_avg))) > 0.0


def test_critic_counters_advance(setup):
    pipe, t_train, t_test, s_train, s_test = setup
    state, _ = pipe.run(
        t_train, t_test, s_train, s_test,
        epochs={"p1": 0, "p2": 0, "p3": 0, "p4": 0, "p5": 1},
        verbose=False,
    )
    # ad_net called twice per batch in CDAN, fd three times per batch
    assert int(state["mstate"]["ad"].iter_num) == 2 * 2 - 1
    assert int(state["mstate"]["fd"].iter_num) == 3 * 2 - 1


def test_fused_infer_predict_matches_unfused(setup):
    """The serving path (_predict_target, fused conv+foldedBN+ReLU) equals an
    inline unfused eval forward, and predict_target returns its argmax."""
    pipe, t_train, *_ = setup
    state = pipe.init_state(jax.random.PRNGKey(7))
    x = jnp.asarray(t_train.x[:6])

    fused = pipe._predict_target(state["params"], state["mstate"], x)
    feat, _ = pipe.target_features(state["params"], state["mstate"], x, False)
    unfused, _, _ = pipe.classify_target(state["params"], state["mstate"], feat, False)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused), atol=1e-5)

    preds = pipe.predict_target(state, t_train.x[:6])
    np.testing.assert_array_equal(preds, np.argmax(np.asarray(fused), -1))


def test_fused_optimizers_match_per_module():
    """config.fused_optimizers=True (one flat RMSprop update, segment LRs,
    static step masks) equals the 10 per-module optax chains.

    Asserted at single-epoch level: the elementwise math is identical but
    the two configs compile different graphs, and over many epochs ulp-level
    rounding is amplified through RMSprop's eps-dominated near-zero-grad
    regime and the +-5e-4 WGAN clip corners (chaos, not divergence).
    Exact-math equivalence incl. subset masking is covered by the optimizer
    unit in this test's second half."""
    import dataclasses

    td, sd = {}, {}
    t_train = make_dataset(12, 2, 16, 2, seed=0, label_dict=td)
    s_train = make_dataset(12, 1, 12, 3, seed=2, label_dict=sd)
    xb = jnp.asarray(t_train.x[:6])[None]
    yb = jnp.asarray(t_train.y[:6])[None]
    xs = jnp.asarray(np.repeat(s_train.x[:6], 1, 0))[None]
    ys = jnp.asarray(s_train.y[:6])[None]

    results = []
    for fused in (True, False):
        cfg = dataclasses.replace(tiny_config(), fused_optimizers=fused)
        pipe = StyleTransferPipeline(2, 16, 2, 1, 12, 3, cfg)
        state = pipe.init_state(jax.random.PRNGKey(0))
        s1, _ = pipe.phase1_epoch(state, xb, yb)
        s5, _ = pipe.phase5_epoch(state, xb, yb, xs, ys, 0)
        results.append((s1["params"], s5["params"]))
    for which, (a_tree, b_tree) in enumerate(zip(results[0], results[1])):
        for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(a_tree),
            jax.tree_util.tree_leaves(b_tree),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5,
                err_msg=f"phase{'15'[which]} {jax.tree_util.keystr(path)}",
            )

    # exact-math unit: 3 masked fused steps == per-module optax chains
    from feature_level_style_transfer_for_tsc_tpu.train.optim import (
        fused_rmsprop_init,
        fused_rmsprop_update,
        make_rmsprop,
    )
    import optax

    rng = np.random.default_rng(0)
    params = {"a": {"w": jnp.asarray(rng.standard_normal((4, 5)).astype(np.float32))},
              "b": {"k": jnp.asarray(rng.standard_normal((3, 3)).astype(np.float32))},
              "c": {"z": jnp.asarray(rng.standard_normal((7,)).astype(np.float32))}}
    grads = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape).astype(np.float32)), params
    )
    lrs = {"a": 1e-3, "b": 5e-4, "c": 2e-3}
    names = ("a", "c")  # b frozen: second moment must not decay
    tx = {n: make_rmsprop(lrs[n]) for n in params}
    opt = {n: tx[n].init(params[n]) for n in params}
    ref = dict(params)
    for _ in range(3):
        for n in names:
            upd, opt[n] = tx[n].update(grads[n], opt[n], ref[n])
            ref[n] = optax.apply_updates(ref[n], upd)
    order = tuple(sorted(params))
    fstate = fused_rmsprop_init(params, [lrs[n] for n in order])
    mask = np.concatenate([
        np.full(sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params[n])),
                1.0 if n in names else 0.0, np.float32)
        for n in order
    ])
    fused_p = params
    for _ in range(3):
        fused_p, fstate = fused_rmsprop_update(fused_p, grads, fstate, mask)
    for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(fused_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8)
