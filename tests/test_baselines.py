"""CoDATS / SLARDA baseline smoke tests on tiny shapes."""

import numpy as np

from feature_level_style_transfer_for_tsc_tpu.baselines import CoDATSPipeline, SLARDAPipeline
from feature_level_style_transfer_for_tsc_tpu.config import PipelineConfig
from feature_level_style_transfer_for_tsc_tpu.data.synthetic import make_dataset


def tiny_config():
    return PipelineConfig(batch_size=6, max_kernel_size=5, budget_multiplier=0.02)


def test_codats_multi_source():
    cfg = tiny_config()
    t_train = make_dataset(12, 2, 16, 2, seed=0)
    t_test = make_dataset(6, 2, 16, 2, seed=1, label_dict=t_train.label_dict, is_train=False)
    s1 = make_dataset(12, 1, 12, 3, seed=2)
    s2 = make_dataset(12, 3, 20, 4, seed=3)
    pipe = CoDATSPipeline(
        (2, 16, 2), [(1, 12, 3), (3, 20, 4)], config=cfg,
        disc_hid=16, disc_depth=2, disc_heads=2, disc_mlp=8,
    )
    state, history = pipe.fit(t_train, t_test, [s1, s2], epochs=2, verbose=False)
    assert np.isfinite(history[-1]["loss_t"])
    assert np.all(np.isfinite(history[-1]["loss_s"]))
    assert np.isfinite(history[-1]["loss_disc"])
    assert 0.0 <= history[-1]["test_acc"] <= 1.0


def test_slarda_two_phase():
    cfg = tiny_config()
    t_train = make_dataset(12, 2, 16, 2, seed=0)
    t_test = make_dataset(6, 2, 16, 2, seed=1, label_dict=t_train.label_dict, is_train=False)
    s_train = make_dataset(12, 1, 12, 3, seed=2)
    pipe = SLARDAPipeline(
        (2, 16, 2), (1, 12, 3), config=cfg,
        disc_hid=16, disc_depth=2, disc_heads=2, disc_mlp=8,
    )
    state, history = pipe.fit(t_train, t_test, s_train, source_epochs=2, target_epochs=2, verbose=False)
    src = [h for h in history if h["phase"] == "source"]
    tgt = [h for h in history if h["phase"] == "target"]
    assert np.isfinite(src[-1]["s_c_loss"]) and np.isfinite(src[-1]["s_sl_loss"])
    assert np.isfinite(tgt[-1]["t_c_loss"]) and np.isfinite(tgt[-1]["disc_loss"])


def test_slarda_transfer_skips_head():
    import jax

    cfg = tiny_config()
    pipe = SLARDAPipeline((2, 16, 3), (1, 12, 5), config=cfg,
                          disc_hid=16, disc_depth=1, disc_heads=2, disc_mlp=8)
    state = pipe.init_state(jax.random.PRNGKey(0))
    before_head = np.asarray(state["params"]["t_cls"]["hidden"]["weight"])
    state2 = pipe.transfer_weights(state)
    # extractor copied exactly
    for a, b in zip(
        jax.tree_util.tree_leaves(state2["params"]["t_ext"]),
        jax.tree_util.tree_leaves(state2["params"]["s_ext"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # head untouched (shapes differ anyway: 3 vs 5 classes)
    np.testing.assert_array_equal(
        np.asarray(state2["params"]["t_cls"]["hidden"]["weight"]), before_head
    )
