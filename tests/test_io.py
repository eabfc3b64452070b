"""Checkpoint round-trip, partial restore, artifacts."""

import jax
import jax.numpy as jnp
import numpy as np

from feature_level_style_transfer_for_tsc_tpu.config import PipelineConfig
from feature_level_style_transfer_for_tsc_tpu.data.synthetic import make_dataset
from feature_level_style_transfer_for_tsc_tpu.io import (
    partial_restore,
    restore_checkpoint,
    save_checkpoint,
    save_feature_dumps,
    save_prediction_strip,
)
from feature_level_style_transfer_for_tsc_tpu.train.classifier import OSCNNClassifier


def _clf():
    cfg = PipelineConfig(batch_size=4, max_kernel_size=5, budget_multiplier=0.02)
    return OSCNNClassifier(1, 16, 3, config=cfg, with_cpc=False)


def test_checkpoint_roundtrip(tmp_path):
    clf = _clf()
    state = clf.init_state(jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state)
    # perturb then restore
    mutated = jax.tree_util.tree_map(lambda x: x * 0, state)
    restored = restore_checkpoint(path, mutated)
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_partial_restore_skips_head(tmp_path):
    clf = _clf()
    s1 = clf.init_state(jax.random.PRNGKey(0))
    s2 = clf.init_state(jax.random.PRNGKey(1))
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, s1["params"])
    merged = partial_restore(path, s2["params"], skip_substrings=["hidden"])
    # block restored from s1
    np.testing.assert_array_equal(
        np.asarray(merged["cls"]["block"]["layers"][0]["conv"]["weight"]),
        np.asarray(s1["params"]["cls"]["block"]["layers"][0]["conv"]["weight"]),
    )
    # head kept from s2 (SLARDA-style skip)
    np.testing.assert_array_equal(
        np.asarray(merged["cls"]["hidden"]["weight"]),
        np.asarray(s2["params"]["cls"]["hidden"]["weight"]),
    )


def test_resume_training_after_restore(tmp_path):
    """Full-state checkpoint resumes training bit-exactly."""
    from feature_level_style_transfer_for_tsc_tpu.data.batching import epoch_batches

    clf = _clf()
    ds = make_dataset(8, 1, 16, 3, seed=0)
    state = clf.init_state(jax.random.PRNGKey(0))
    xb, yb = epoch_batches(ds.x, ds.y, jax.random.PRNGKey(1), 4)
    xb, yb = jnp.asarray(xb), jnp.asarray(yb)
    state, _ = clf.train_epoch(state, xb, yb)
    path = str(tmp_path / "mid.npz")
    save_checkpoint(path, state)
    state_a, _ = clf.train_epoch(state, xb, yb)
    restored = restore_checkpoint(path, jax.tree_util.tree_map(jnp.zeros_like, state))
    state_b, _ = clf.train_epoch(restored, xb, yb)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a["params"]), jax.tree_util.tree_leaves(state_b["params"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_artifacts(tmp_path):
    feats = {
        "t_feat": np.random.randn(2, 4, 8, 3),
        "s2t_feat": np.random.randn(2, 4, 8, 3),
        "s_feat": np.random.randn(2, 4, 8, 3),
        "s_pool": np.random.randn(2, 4, 3),
        "t2s_pool": np.random.randn(2, 4, 3),
        "s2t2s_pool": np.random.randn(2, 4, 3),
    }
    save_feature_dumps(str(tmp_path), 4, feats)
    loaded = np.load(str(tmp_path / "feature_of_target_s2t" / "epoch_4target_feature.npy"))
    assert loaded.shape == (8, 8, 3)

    save_prediction_strip(
        str(tmp_path / "strip.png"), np.array([0, 1, 1]), np.array([0, 1, 0])
    )
    from PIL import Image

    img = Image.open(str(tmp_path / "strip.png"))
    assert img.size[0] > 0


def test_orbax_backend_roundtrip(tmp_path):
    from feature_level_style_transfer_for_tsc_tpu.io.checkpoint import (
        restore_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    clf = _clf()
    state = clf.init_state(jax.random.PRNGKey(0))
    path = str(tmp_path / "orbax_state")
    save_checkpoint_orbax(path, state)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored = restore_checkpoint_orbax(path, zeros)
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
