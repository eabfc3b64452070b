"""End-to-end slice: OS-CNN classifier learns a synthetic task above chance."""

import jax
import jax.numpy as jnp
import numpy as np

from feature_level_style_transfer_for_tsc_tpu.data.synthetic import make_dataset
from feature_level_style_transfer_for_tsc_tpu.train.classifier import OSCNNClassifier
from feature_level_style_transfer_for_tsc_tpu.config import PipelineConfig


def _tiny_config():
    return PipelineConfig(batch_size=8, max_kernel_size=11, eval_every=5)


def test_classifier_learns_synthetic():
    d = {}
    train = make_dataset(48, 2, 64, 3, seed=0, label_dict=d)
    test = make_dataset(24, 2, 64, 3, seed=1, label_dict=d, is_train=False)
    clf = OSCNNClassifier(2, 64, 3, config=_tiny_config(), with_cpc=False)
    state, history = clf.fit(train, test, epochs=12, verbose=False)
    final_train = clf.evaluate(state, train.x, train.y)
    assert final_train > 0.6, f"train acc {final_train} not above chance"


def test_classifier_with_cpc_runs():
    d = {}
    train = make_dataset(16, 1, 32, 2, seed=2, label_dict=d)
    clf = OSCNNClassifier(1, 32, 2, config=_tiny_config(), with_cpc=True)
    state, history = clf.fit(train, None, epochs=2, verbose=False)
    assert np.isfinite(history[-1]["c_loss"])
    assert np.isfinite(history[-1]["sl_loss"])


def test_epoch_updates_lr_with_steplr():
    from feature_level_style_transfer_for_tsc_tpu.train.optim import get_lr

    d = {}
    train = make_dataset(16, 1, 32, 2, seed=3, label_dict=d)
    cfg = _tiny_config()
    clf = OSCNNClassifier(1, 32, 2, config=cfg, with_cpc=False)
    state = clf.init_state(jax.random.PRNGKey(0))
    from feature_level_style_transfer_for_tsc_tpu.data.batching import epoch_batches

    xb, yb = epoch_batches(train.x, train.y, jax.random.PRNGKey(1), cfg.batch_size)
    for _ in range(26):
        state, _ = clf.train_epoch(state, jnp.asarray(xb), jnp.asarray(yb))
    # after 26 epochs, one StepLR decay (step 25, gamma 0.8)
    np.testing.assert_allclose(
        float(get_lr(state["opt"]["ext"])), 1e-3 * 0.8, rtol=1e-5
    )
