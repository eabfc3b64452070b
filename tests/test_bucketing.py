"""Shape-bucketing tests: padded ops == unpadded ops; buckets share compiles."""

import jax
import jax.numpy as jnp
import numpy as np

from feature_level_style_transfer_for_tsc_tpu.config import PipelineConfig
from feature_level_style_transfer_for_tsc_tpu.data.synthetic import make_dataset
from feature_level_style_transfer_for_tsc_tpu.models import (
    os_block_masks,
    os_cnn_apply,
    os_cnn_init,
    os_cnn_res_apply,
    os_cnn_res_init,
)
from feature_level_style_transfer_for_tsc_tpu.models.os_cnn_padded import (
    class_mask,
    os_cnn_apply_padded,
    os_cnn_res_apply_padded,
    time_mask,
)
from feature_level_style_transfer_for_tsc_tpu.train.bucketed import (
    BucketedOSCNNClassifier,
    bucket_classes,
    bucket_key,
    bucket_t,
)

SPECS = [[(3, 4, 1), (3, 4, 3), (3, 4, 5)], [(12, 5, 1), (12, 5, 2)]]
T_REAL, T_BUCKET = 19, 32


def _pad(x, t_bucket):
    return jnp.pad(x, ((0, 0), (0, t_bucket - x.shape[1]), (0, 0)))


def test_padded_extractor_matches_unpadded():
    params, state = os_cnn_res_init(jax.random.PRNGKey(0), SPECS)
    masks = [jnp.asarray(m) for m in os_block_masks(SPECS)]
    x = jax.random.normal(jax.random.PRNGKey(1), (4, T_REAL, 3))
    tmask = time_mask(T_BUCKET, jnp.asarray(float(T_REAL)))
    for training in (True, False):
        want, want_state = os_cnn_res_apply(params, state, masks, x, training)
        got, got_state = os_cnn_res_apply_padded(
            params, state, masks, _pad(x, T_BUCKET), training, tmask,
            jnp.asarray(float(T_REAL)),
        )
        np.testing.assert_allclose(
            np.asarray(got[:, :T_REAL]), np.asarray(want), atol=1e-5,
            err_msg=f"features, training={training}",
        )
        assert float(jnp.max(jnp.abs(got[:, T_REAL:]))) == 0.0  # pad stays zero
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(got_state),
            jax.tree_util.tree_leaves_with_path(want_state),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5,
                err_msg=f"BN state {jax.tree_util.keystr(path)} training={training}",
            )


def test_padded_classifier_matches_unpadded():
    n_real, n_bucket = 3, 8
    params, state = os_cnn_init(jax.random.PRNGKey(0), SPECS, n_bucket)
    masks = [jnp.asarray(m) for m in os_block_masks(SPECS)]
    x = jax.random.normal(jax.random.PRNGKey(1), (4, T_REAL, 3))
    # unpadded comparator: same head truncated to the real classes
    params_small = dict(params)
    params_small["hidden"] = {
        "weight": params["hidden"]["weight"][:, :n_real],
        "bias": params["hidden"]["bias"][:n_real],
    }
    want_logits, want_pooled, _ = os_cnn_apply(params_small, state, masks, x, True)
    got_logits, got_pooled, _ = os_cnn_apply_padded(
        params, state, masks, _pad(x, T_BUCKET), True,
        time_mask(T_BUCKET, jnp.asarray(float(T_REAL))),
        jnp.asarray(float(T_REAL)),
        class_mask(n_bucket, jnp.asarray(n_real)),
    )
    np.testing.assert_allclose(
        np.asarray(got_logits[:, :n_real]), np.asarray(want_logits), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(got_pooled), np.asarray(want_pooled), atol=1e-5)
    assert float(jnp.max(got_logits[:, n_real:])) < -1e8  # padded classes dead
    # cross-entropy and argmax therefore match the unpadded head
    from feature_level_style_transfer_for_tsc_tpu.losses.classification import (
        cross_entropy,
    )

    y = jnp.asarray([0, 1, 2, 1])
    np.testing.assert_allclose(
        float(cross_entropy(got_logits, y)), float(cross_entropy(want_logits, y)),
        rtol=1e-6,
    )


def test_bucket_keys():
    assert bucket_t(64) == 64 and bucket_t(65) == 96
    assert bucket_classes(2) == 4 and bucket_classes(5) == 8
    # same architecture + pad shapes -> same bucket despite different T/classes
    assert bucket_key(1, 400, 2) == bucket_key(1, 380, 3)
    # different receptive field -> different architecture -> different bucket
    assert bucket_key(1, 100, 2) != bucket_key(1, 120, 2)


def test_bucket_shares_one_compile_across_datasets():
    """Two datasets with different (T, n_class, N) in one bucket train on ONE
    compiled program; accuracy sane on both."""
    cfg = PipelineConfig(batch_size=6, max_kernel_size=5, budget_multiplier=0.02)
    key = bucket_key(1, 24, 2, cfg.max_kernel_size)
    assert key == bucket_key(1, 21, 3, cfg.max_kernel_size)
    clf = BucketedOSCNNClassifier(*key, config=cfg)

    ds_a = make_dataset(18, 1, 24, 2, seed=0)
    ds_b = make_dataset(13, 1, 21, 3, seed=1)
    state_a, _ = clf.fit(ds_a, None, epochs=3, verbose=False)
    n_before = clf.train_batch._cache_size()
    state_b, _ = clf.fit(ds_b, None, epochs=3, verbose=False)
    assert clf.train_batch._cache_size() == n_before  # no new compile
    acc_a = clf.evaluate(state_a, ds_a.x, ds_a.y, 2)
    acc_b = clf.evaluate(state_b, ds_b.x, ds_b.y, 3)
    assert 0.0 <= acc_a <= 1.0 and 0.0 <= acc_b <= 1.0
    # training actually learns the easy synthetic task on both shapes
    assert acc_a > 0.5
