"""Voting parity vs a direct numpy transcription of the reference loops."""

import jax.numpy as jnp
import numpy as np

from feature_level_style_transfer_for_tsc_tpu.config import VotingConfig
from feature_level_style_transfer_for_tsc_tpu.evaluation import (
    entropy_precision_vote,
    normalize_model_weights,
    per_class_precision_weights,
)


def _numpy_reference_vote(all_logits, all_weights):
    """Transcription of multi_source_voting.py:405-424."""
    results = []
    for logits, w in zip(all_logits, all_weights):
        probs = np.copy(logits)
        for i in range(len(probs)):
            probs[i] = np.exp(probs[i]) / np.sum(np.exp(probs[i]))
            ent = -np.sum(probs[i] * np.log(probs[i]))  # scipy.stats.entropy
            probs[i] = probs[i] * (1 + 120 * np.exp(-ent)) * np.power(9.0, w)
        results.append(probs)
    return np.argmax(sum(results), axis=1)


def _numpy_reference_precision(preds, labels, num_class):
    """Transcription of multi_source_voting.py:297-310."""
    out = []
    for c in range(num_class):
        num, correct = 0, 0
        for n in range(len(preds)):
            if preds[n] == c:
                num += 1
                if preds[n] == labels[n]:
                    correct += 1
        out.append(correct / num if num else 0)
    return np.asarray(out)


def test_vote_matches_numpy_reference():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((3, 17, 4)).astype(np.float32) * 2
    weights = rng.uniform(0, 2, (3, 4)).astype(np.float32)
    got = np.asarray(entropy_precision_vote(jnp.asarray(logits), jnp.asarray(weights)))
    want = _numpy_reference_vote(logits, weights)
    np.testing.assert_array_equal(got, want)


def test_precision_weights_match_numpy_reference():
    rng = np.random.default_rng(1)
    preds = rng.integers(0, 5, 40)
    labels = rng.integers(0, 5, 40)
    got = np.asarray(per_class_precision_weights(jnp.asarray(preds), jnp.asarray(labels), 5))
    want = _numpy_reference_precision(preds, labels, 5)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_normalize_model_weights():
    w = jnp.asarray([[1.0, 0.0], [3.0, 0.0]])
    out = np.asarray(normalize_model_weights(w))
    # per-class mean: [2.0, 0.0]; zero-mean class -> nan -> 0
    np.testing.assert_allclose(out, [[0.5, 0.0], [1.5, 0.0]])


def test_predicted_label_vote_matches_numpy_reference():
    """Transcription of visualization.py:414-430 (base-12 variant)."""
    from feature_level_style_transfer_for_tsc_tpu.evaluation.voting import (
        predicted_label_vote,
    )

    rng = np.random.default_rng(3)
    logits = rng.standard_normal((2, 11, 3)).astype(np.float32) * 2
    weights = rng.uniform(0, 2, (2, 3)).astype(np.float32)

    results = []
    for lg, w in zip(logits, weights):
        probs = np.copy(lg)
        for i in range(len(probs)):
            probs[i] = np.exp(probs[i]) / np.sum(np.exp(probs[i]))
            ent = -np.sum(probs[i] * np.log(probs[i]))
            the_label = np.argmax(probs[i])
            probs[i] = probs[i] * (1 + 120 * np.exp(-ent)) * np.power(12.0, w[the_label])
        results.append(probs)
    want = np.argmax(sum(results), axis=1)
    got = np.asarray(predicted_label_vote(jnp.asarray(logits), jnp.asarray(weights)))
    np.testing.assert_array_equal(got, want)
