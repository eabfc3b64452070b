"""Domain-parallel multi-source ensemble.

The reference realizes multi-source transfer as K *sequential* `train()`
runs (one per source domain) followed by offline numpy voting over loaded
checkpoints (`/root/reference/multi_source_voting.py:230-429`).  Here the K
target-shaped models (feature extractor + classifier, identical pytree
shapes because they share the target architecture) are STACKED along a
leading model axis that is sharded over the mesh's "domain" axis:

* per-model forward passes are a single `vmap` — XLA runs each model's
  compute on the devices owning its shard;
* the vote reduction ``sum over models`` lowers to one `psum` across the
  domain axis under GSPMD — replacing the host loop entirely.

Training of the K source-adapted pipelines stays embarrassingly parallel
(heterogeneous source shapes compile to different programs); see
`cli/multi_source.py` for the orchestration.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig, VotingConfig
from ..evaluation.metrics import normalize_model_weights, per_class_precision_weights
from ..evaluation.voting import entropy_precision_vote
from ..train.classifier import OSCNNClassifier
from .mesh import domain_sharding


class MultiSourceEnsemble:
    """K target-shaped (extractor, classifier) models + weighted voting."""

    def __init__(
        self,
        in_channels: int,
        time_length: int,
        num_class: int,
        config: Optional[PipelineConfig] = None,
        voting: Optional[VotingConfig] = None,
        mesh=None,
    ):
        # Member model definition = the target classification stack
        # (reference multi_source_voting.py:240-263 rebuilds exactly this).
        self.model_def = OSCNNClassifier(
            in_channels, time_length, num_class, config=config, with_cpc=False
        )
        self.num_class = num_class
        self.voting = voting or VotingConfig()
        self.mesh = mesh

    # ------------------------------------------------------------- stack --

    def stack(self, members: List[Dict]):
        """Stack member {'params','mstate'} pytrees along a model axis.

        With a mesh, the stacked axis is sharded over "domain".
        """
        stacked = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves), *members
        )
        if self.mesh is not None:
            stacked = jax.device_put(stacked, domain_sharding(self.mesh))
        return stacked

    # ----------------------------------------------------------- forward --

    def member_logits(self, stacked: Dict, x: jax.Array) -> jax.Array:
        """(M, N, C) logits, one row per model (shared input batch)."""

        def one(member):
            return self.model_def.predict_logits(member["params"], member["mstate"], x)

        return jax.vmap(one)(stacked)

    # ----------------------------------------------------------- weights --

    def compute_class_weights(self, stacked: Dict, x_train, y_train) -> jax.Array:
        """Per-model per-class precision on the TARGET TRAIN split, normalized
        across models (reference :281-367)."""
        logits = self.member_logits(stacked, jnp.asarray(x_train))
        preds = jnp.argmax(logits, axis=-1)  # (M, N)
        weights = jax.vmap(
            lambda p: per_class_precision_weights(p, jnp.asarray(y_train), self.num_class)
        )(preds)
        return normalize_model_weights(weights)

    # ------------------------------------------------------------- vote ---

    def predict(self, stacked: Dict, x_test, class_weights: jax.Array) -> np.ndarray:
        logits = self.member_logits(stacked, jnp.asarray(x_test))
        return np.asarray(entropy_precision_vote(logits, class_weights, self.voting))

    def evaluate(self, stacked: Dict, train_ds, test_ds) -> Dict:
        """Full ensemble evaluation: weights from train split, vote on test.

        Reports all three vote rules the reference tree contains: the active
        entropy+precision vote (multi_source_voting.py:405-429), the
        commented entropy-only variant (:118-227) and the per-predicted-label
        variant (visualization.py:231-440)."""
        from ..evaluation.voting import entropy_only_vote, predicted_label_vote

        weights = self.compute_class_weights(stacked, train_ds.x, train_ds.y)
        pred = self.predict(stacked, test_ds.x, weights)
        member_logits = self.member_logits(stacked, jnp.asarray(test_ds.x))
        member_accs = [
            float(np.mean(np.asarray(jnp.argmax(l, -1)) == test_ds.y))
            for l in member_logits
        ]
        y = test_ds.y
        variants = {
            "entropy_precision": float(np.mean(pred == y)),
            "entropy_only": float(
                np.mean(np.asarray(entropy_only_vote(member_logits)) == y)
            ),
            "predicted_label": float(
                np.mean(np.asarray(predicted_label_vote(member_logits, weights)) == y)
            ),
        }
        return {
            "ensemble_acc": variants["entropy_precision"],
            "vote_variants": variants,
            "member_accs": member_accs,
            "class_weights": np.asarray(weights),
            "predictions": pred,
        }
