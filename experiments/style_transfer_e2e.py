"""End-to-end efficacy experiment: does the full style-transfer pipeline
help a label-scarce target domain?

Setup: a target domain with very few training samples and a related source
domain (same class structure, shifted channel scaling/extra noise) with
plenty.  Compare:

  (a) target-only OS-CNN classifier (reference-style supervised baseline)
  (b) the full five-phase style-transfer pipeline (shortened curriculum)

Reports both test accuracies.  Shortened phase lengths keep the run in
minutes on one chip; pass --full for the reference curriculum lengths.

Usage: python experiments/style_transfer_e2e.py [--full]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature_level_style_transfer_for_tsc_tpu.config import PipelineConfig
from feature_level_style_transfer_for_tsc_tpu.data.dataset import TsClassificationData
from feature_level_style_transfer_for_tsc_tpu.data.synthetic import make_arrays
from feature_level_style_transfer_for_tsc_tpu.train.classifier import OSCNNClassifier
from feature_level_style_transfer_for_tsc_tpu.train.pipeline import StyleTransferPipeline

T, NCLS = 96, 3
N_TARGET_TRAIN = 24  # label-scarce target
N_SOURCE_TRAIN = 200
N_TEST = 150


def make_domain(n, seed, noise, channels=1):
    x, y = make_arrays(n, channels, T, NCLS, seed=seed, noise=noise)
    return x, y


def as_ds(x, y, d, is_train):
    return TsClassificationData(label_dict=d, is_train=is_train, arrays=(x, y))


def main():
    full = "--full" in sys.argv
    td, sd = {}, {}
    # target: noisy, few labels; source: cleaner, many labels, same classes
    t_train = as_ds(*make_domain(N_TARGET_TRAIN, 20, noise=2.0), td, True)
    t_test = as_ds(*make_domain(N_TEST, 21, noise=2.0), td, False)
    s_train = as_ds(*make_domain(N_SOURCE_TRAIN, 22, noise=0.8), sd, True)
    s_test = as_ds(*make_domain(N_TEST, 23, noise=0.8), sd, False)

    cfg = PipelineConfig(batch_size=12)

    # (a) target-only classifier baseline
    clf = OSCNNClassifier(1, T, NCLS, config=cfg, with_cpc=True)
    state_a, _ = clf.fit(t_train, None, epochs=60, verbose=False)
    acc_a = clf.evaluate(state_a, t_test.x, t_test.y)

    # (b) full style-transfer pipeline
    pipe = StyleTransferPipeline(1, T, NCLS, 1, T, NCLS, cfg)
    epochs = (
        None
        if full
        else {"p1": 3, "p2": 20, "p3": 20, "p4": 40, "p5": 40}
    )
    state_b, history = pipe.run(
        t_train, t_test, s_train, s_test, epochs=epochs, verbose=False
    )
    acc_b = pipe.evaluate_target(state_b, t_test.x, t_test.y)
    evals = [h for h in history if h["phase"] == "p5_eval"]
    best_b = max(h["target_test_acc"] for h in evals) if evals else acc_b

    out = {
        "target_only_test_acc": acc_a,
        "style_transfer_final_test_acc": acc_b,
        "style_transfer_best_test_acc": best_b,
        "source_test_acc": pipe.evaluate_source(state_b, s_test.x, s_test.y),
        "config": {
            "n_target_train": N_TARGET_TRAIN,
            "n_source_train": N_SOURCE_TRAIN,
            "epochs": epochs or "reference-full",
        },
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results_e2e.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
