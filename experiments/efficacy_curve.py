"""Style-transfer efficacy CURVE: >=3 domain pairs x 2 label-scarcity levels
(VERDICT r2 #6 — one pair/one scarcity was a smoke test, not a curve).

For each (pair, scarcity): train (a) a target-only OS-CNN classifier with
the same epoch budget and (b) the full five-phase style-transfer pipeline
(shortened curriculum), and report both test accuracies + the lift.  The
method claim being tested is the reference's purpose — a labeled source
domain pushed through the shared flow + NoiseTransfer should lift a
label-scarce target (train_and_test.py:552-561).

Pairs (target <- source), all synthetic-UCR-shaped:
  gp   : GunPoint-like     univariate T=150, 4 cls  <- univariate T=150
  multi: multivariate C=3  T=96,      3 cls  <- univariate T=128
  mainpy: SelfRegulationSCP2-like C=2 T=1152, 2 cls <- EthanolLevel-like
          univariate T=1751, 4 cls (the reference main.py's own shapes)

Usage: python experiments/efficacy_curve.py [pair ...]
Writes/merges experiments/results_efficacy_curve.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from feature_level_style_transfer_for_tsc_tpu.config import PipelineConfig
from feature_level_style_transfer_for_tsc_tpu.data.dataset import TsClassificationData
from feature_level_style_transfer_for_tsc_tpu.data.synthetic import make_arrays
from feature_level_style_transfer_for_tsc_tpu.train.classifier import OSCNNClassifier
from feature_level_style_transfer_for_tsc_tpu.train.pipeline import StyleTransferPipeline

RESULTS = os.path.join(HERE, "results_efficacy_curve.json")

# name -> (C_t, T_t, n_cls_t, noise_t, C_s, T_s, n_cls_s, noise_s)
PAIRS = {
    "gp": (1, 150, 4, 2.5, 1, 150, 4, 1.2),
    "multi": (3, 96, 3, 2.0, 1, 128, 3, 0.8),
    "mainpy": (2, 1152, 2, 2.0, 1, 1751, 4, 0.8),
}
SCARCITY = {"scarce16": 16, "scarce32": 32}
N_SOURCE_TRAIN, N_TEST = 160, 120
EPOCHS = {"p1": 3, "p2": 20, "p3": 24, "p4": 40, "p5": 40}


def as_ds(x, y, d, is_train):
    return TsClassificationData(label_dict=d, is_train=is_train, arrays=(x, y))


def run_cell(pair_name, n_target, seed=0):
    c_t, t_t, n_t, noise_t, c_s, t_s, n_s, noise_s = PAIRS[pair_name]
    td, sd = {}, {}
    t_train = as_ds(*make_arrays(n_target, c_t, t_t, n_t, seed=seed + 20, noise=noise_t), td, True)
    t_test = as_ds(*make_arrays(N_TEST, c_t, t_t, n_t, seed=seed + 21, noise=noise_t), td, False)
    s_train = as_ds(*make_arrays(N_SOURCE_TRAIN, c_s, t_s, n_s, seed=seed + 22, noise=noise_s), sd, True)
    s_test = as_ds(*make_arrays(N_TEST, c_s, t_s, n_s, seed=seed + 23, noise=noise_s), sd, False)

    cfg = PipelineConfig(batch_size=8, seed=seed)

    # (a) target-only baseline, same total epoch budget as the pipeline
    clf = OSCNNClassifier(c_t, t_t, n_t, config=cfg, with_cpc=True)
    _, hist = clf.fit(t_train, t_test, epochs=sum(EPOCHS.values()), verbose=False)
    accs_a = [h["test_acc"] for h in hist if "test_acc" in h]

    # (b) full style-transfer pipeline
    t0 = time.perf_counter()
    pipe = StyleTransferPipeline(c_t, t_t, n_t, c_s, t_s, n_s, cfg)
    state_b, history = pipe.run(
        t_train, t_test, s_train, s_test, epochs=EPOCHS, verbose=False,
        pretrain_eval_every=0,
    )
    wall = time.perf_counter() - t0
    evals = [h["target_test_acc"] for h in history if h["phase"] == "p5_eval"]
    return {
        "pair": pair_name,
        "n_target_train": n_target,
        "target_only_final": accs_a[-1],
        "target_only_best": max(accs_a),
        "style_final": evals[-1],
        "style_best": max(evals),
        "lift_best": round(max(evals) - max(accs_a), 4),
        "pipeline_wall_s": round(wall, 1),
    }


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or list(PAIRS)
    data = {}
    if os.path.exists(RESULTS):
        data = json.load(open(RESULTS))
    for pair in names:
        for scar, n_target in SCARCITY.items():
            key = f"{pair}_{scar}"
            row = run_cell(pair, n_target)
            data[key] = row
            print(key, row, flush=True)
            with open(RESULTS, "w") as f:
                json.dump(data, f, indent=2)
    lifts = [
        r["lift_best"]
        for k, r in data.items()
        if isinstance(r, dict) and "lift_best" in r
    ]
    data["_summary"] = {
        "n_cells": len(lifts),
        "mean_lift_best": round(float(np.mean(lifts)), 4),
        "cells_with_positive_lift": int(np.sum(np.asarray(lifts) > 0)),
    }
    with open(RESULTS, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps(data["_summary"], indent=2))


if __name__ == "__main__":
    main()
