"""BASELINE config-5 anchors: CoDATS and SLARDA on synthetic UEA-style data.

Runs both comparison baselines at reduced epoch counts (flagged) on
multivariate synthetic domains and records target test accuracy and
training throughput.  The matching torch-side
anchors come from experiments/reference_baselines_anchor.py, which drives
the reference's own modules through its Comparison loops on the SAME
synthetic domains, epochs and discriminator sizes.

Usage: python experiments/baselines_anchor.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature_level_style_transfer_for_tsc_tpu.baselines import CoDATSPipeline, SLARDAPipeline
from feature_level_style_transfer_for_tsc_tpu.config import PipelineConfig
from feature_level_style_transfer_for_tsc_tpu.data.dataset import TsClassificationData
from feature_level_style_transfer_for_tsc_tpu.data.synthetic import make_arrays

T, NCLS = 96, 3


def ds(n, c, seed, noise, d=None, is_train=True):
    x, y = make_arrays(n, c, T, NCLS, seed=seed, noise=noise)
    return TsClassificationData(label_dict=d if d is not None else {}, is_train=is_train, arrays=(x, y))


def main():
    cfg = PipelineConfig(batch_size=30)  # Comparison scripts use bs=30
    out = {}

    # --- CoDATS: multivariate target + 2 sources ---
    td = {}
    t_train = ds(90, 2, 30, 1.5, td)
    t_test = ds(120, 2, 31, 1.5, td, is_train=False)
    s1 = ds(120, 1, 40, 0.8)
    s2 = ds(120, 3, 50, 1.0)
    # discriminator sized exactly like the reference's
    # Discriminator_ATT(T, 128, 8, 8, 64[, K+1]) so the measured comparison
    # vs experiments/reference_baselines_anchor.py is apples-to-apples
    codats = CoDATSPipeline(
        (2, T, NCLS), [(1, T, NCLS), (3, T, NCLS)], config=cfg,
        disc_hid=128, disc_depth=8, disc_heads=8, disc_mlp=64,
    )
    epochs = 60
    t0 = time.perf_counter()
    _, hist = codats.fit(t_train, t_test, [s1, s2], epochs=epochs, verbose=False)
    wall = time.perf_counter() - t0
    out["codats"] = {
        "final_test_acc": hist[-1]["test_acc"],
        "best_test_acc": max(h["test_acc"] for h in hist),
        "epochs": epochs,
        "series_per_sec_train": (90 + 2 * 120) * epochs / wall,
    }
    print("codats:", out["codats"])

    # --- SLARDA: multivariate pair ---
    td2 = {}
    t_train2 = ds(90, 2, 60, 1.5, td2)
    t_test2 = ds(120, 2, 61, 1.5, td2, is_train=False)
    s_train2 = ds(150, 3, 70, 0.8)
    slarda = SLARDAPipeline(
        (2, T, NCLS), (3, T, NCLS), config=cfg,
        disc_hid=128, disc_depth=8, disc_heads=8, disc_mlp=64,
    )
    t0 = time.perf_counter()
    _, hist = slarda.fit(
        t_train2, t_test2, s_train2, source_epochs=30, target_epochs=60, verbose=False
    )
    wall = time.perf_counter() - t0
    tgt = [h for h in hist if h["phase"] == "target"]
    out["slarda"] = {
        "final_test_acc": tgt[-1]["test_acc"],
        "best_test_acc": max(h["test_acc"] for h in tgt),
        "source_epochs": 30,
        "target_epochs": 60,
        "series_per_sec_train": (90 + 150) * 60 / wall,
    }
    print("slarda:", out["slarda"])

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results_baselines.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
