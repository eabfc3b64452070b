"""Measure compile-amortization of the bucketed archive sweep.

Generates 20 synthetic univariate datasets with varied (T, n_class), then
runs the OS-CNN archive sweep twice on the SAME datasets:
  * per-dataset mode: one jit compile per dataset (20 programs), and
  * --bucket mode: datasets padded into (C, rf, T_bucket, class_bucket)
    buckets sharing ONE compiled program per bucket.
Records wall time, program counts, and accuracy deltas (padding is exact —
masked BN/pool/logits — so accuracies should match up to trajectory noise).

Usage: python experiments/bucketed_sweep_bench.py
Writes results_bucketed_sweep.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from feature_level_style_transfer_for_tsc_tpu.data.synthetic import make_arrays, write_ts_file
from feature_level_style_transfer_for_tsc_tpu.cli.archive_sweep import main as sweep_main
from feature_level_style_transfer_for_tsc_tpu.train.bucketed import bucket_key

ROOT = "/tmp/bucketed_sweep_arch"
EPOCHS = 5
SHAPES = [  # (T, n_class) x 20, C=1 throughout.  All T >= 356 so the
    # receptive field saturates at max_kernel_size=89 — the bucket key's rf
    # component is then CONSTANT and every dataset shares the architecture:
    # the docstring's "every univariate dataset with T >= 356 under one T
    # pad" case.  (For T < 356 each distinct T//4 is its own architecture,
    # so bucketing cannot help there by design.)
    (360, 2), (365, 3), (370, 2), (375, 4), (380, 2),
    (390, 3), (395, 2), (400, 4), (405, 2), (410, 3),
    (415, 2), (420, 4), (425, 2), (430, 3), (435, 2),
    (440, 4), (445, 2), (450, 3), (455, 2), (460, 4),
]


def gen():
    shutil.rmtree(ROOT, ignore_errors=True)
    for i, (t, ncls) in enumerate(SHAPES):
        name = f"Syn{i:02d}T{t}C{ncls}"
        x, y = make_arrays(16, 1, t, ncls, seed=i)
        write_ts_file(os.path.join(ROOT, name, f"{name}_TRAIN.ts"), x, y)
        x, y = make_arrays(10, 1, t, ncls, seed=100 + i)
        write_ts_file(os.path.join(ROOT, name, f"{name}_TEST.ts"), x, y)


def run(bucket: bool):
    out = f"/tmp/bucketed_sweep_{'b' if bucket else 'p'}.json"
    args = ["--root", ROOT, "--epochs", str(EPOCHS), "--out", out]  # full reference budgets
    if bucket:
        args.append("--bucket")
    t0 = time.perf_counter()
    sweep_main(args)
    wall = time.perf_counter() - t0
    return wall, json.load(open(out))


def main():
    gen()
    n_buckets = len({bucket_key(1, t, c, 89) for t, c in SHAPES})
    wall_b, res_b = run(True)
    wall_p, res_p = run(False)
    accs_p = {k: v["test_acc"] for k, v in res_p.items()}
    accs_b = {k: v["test_acc"] for k, v in res_b.items()}
    row = {
        "n_datasets": len(SHAPES),
        "n_buckets": n_buckets,
        "wall_s_per_dataset_mode": round(wall_p, 1),
        "wall_s_bucketed_mode": round(wall_b, 1),
        "speedup": round(wall_p / wall_b, 2),
        "mean_acc_per_dataset": round(float(np.mean(list(accs_p.values()))), 4),
        "mean_acc_bucketed": round(float(np.mean(list(accs_b.values()))), 4),
    }
    print(row)
    with open(os.path.join(HERE, "results_bucketed_sweep.json"), "w") as f:
        json.dump(row, f, indent=2)


if __name__ == "__main__":
    main()
