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
SHAPES = [  # (C, T, n_class) x 24.  All T >= 356 so the receptive field
    # saturates at max_kernel_size=89 — the bucket key's rf component is
    # then CONSTANT within a channel count and each C group shares one
    # architecture: the docstring's "every univariate dataset with T >= 356
    # under one T pad" case, plus two multivariate groups to exercise
    # multiple buckets.  (For T < 356 each distinct T//4 is its own
    # architecture, so bucketing cannot help there by design.)
    (1, 360, 2), (1, 365, 3), (1, 370, 2), (1, 375, 4), (1, 380, 2),
    (1, 390, 3), (1, 395, 2), (1, 400, 4), (1, 405, 2), (1, 410, 3),
    (1, 415, 2), (1, 420, 4), (1, 425, 2), (1, 430, 3), (1, 435, 2),
    (1, 440, 4), (1, 445, 2), (1, 450, 3), (1, 455, 2), (1, 460, 4),
    (2, 370, 2), (2, 420, 3),
    (3, 380, 2), (3, 440, 4),
]


def gen():
    shutil.rmtree(ROOT, ignore_errors=True)
    for i, (c, t, ncls) in enumerate(SHAPES):
        name = f"Syn{i:02d}T{t}C{ncls}" + (f"D{c}" if c > 1 else "")
        x, y = make_arrays(16, c, t, ncls, seed=i)
        write_ts_file(os.path.join(ROOT, name, f"{name}_TRAIN.ts"), x, y)
        x, y = make_arrays(10, c, t, ncls, seed=100 + i)
        write_ts_file(os.path.join(ROOT, name, f"{name}_TEST.ts"), x, y)


def count_program_sets():
    """Instrument classifier construction: each instance compiles exactly one
    set of jitted programs per shape (static self in the jit key), so the
    instance count IS the compile-set count."""
    import feature_level_style_transfer_for_tsc_tpu.cli.archive_sweep as sweep_mod
    import feature_level_style_transfer_for_tsc_tpu.train.bucketed as bmod

    counter = {"n": 0}
    for holder, attr in ((sweep_mod, "OSCNNClassifier"),
                         (bmod, "BucketedOSCNNClassifier")):
        orig = getattr(holder, attr)

        def make(orig):
            class Counted(orig):
                def __init__(self, *a, **k):
                    counter["n"] += 1
                    super().__init__(*a, **k)

            return Counted

        setattr(holder, attr, make(orig))
    return counter


def run(bucket: bool, counter):
    out = f"/tmp/bucketed_sweep_{'b' if bucket else 'p'}.json"
    args = ["--root", ROOT, "--epochs", str(EPOCHS), "--out", out]  # full reference budgets
    if bucket:
        args.append("--bucket")
    counter["n"] = 0
    t0 = time.perf_counter()
    sweep_main(args)
    wall = time.perf_counter() - t0
    return wall, json.load(open(out)), counter["n"]


def main():
    gen()
    counter = count_program_sets()
    n_buckets = len({bucket_key(c, t, ncls, 89) for c, t, ncls in SHAPES})
    wall_b, res_b, compiles_b = run(True, counter)
    wall_p, res_p, compiles_p = run(False, counter)
    accs_p = {k: v["test_acc"] for k, v in res_p.items()}
    accs_b = {k: v["test_acc"] for k, v in res_b.items()}
    row = {
        "n_datasets": len(SHAPES),
        "n_buckets": n_buckets,
        "program_sets_compiled_bucketed": compiles_b,   # == n_buckets
        "program_sets_compiled_per_dataset": compiles_p,  # == n_datasets
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
