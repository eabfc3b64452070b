"""Archive-scale compile-hygiene sweep for the bucketed trainer (VERDICT r4
item 8: prove the bucketing claim at 100+ datasets, not 24).

Two arms over a synthetic archive whose (T, n_class, N) marginals mirror
the real UCR univariate archive (the reference's sweep substrate,
/root/reference/main.py:7-10 — the archive itself is not in this image):

  mixed — 112 datasets spanning the FULL UCR shape range, T in [24, 2048]
          log-uniform with the archive's ~55/45 split around T=356 (the
          point where receptive_field(T)=min(T//4,89) saturates at 89 and
          the builder's architecture stops depending on T).  Below 356
          every distinct T//4 is a distinct ARCHITECTURE — that is the
          reference's own design rule (train_and_test.py:42,
          OS_CNN_Structure_build.py:16-41), not a bucketing limitation —
          so this arm measures the honest compile count for a realistic
          archive and its sublinearity.
  long  — 100 datasets drawn from the saturated regime (T >= 356,
          n_class <= 4, the typical long-T UCR profile): ONE architecture,
          buckets differ only in padded shapes -> the <=~10-programs claim.

Reported per arm: datasets, buckets, jit cache sizes (train/sched/predict),
true XLA compile count (jax_log_compiles capture), total + per-bucket
compile-ish wall (first-dataset-in-bucket wall vs steady), per-dataset
train wall, and sanity accuracy (easy synthetic tasks, acc > chance).

Usage: python experiments/bucketed_sweep.py [mixed|long|all]  [--datasets N]
Writes/merges experiments/results_bucketed_sweep.json.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax  # noqa: E402

from feature_level_style_transfer_for_tsc_tpu.config import PipelineConfig  # noqa: E402
from feature_level_style_transfer_for_tsc_tpu.data.synthetic import make_dataset  # noqa: E402
from feature_level_style_transfer_for_tsc_tpu.train.bucketed import (  # noqa: E402
    BucketedOSCNNClassifier,
    bucket_key,
)

RESULTS = os.path.join(HERE, "results_bucketed_sweep.json")
EPOCHS = int(os.environ.get("BUCKETED_SWEEP_EPOCHS", "8"))
T_CAP = int(os.environ.get("BUCKETED_SWEEP_T_CAP", "2048"))


class _CompileCounter(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.n = 0

    def emit(self, record):
        if "Finished XLA compilation" in record.getMessage():
            self.n += 1


def sample_archive(arm: str, n_datasets: int, seed: int):
    """(T, n_class, N_train) triples mirroring the UCR univariate marginals.

    Real-archive anchors: T spans 15 (SmoothSubspace) to 2844 (Rock) with
    median ~420; ~45% of the 112 datasets sit below the rf-saturation point
    T=356; n_class is 2 for ~40%, 3-10 for ~45%, >10 for ~15%; N_train
    spans 16 to ~9k (capped here at 60 so the sweep measures COMPILE
    behavior, not gradient steps).
    """
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_datasets):
        if arm == "long":
            t = int(rng.integers(356, max(360, T_CAP)))
            n_class = int(rng.choice([2, 2, 3, 4]))
        else:
            if rng.random() < 0.45:
                t = int(np.exp(rng.uniform(np.log(24), np.log(min(356, T_CAP)))))
            else:
                t = int(np.exp(rng.uniform(np.log(356), np.log(max(360, T_CAP)))))
            u = rng.random()
            n_class = (
                2 if u < 0.40 else int(rng.integers(3, 11)) if u < 0.85
                else int(rng.integers(11, 25))
            )
        n_train = int(np.clip(np.exp(rng.uniform(np.log(16), np.log(400))), 16, 60))
        out.append((t, n_class, n_train))
    return out


def run_arm(arm: str, n_datasets: int):
    jax.clear_caches()  # per-arm accounting: caches survive across arms
    # full reference budgets: anything below ~1.0 collapses layer-1
    # out_channels to 0 at rf=89 (budget 8*128*C=1024 vs sum-primes 964,
    # structure.py) — and full budget is the honest compile-cost anchor.
    cfg = PipelineConfig()
    shapes = sample_archive(arm, n_datasets, seed=42)

    counter = _CompileCounter()
    jax.config.update("jax_log_compiles", True)
    logging.getLogger("jax").addHandler(counter)

    clfs: dict = {}
    rows = []
    t_arm = time.perf_counter()
    for i, (t, n_class, n_train) in enumerate(shapes):
        key = bucket_key(1, t, n_class, cfg.max_kernel_size)
        first_in_bucket = key not in clfs
        if first_in_bucket:
            clfs[key] = BucketedOSCNNClassifier(*key, config=cfg)
        clf = clfs[key]
        train = make_dataset(n_train, 1, t, n_class, seed=100 + i)
        test = make_dataset(max(16, n_train // 2), 1, t, n_class,
                            seed=200 + i, label_dict=train.label_dict,
                            is_train=False)
        t0 = time.perf_counter()
        state, _ = clf.fit(train, None, epochs=EPOCHS, verbose=False)
        acc = clf.evaluate(state, test.x, test.y, n_class)
        wall = time.perf_counter() - t0
        rows.append({
            "t": t, "n_class": n_class, "n_train": n_train,
            "bucket": str(key), "first_in_bucket": first_in_bucket,
            "wall_s": round(wall, 2), "test_acc": round(acc, 3),
        })
        if i % 10 == 0 or first_in_bucket:
            print(f"[{arm} {i + 1}/{n_datasets}] T={t} k={n_class} "
                  f"bucket={key} new={first_in_bucket} wall={wall:.1f}s "
                  f"acc={acc:.2f} compiles={counter.n}", flush=True)
    total_wall = time.perf_counter() - t_arm
    jax.config.update("jax_log_compiles", False)
    logging.getLogger("jax").removeHandler(counter)

    # the jitted methods are CLASS-level objects (one jit shared by every
    # instance, self as static arg) -> query each once, not per instance
    cache_sizes = {
        "train_batch": BucketedOSCNNClassifier.train_batch._cache_size(),
        "step_schedulers": BucketedOSCNNClassifier._step_schedulers._cache_size(),
        "predict_logits": BucketedOSCNNClassifier.predict_logits._cache_size(),
    }
    first_walls = [r["wall_s"] for r in rows if r["first_in_bucket"]]
    rest_walls = [r["wall_s"] for r in rows if not r["first_in_bucket"]]
    summary = {
        "datasets": n_datasets,
        "buckets": len(clfs),
        "epochs_per_dataset": EPOCHS,
        "jit_cache_sizes": cache_sizes,
        "train_programs": cache_sizes["train_batch"],
        "total_programs": sum(cache_sizes.values()),
        "xla_compiles_logged": counter.n,
        "total_wall_s": round(total_wall, 1),
        "compile_wall_s_first_in_bucket_sum": round(sum(first_walls), 1),
        "steady_wall_s_sum": round(sum(rest_walls), 1),
        "steady_wall_s_per_dataset_mean": round(
            float(np.mean(rest_walls)) if rest_walls else 0.0, 2
        ),
        "mean_test_acc": round(float(np.mean([r["test_acc"] for r in rows])), 3),
        "min_test_acc": round(float(min(r["test_acc"] for r in rows)), 3),
        "extrapolated_unbucketed_compile_wall_s": round(
            float(np.mean(first_walls)) * n_datasets, 1
        ),
        "rows": rows,
    }
    data = json.load(open(RESULTS)) if os.path.exists(RESULTS) else {}
    data[arm] = summary
    with open(RESULTS, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "rows"},
                     indent=2), flush=True)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    n = 112
    if "--datasets" in sys.argv:
        n = int(sys.argv[sys.argv.index("--datasets") + 1])
    if what in ("long", "all"):
        run_arm("long", 100 if n == 112 else n)
    if what in ("mixed", "all"):
        run_arm("mixed", n)
