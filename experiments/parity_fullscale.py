"""FULL-LENGTH accuracy parity: our 5-phase pipeline vs the reference's own
`train()` at the reference's complete curriculum (3/70/325/600/720).

The reference side imports and calls `/root/reference/train_and_test.py`'s
`train()` VERBATIM (with_nvidia=False) on duck-typed synthetic datasets —
every phase, scheduler, GradNorm update and eval exactly as shipped.  Two
behavior-preserving patches keep a CPU run feasible (accuracy unchanged):

  * `torch.autograd.set_detect_anomaly` -> no-op (the reference wraps all
    of training in anomaly mode, train_and_test.py:24 — a debug device that
    multiplies CPU wall time);
  * checkpoint tars + feature .npy dumps -> no-ops (disk only; accuracies
    come from the reference's own `numpy_saved_with_accuracy/the_log.txt`,
    written by utils.eval_model_testdata every 2 phase-5 epochs).

Ours runs `StyleTransferPipeline.run` at the identical curriculum on the
same data.  Both sides see the SAME arrays and the same integer labels.

Usage:
  python experiments/parity_fullscale.py ours [seed ...]      # TPU, minutes
  python experiments/parity_fullscale.py ours_vmap [seed ...] # TPU, ALL seeds
                                         # as ONE vmapped program (multirun)
  python experiments/parity_fullscale.py reference [seed ...] # CPU, hours
Each invocation merges its rows into results_parity_fullscale.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from feature_level_style_transfer_for_tsc_tpu.data.synthetic import make_arrays

# GunPoint-scale pair, hard enough not to saturate (cf. parity_accuracy.py)
N_TRAIN, N_TEST = 20, 60
T_T, C_T, N_CLS_T = 150, 1, 4
T_S, C_S, N_CLS_S = 150, 1, 4
NOISE_T, NOISE_S = 2.5, 1.5
_TAG = os.environ.get("FLSTTSC_PARITY_TAG", "")
RESULTS = os.path.join(
    HERE, f"results_parity_fullscale{'_' + _TAG if _TAG else ''}.json"
)
EPOCHS = {"p1": 3, "p2": 70, "p3": 325, "p4": 600, "p5": 720}  # reference defaults


def get_pair(seed):
    """(x, y_int) for target/source train+test, identical for both sides."""
    out = {}
    for name, (n, c, t, ncls, noise, s) in {
        "t_train": (N_TRAIN, C_T, T_T, N_CLS_T, NOISE_T, 100 + seed),
        "t_test": (N_TEST, C_T, T_T, N_CLS_T, NOISE_T, 200 + seed),
        "s_train": (N_TRAIN, C_S, T_S, N_CLS_S, NOISE_S, 300 + seed),
        "s_test": (N_TEST, C_S, T_S, N_CLS_S, NOISE_S, 400 + seed),
    }.items():
        x, y_str = make_arrays(n, c, t, ncls, seed=s, noise=noise)
        labels = sorted(set(y_str))
        out[name] = (x, np.asarray([labels.index(v) for v in y_str], np.int64))
    return out


def _merge(row_key, row):
    data = {}
    if os.path.exists(RESULTS):
        data = json.load(open(RESULTS))
    data[row_key] = row
    with open(RESULTS, "w") as f:
        json.dump(data, f, indent=2)
    print(row_key, row, flush=True)


# ---------------------------------------------------------------------------
# reference side
# ---------------------------------------------------------------------------

def run_reference(seed, scratch_name=None):
    import types

    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if not hasattr(torch, "qr"):
        torch.qr = lambda a: torch.linalg.qr(a)
    if not hasattr(np, "float"):
        np.float = float
    if "sktime" not in sys.modules:
        sk = types.ModuleType("sktime")
        skd = types.ModuleType("sktime.datasets")
        skd.load_from_tsfile = lambda *a, **k: (_ for _ in ()).throw(RuntimeError)
        sk.datasets = skd
        sys.modules["sktime"] = sk
        sys.modules["sktime.datasets"] = skd
    sys.path.insert(0, "/root/reference")

    # scratch cwd: train() writes logs/checkpoints with relative paths
    scratch = os.path.join(HERE, scratch_name or f"_ref_fullscale_seed{seed}")
    for sub in ("train_log", "numpy_saved_with_accuracy/feature_of_target_s2t",
                "numpy_saved_with_accuracy/feature_of_source_t2s"):
        os.makedirs(os.path.join(scratch, sub), exist_ok=True)
    cwd = os.getcwd()
    os.chdir(scratch)
    try:
        import contextlib

        # wall time only (reference wraps ALL of training in anomaly mode);
        # must return a context manager — train_and_test.py:24 uses `with`
        torch.autograd.set_detect_anomaly = (
            lambda *a, **k: contextlib.nullcontext()
        )
        # the reference's CPU print branch indexes scalar losses with [0]
        # (train_and_test.py:634-639 — its own :632 comment admits the GPU
        # branch can't; the CPU path was never run).  Make 0-dim .numpy()
        # results 1-element arrays so those prints work; >=1-dim results
        # (GradNorm ratios, feature dumps) are untouched.
        _orig_numpy = torch.Tensor.numpy

        def _numpy_atleast_1d(self, *a, **k):
            out = _orig_numpy(self, *a, **k)
            return np.atleast_1d(out) if out.ndim == 0 else out

        torch.Tensor.numpy = _numpy_atleast_1d
        import train_and_test as tt

        tt.save_target_classification_modules = lambda *a, **k: None
        tt.save_source_classification_modules = lambda *a, **k: None
        _np_save = np.save
        np.save = lambda *a, **k: None  # feature dumps, disk only

        class DuckData(torch.utils.data.Dataset):
            def __init__(self, x, y):
                self.x = torch.from_numpy(x).float()
                self.y = torch.from_numpy(y).long()
                self.len = x.shape[0]
                self.in_channel = x.shape[1]
                self.time_length = x.shape[2]
                self.num_class = int(y.max()) + 1

            def __len__(self):
                return self.len

            def __getitem__(self, i):
                return self.x[i], self.y[i]

        pair = get_pair(seed)
        torch.manual_seed(seed)
        import time as _time

        t0 = _time.perf_counter()
        # stdout is enormous (per-batch prints); send it to a file
        import contextlib

        with open("stdout.log", "w") as out, contextlib.redirect_stdout(out):
            tt.train(
                DuckData(*pair["t_train"]), DuckData(*pair["t_test"]),
                DuckData(*pair["s_train"]), DuckData(*pair["s_test"]),
                False, epoch_num=EPOCHS["p5"],
            )
        wall = _time.perf_counter() - t0
        np.save = _np_save

        accs = []
        with open("numpy_saved_with_accuracy/the_log.txt") as f:
            for line in f:
                if "accuracy_for_test:" in line and "source" not in line:
                    accs.append(float(line.strip().split("accuracy_for_test:")[1]))
        row = {
            "final_test_acc": accs[-1],
            "best_test_acc": max(accs),
            "last10_mean": float(np.mean(accs[-10:])),
            "n_evals": len(accs),
            "wall_s": round(wall, 1),
            "epochs": EPOCHS,
        }
    finally:
        os.chdir(cwd)
    _merge(f"reference_seed{seed}", row)


# ---------------------------------------------------------------------------
# ours
# ---------------------------------------------------------------------------

def run_ours(seed, frozen_gradnorm=False):
    """frozen_gradnorm=True freezes the GradNorm loss weights at their init
    values ([2,5]/[2,2,4]) via lr=0 — the dynamics the reference's own
    full-length run EFFECTIVELY has: its NaN logdet (det(W)<0 under
    torch.logdet) poisons the numpy-side weight-update math so its weights
    never move, while torch autograd keeps all module grads finite (logdet's
    derivative W^-T doesn't use the NaN forward value).  This row is the
    apples-to-apples comparison against the measured reference run."""
    import dataclasses
    import time as _time

    from feature_level_style_transfer_for_tsc_tpu.config import (
        GradNormConfig,
        PipelineConfig,
    )
    from feature_level_style_transfer_for_tsc_tpu.data.dataset import TsClassificationData
    from feature_level_style_transfer_for_tsc_tpu.train.pipeline import StyleTransferPipeline

    pair = get_pair(seed)

    def ds(name, d, is_train):
        x, y = pair[name]
        labels = np.asarray([f"c{v}" for v in y])
        return TsClassificationData(label_dict=d, is_train=is_train, arrays=(x, labels))

    # pre-seed the insertion-order dicts so label ints match the raw ints the
    # reference's DuckData consumes directly (same mapping on both sides)
    td = {f"c{i}": i for i in range(N_CLS_T)}
    sd = {f"c{i}": i for i in range(N_CLS_S)}
    t_train = ds("t_train", td, True)
    t_test = ds("t_test", td, False)
    s_train = ds("s_train", sd, True)
    s_test = ds("s_test", sd, False)
    # label parity check: c0..c3 sorted == insertion-consistent int mapping
    assert list(t_train.y[:5]) == list(pair["t_train"][1][:5])

    cfg = PipelineConfig(seed=seed)
    if frozen_gradnorm:
        cfg = dataclasses.replace(
            cfg, gradnorm=GradNormConfig(lr_weights_t=0.0, lr_weights_s=0.0)
        )
    pipe = StyleTransferPipeline(C_T, T_T, N_CLS_T, C_S, T_S, N_CLS_S, cfg)
    accs = []
    t0 = _time.perf_counter()
    state, history = pipe.run(
        t_train, t_test, s_train, s_test, epochs=EPOCHS, verbose=False,
        pretrain_eval_every=0, log_every=50,
        eval_hook=lambda e, st, a: accs.append(a["target_test_acc"]),
    )
    wall = _time.perf_counter() - t0
    row = {
        "final_test_acc": accs[-1],
        "best_test_acc": max(accs),
        "last10_mean": float(np.mean(accs[-10:])),
        "n_evals": len(accs),
        "wall_s": round(wall, 1),
        "epochs": EPOCHS,
    }
    _merge(f"ours{'_frozen_gn' if frozen_gradnorm else ''}_seed{seed}", row)


def run_ours_vmapped(seeds):
    """ALL seeds' full curricula as ONE vmapped program (train/multirun.py —
    the chip-filling path, VERDICT r2 #1).  Each seed sees the same data and
    key discipline as `run_ours`, so rows are comparable; also merges an
    aggregate row with the K-run wall clock.

    Seeds may be ``data:init`` pairs (see `main`) — several init seeds on
    the SAME data pair sample ours' per-pair accuracy distribution, which
    is what a paired comparison against `reference_seed{data}` needs."""
    import time as _time

    from feature_level_style_transfer_for_tsc_tpu.config import PipelineConfig
    from feature_level_style_transfer_for_tsc_tpu.train.multirun import (
        MultiRunData,
        MultiRunStylePipeline,
    )
    from feature_level_style_transfer_for_tsc_tpu.train.pipeline import (
        StyleTransferPipeline,
    )

    # get_pair is channel-first (N, C, T) like the reference loader; the
    # pipeline (and MultiRunData) are channel-last (N, T, C)
    pairs = [
        {
            k: (np.transpose(v[0], (0, 2, 1)), v[1])
            for k, v in get_pair(ds).items()
        }
        for ds, _ in seeds
    ]
    data = MultiRunData.from_pairs(pairs)
    pipe = StyleTransferPipeline(C_T, T_T, N_CLS_T, C_S, T_S, N_CLS_S, PipelineConfig())
    mpipe = MultiRunStylePipeline(pipe)
    accs = []
    t0 = _time.perf_counter()
    states, history = mpipe.run(
        data, [init for _, init in seeds], epochs=EPOCHS,
        eval_hook=lambda e, st, a: accs.append(np.asarray(a["target_test_acc"])),
    )
    wall = _time.perf_counter() - t0
    accs = np.stack(accs)  # [n_evals, K]
    for i, (ds, init) in enumerate(seeds):
        name = f"ours_vmap_seed{ds}" if ds == init else f"ours_vmap_d{ds}_i{init}"
        _merge(name, {
            "final_test_acc": float(accs[-1, i]),
            "best_test_acc": float(accs[:, i].max()),
            "last10_mean": float(accs[-10:, i].mean()),
            "n_evals": int(accs.shape[0]),
            "wall_s": round(wall, 1),  # shared: ONE program ran all K runs
            "epochs": EPOCHS,
        })
    _merge("ours_vmap_aggregate", {
        "n_runs": len(seeds),
        "wall_s_total": round(wall, 1),
        "wall_s_per_run": round(wall / len(seeds), 1),
        "final_test_acc_mean": float(accs[-1].mean()),
        "final_test_acc_std": float(accs[-1].std()),
        "epochs": EPOCHS,
    })


def main():
    side = sys.argv[1]
    # each seed arg is either N (data seed == init seed) or DATA:INIT —
    # the latter runs a fresh init on an existing pair for paired stats
    raw = sys.argv[2:] or ["0"]
    seeds = [
        tuple(int(p) for p in s.split(":")) if ":" in s else (int(s), int(s))
        for s in raw
    ]
    if side == "ours_vmap":
        run_ours_vmapped(seeds)
        return
    for ds, init in seeds:
        if side == "reference":
            assert ds == init, "reference side takes plain seeds"
            run_reference(ds)
        elif side == "ours_frozen_gn":
            assert ds == init
            run_ours(ds, frozen_gradnorm=True)
        else:
            assert ds == init, "use ours_vmap for data:init pairs"
            run_ours(ds)


if __name__ == "__main__":
    main()
