"""Positive-control efficacy cell: style transfer vs target-only on a pair
with genuinely SHARED generative structure (VERDICT r3 item 1).

The round-3 controls were negative on every full-scale cell — but every cell
used `make_arrays` pairs whose class signature (a single frequency) is
trivially learnable from 20 target labels, leaving transfer nothing to add.
This experiment constructs the pair the method is FOR
(`data/synthetic.make_shared_domain_pair`): identical latent class templates
in both domains (shape-coded, not spectrum-coded), differing only in channel
mixing, sampling rate and noise; the target is label-scarce + noisy, the
source label-rich + clean.  Reference purpose being tested:
/root/reference/train_and_test.py:552-561 (the style-transfer dataflow).

Arms per (scarcity, seed) cell, all at the reference's FULL curriculum
(3/70/325/600/720 = 1,718 epochs):
  style       : the full 5-phase pipeline (ours, TPU)
  target_only : OSCNNClassifier(+CPC) on the target alone, same epoch budget
  reference   : the reference's own torch `train()` on the same arrays (CPU,
                hours — run only if `style` fails to lift, to attribute the
                failure to method vs data)

Usage:
  python experiments/positive_control.py style  [n_target:seed ...]
  python experiments/positive_control.py style_vmap [n_target:seed ...]  # all cells, ONE program
  python experiments/positive_control.py target_only [n_target:seed ...]
  python experiments/positive_control.py reference [n_target:seed ...]
  python experiments/positive_control.py summary
Defaults: n_target in {16, 32} x seeds {0, 1}.
Writes/merges experiments/results_positive_control.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)

from feature_level_style_transfer_for_tsc_tpu.data.synthetic import (  # noqa: E402
    make_shared_domain_pair,
)

RESULTS = os.path.join(HERE, "results_positive_control.json")
EPOCHS = {"p1": 3, "p2": 70, "p3": 325, "p4": 600, "p5": 720}
NUM_CLASS, C_T, T_T, C_S, T_S = 4, 2, 144, 1, 96
N_SOURCE, N_TEST = 240, 120


def get_pair(n_target, seed, noise=None):
    """noise=None -> the round-4 pair (noise_target=1.8).  A float hardens
    the target domain (VERDICT r4 item 4: probe the regime boundary where
    target-only drops to ~0.6-0.7 and transfer could plausibly pay)."""
    kw = {} if noise is None else {"noise_target": noise}
    return make_shared_domain_pair(
        n_target, N_SOURCE, N_TEST, num_class=NUM_CLASS,
        t_target=T_T, c_target=C_T, t_source=T_S, c_source=C_S,
        seed=seed, template_seed=seed, **kw,
    )


def cell_key(arm, n_target, seed, noise=None):
    base = f"{arm}_n{n_target}_s{seed}"
    return base if noise is None else f"{base}_x{noise:g}"


def _merge(key, row):
    data = json.load(open(RESULTS)) if os.path.exists(RESULTS) else {}
    data[key] = row
    with open(RESULTS, "w") as f:
        json.dump(data, f, indent=2)
    print(key, row, flush=True)


def _datasets(pair):
    from feature_level_style_transfer_for_tsc_tpu.data.dataset import (
        TsClassificationData,
    )

    td = {f"c{i}": i for i in range(NUM_CLASS)}
    sd = {f"c{i}": i for i in range(NUM_CLASS)}

    def ds(name, d, tr):
        x, y = pair[name]
        labels = np.asarray([f"c{v}" for v in y])
        return TsClassificationData(label_dict=d, is_train=tr, arrays=(x, labels))

    return (ds("t_train", td, True), ds("t_test", td, False),
            ds("s_train", sd, True), ds("s_test", sd, False))


def run_style(n_target, seed, noise=None):
    import time as _time

    from feature_level_style_transfer_for_tsc_tpu.config import PipelineConfig
    from feature_level_style_transfer_for_tsc_tpu.train.pipeline import (
        StyleTransferPipeline,
    )

    t_train, t_test, s_train, s_test = _datasets(get_pair(n_target, seed, noise))
    cfg = PipelineConfig(seed=seed)
    pipe = StyleTransferPipeline(C_T, T_T, NUM_CLASS, C_S, T_S, NUM_CLASS, cfg)
    accs = []
    t0 = _time.perf_counter()
    pipe.run(
        t_train, t_test, s_train, s_test, epochs=EPOCHS, verbose=False,
        pretrain_eval_every=0, log_every=100,
        eval_hook=lambda e, st, a: accs.append(a["target_test_acc"]),
    )
    _merge(cell_key("style", n_target, seed, noise), {
        "final_test_acc": accs[-1], "best_test_acc": max(accs),
        "last10_mean": float(np.mean(accs[-10:])), "n_evals": len(accs),
        "wall_s": round(_time.perf_counter() - t0, 1), "epochs": EPOCHS,
    })


def run_style_vmapped(cells):
    """ALL requested style cells as ONE vmapped program (train/multirun.py,
    same chip-filling path as parity_fullscale.run_ours_vmapped).  Cells must
    share n_target (shapes must match across the run axis); each run uses its
    cell's data pair and its seed as the init seed, so rows are comparable to
    `run_style`'s (phases 1-4 bitwise-equal to sequential, phase 5 to
    reassociation noise — tests/test_multirun.py)."""
    import time as _time

    from feature_level_style_transfer_for_tsc_tpu.config import PipelineConfig
    from feature_level_style_transfer_for_tsc_tpu.train.multirun import (
        MultiRunData,
        MultiRunStylePipeline,
    )
    from feature_level_style_transfer_for_tsc_tpu.train.pipeline import (
        StyleTransferPipeline,
    )

    assert len({n for n, _, _ in cells}) == 1, "vmapped cells must share n_target"
    # get_pair is channel-first (N, C, T); MultiRunData is channel-last
    pairs = [
        {
            k: (np.transpose(v[0], (0, 2, 1)), v[1])
            for k, v in get_pair(n, seed, noise).items()
        }
        for n, seed, noise in cells
    ]
    data = MultiRunData.from_pairs(pairs)
    pipe = StyleTransferPipeline(C_T, T_T, NUM_CLASS, C_S, T_S, NUM_CLASS,
                                 PipelineConfig())
    mpipe = MultiRunStylePipeline(pipe)
    accs = []
    t0 = _time.perf_counter()
    mpipe.run(
        data, [seed for _, seed, _ in cells], epochs=EPOCHS,
        eval_hook=lambda e, st, a: accs.append(np.asarray(a["target_test_acc"])),
    )
    wall = round(_time.perf_counter() - t0, 1)
    accs = np.stack(accs)  # [n_evals, K]
    for i, (n_target, seed, noise) in enumerate(cells):
        _merge(cell_key("style", n_target, seed, noise), {
            "final_test_acc": float(accs[-1, i]),
            "best_test_acc": float(accs[:, i].max()),
            "last10_mean": float(accs[-10:, i].mean()),
            "n_evals": int(accs.shape[0]),
            "wall_s": wall,  # shared: ONE program ran all K cells
            "vmapped_k": len(cells), "epochs": EPOCHS,
        })


def run_target_only(n_target, seed, noise=None):
    import time as _time

    from feature_level_style_transfer_for_tsc_tpu.config import PipelineConfig
    from feature_level_style_transfer_for_tsc_tpu.train.classifier import (
        OSCNNClassifier,
    )

    t_train, t_test, _, _ = _datasets(get_pair(n_target, seed, noise))
    cfg = PipelineConfig(seed=seed)
    clf = OSCNNClassifier(C_T, T_T, NUM_CLASS, config=cfg, with_cpc=True)
    t0 = _time.perf_counter()
    _, hist = clf.fit(t_train, t_test, epochs=sum(EPOCHS.values()), verbose=False)
    accs = [h["test_acc"] for h in hist if "test_acc" in h]
    _merge(cell_key("target_only", n_target, seed, noise), {
        "final_test_acc": accs[-1], "best_test_acc": max(accs),
        "last10_mean": float(np.mean(accs[-10:])), "n_evals": len(accs),
        "wall_s": round(_time.perf_counter() - t0, 1),
        "epochs": sum(EPOCHS.values()),
    })


def run_reference(n_target, seed, noise=None):
    """The reference's own `train()` on this pair (CPU; attribution arm)."""
    import parity_fullscale as pf

    pair = get_pair(n_target, seed, noise)
    # reuse the patched verbatim-reference driver from parity_fullscale by
    # pointing its get_pair at this experiment's arrays
    import torch

    import types  # noqa: F401

    orig_get_pair = pf.get_pair
    pf.get_pair = lambda _s: {k: (v[0], v[1]) for k, v in pair.items()}
    try:
        torch.manual_seed(seed)
        pf.RESULTS = RESULTS  # merge into this experiment's results file
        # unique scratch per CELL: two cells share a seed (n16_s0 / n32_s0),
        # and the reference's the_log.txt is append-only — a shared dir
        # would concatenate both curves and corrupt the parse
        scratch = cell_key("_ref_poscontrol", n_target, seed, noise).lstrip("_")
        pf.run_reference(seed, scratch_name=f"_{scratch}")
        data = json.load(open(RESULTS))
        row = data.pop(f"reference_seed{seed}")
        with open(RESULTS, "w") as f:
            json.dump(data, f, indent=2)
        _merge(cell_key("reference", n_target, seed, noise), row)
    finally:
        pf.get_pair = orig_get_pair


def summarize():
    data = json.load(open(RESULTS)) if os.path.exists(RESULTS) else {}
    cells = {}
    for k, v in data.items():
        if not isinstance(v, dict) or "final_test_acc" not in v:
            continue
        import re as _re

        m = _re.match(
            r"(style|target_only|reference)_n(\d+)_s(\d+)(?:_x([\d.]+))?$", k)
        if m:
            arm, n, s, x = m.group(1), int(m.group(2)), int(m.group(3)), m.group(4)
            cells.setdefault((n, s, x), {})[arm] = v
    rows, deltas = {}, []
    for (n, s, x), arms in sorted(
            cells.items(), key=lambda kv: (kv[0][0], kv[0][1], kv[0][2] or "")):
        if "style" in arms and "target_only" in arms:
            d = arms["style"]["final_test_acc"] - arms["target_only"]["final_test_acc"]
            rows[f"n{n}_s{s}" + (f"_x{x}" if x else "")] = {
                "style_final": round(arms["style"]["final_test_acc"], 4),
                "target_only_final": round(arms["target_only"]["final_test_acc"], 4),
                "delta_final": round(d, 4),
                "style_best": round(arms["style"]["best_test_acc"], 4),
                "target_only_best": round(arms["target_only"]["best_test_acc"], 4),
                **({"reference_final": round(arms["reference"]["final_test_acc"], 4)}
                   if "reference" in arms else {}),
            }
            deltas.append(d)
    summary = {
        "cells": rows,
        "n_cells": len(deltas),
        "mean_delta_final": round(float(np.mean(deltas)), 4) if deltas else None,
        "cells_positive": int(np.sum(np.asarray(deltas) > 0)) if deltas else 0,
    }
    data["_summary"] = summary
    with open(RESULTS, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps(summary, indent=2))


def main():
    side = sys.argv[1]
    if side == "summary":
        summarize()
        return
    raw = sys.argv[2:] or ["16:0", "16:1", "32:0", "32:1"]
    # cell syntax n:seed[:noise_target], e.g. 16:0:3.5 (hardened pair)
    cells = []
    for s in raw:
        parts = s.split(":")
        cells.append((int(parts[0]), int(parts[1]),
                      float(parts[2]) if len(parts) > 2 else None))
    if side == "style_vmap":
        run_style_vmapped(cells)
    else:
        fn = {"style": run_style, "target_only": run_target_only,
              "reference": run_reference}[side]
        for n_target, seed, noise in cells:
            fn(n_target, seed, noise)
    summarize()


if __name__ == "__main__":
    main()
