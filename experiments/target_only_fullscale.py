"""Target-only control at the FULL-curriculum parity operating point.

The round-3 efficacy curve (results_efficacy_curve.json) is negative on its
shortened-curriculum synthetic cells, but it changes two variables at once
(pair difficulty AND curriculum length).  This experiment isolates the
method question at the exact operating point where ours/reference parity
was measured (experiments/parity_fullscale.py: the 4 reference data pairs,
N_TRAIN=20, noise 2.5 target <- 1.5 source, full 3/70/325/600/720
curriculum): train a target-only OS-CNN(+CPC) classifier for the SAME
total epoch budget (1,718 epochs) on each pair x 3 init seeds, and compare
against the style-transfer pipeline numbers already recorded in
results_parity_fullscale.json (ours_seed{p} + ours_vmap_d{p}_i{10,11}).

Positive mean delta (style - target_only) = the transfer machinery lifts a
label-scarce target at the reference's own scale; negative = the source
adds nothing these pairs' 20 labels don't already give.  Ledgered either
way (reference purpose: train_and_test.py:552-561).

Usage: python experiments/target_only_fullscale.py [data_seed:init_seed ...]
Writes/merges experiments/results_target_only_fullscale.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from parity_fullscale import get_pair, C_T, T_T, N_CLS_T, EPOCHS  # noqa: E402
from feature_level_style_transfer_for_tsc_tpu.config import PipelineConfig
from feature_level_style_transfer_for_tsc_tpu.data.dataset import TsClassificationData
from feature_level_style_transfer_for_tsc_tpu.train.classifier import OSCNNClassifier

RESULTS = os.path.join(HERE, "results_target_only_fullscale.json")
PARITY = os.path.join(HERE, "results_parity_fullscale.json")
TOTAL_EPOCHS = sum(EPOCHS.values())  # 1,718 — same budget as the pipeline


def run_cell(data_seed: int, init_seed: int):
    import time as _time

    pair = get_pair(data_seed)
    td = {f"c{i}": i for i in range(N_CLS_T)}

    def ds(name, is_train):
        x, y = pair[name]
        labels = np.asarray([f"c{v}" for v in y])
        return TsClassificationData(label_dict=td, is_train=is_train, arrays=(x, labels))

    cfg = PipelineConfig(seed=init_seed)  # batch_size 20, reference defaults
    clf = OSCNNClassifier(C_T, T_T, N_CLS_T, config=cfg, with_cpc=True)
    t0 = _time.perf_counter()
    _, hist = clf.fit(
        ds("t_train", True), ds("t_test", False),
        epochs=TOTAL_EPOCHS, verbose=False,
    )
    wall = _time.perf_counter() - t0
    accs = [h["test_acc"] for h in hist if "test_acc" in h]
    return {
        "final_test_acc": accs[-1],
        "best_test_acc": max(accs),
        "n_evals": len(accs),
        "epochs": TOTAL_EPOCHS,
        "wall_s": round(wall, 1),
    }


def summarize(data):
    """Paired style-vs-target-only deltas from results_parity_fullscale."""
    if not os.path.exists(PARITY):
        return None
    par = json.load(open(PARITY))
    deltas_final, rows = [], {}
    for p in range(4):
        style = [
            par[k]["final_test_acc"]
            for k in (f"ours_seed{p}", f"ours_vmap_d{p}_i10", f"ours_vmap_d{p}_i11")
            if k in par
        ]
        tonly = [
            v["final_test_acc"]
            for k, v in data.items()
            if k.startswith(f"target_only_d{p}_") and isinstance(v, dict)
        ]
        if not style or not tonly:
            continue
        d = float(np.mean(style) - np.mean(tonly))
        rows[f"pair{p}"] = {
            "style_mean_final": round(float(np.mean(style)), 4),
            "target_only_mean_final": round(float(np.mean(tonly)), 4),
            "delta": round(d, 4),
        }
        deltas_final.append(d)
    if not deltas_final:
        return None
    return {
        "pairs": rows,
        "mean_delta_final": round(float(np.mean(deltas_final)), 4),
        "sd_delta_final": round(float(np.std(deltas_final, ddof=1)), 4)
        if len(deltas_final) > 1 else None,
    }


def main():
    raw = sys.argv[1:] or [f"{p}:{i}" for p in range(4) for i in (0, 10, 11)]
    cells = [tuple(int(v) for v in s.split(":")) for s in raw]
    data = {}
    if os.path.exists(RESULTS):
        data = json.load(open(RESULTS))
    for ds_seed, init in cells:
        key = f"target_only_d{ds_seed}_i{init}"
        row = run_cell(ds_seed, init)
        data[key] = row
        print(key, row, flush=True)
        with open(RESULTS, "w") as f:
            json.dump(data, f, indent=2)
    s = summarize(data)
    if s:
        data["_summary"] = s
        with open(RESULTS, "w") as f:
            json.dump(data, f, indent=2)
        print(json.dumps(s, indent=2))


if __name__ == "__main__":
    main()
