"""Accuracy-parity experiment: our OS-CNN vs the reference's torch OS-CNN.

Trains both classifiers (OS_CNN_res extractor + OS_CNN head, CE only,
RMSprop 1e-3/3e-3 + StepLR(25, 0.8), batch 20) on the SAME synthetic
GunPoint-scale dataset and reports train/test accuracy plus the measured
training throughput of each — the BASELINE config-1 anchor.

The reference side drives the modules in /root/reference verbatim (CUDA
no-op'ed for CPU-only torch); nothing is copied into this repo.

Usage: python experiments/parity_accuracy.py [epochs]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature_level_style_transfer_for_tsc_tpu.data.synthetic import make_arrays

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith('--') else 30
N_TRAIN, N_TEST, T, C, NCLS, BS = 120, 120, 150, 1, 4, 20
NOISE = 2.5  # hard enough that accuracy does not saturate


def get_data(seed_shift=0):
    x_tr, y_tr = make_arrays(N_TRAIN, C, T, NCLS, seed=10 + seed_shift, noise=NOISE)
    x_te, y_te = make_arrays(N_TEST, C, T, NCLS, seed=11 + seed_shift, noise=NOISE)
    to_int = {lab: i for i, lab in enumerate(sorted(set(y_tr)))}
    return (
        x_tr, np.asarray([to_int[l] for l in y_tr], np.int64),
        x_te, np.asarray([to_int[l] for l in y_te], np.int64),
    )


def run_reference(x_tr, y_tr, x_te, y_te):
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.manual_seed(0)
    sys.path.insert(0, "/root/reference")
    from OS_CNN.OS_CNN_Structure_build import generate_layer_parameter_list
    from OS_CNN.OS_CNN import OS_CNN_res, OS_CNN, layer_parameter_list_input_change

    budgets = [8 * 128 * C, 5 * 128 * 256 + 2 * 256 * 128]
    rf = min(int(T / 4), 89)
    lpl = generate_layer_parameter_list(1, rf, budgets, C)
    ext = OS_CNN_res(lpl)
    feat_ch = sum(p[1] for p in lpl[-1])
    cls = OS_CNN(layer_parameter_list_input_change(lpl, feat_ch), NCLS)
    ce = torch.nn.CrossEntropyLoss()
    opt_e = torch.optim.RMSprop(ext.parameters(), lr=1e-3)
    opt_c = torch.optim.RMSprop(cls.parameters(), lr=3e-3)
    sch_e = torch.optim.lr_scheduler.StepLR(opt_e, step_size=25, gamma=0.8)
    sch_c = torch.optim.lr_scheduler.StepLR(opt_c, step_size=25, gamma=0.8)

    xt = torch.from_numpy(x_tr)
    yt = torch.from_numpy(y_tr)
    t0 = time.perf_counter()
    for _ in range(EPOCHS):
        ext.train(); cls.train()
        perm = torch.randperm(N_TRAIN)
        for i in range(0, N_TRAIN, BS):
            idx = perm[i : i + BS]
            logits, _ = cls(ext(xt[idx]))
            loss = ce(logits, yt[idx])
            opt_e.zero_grad(); opt_c.zero_grad()
            loss.backward()
            opt_e.step(); opt_c.step()
        sch_e.step(); sch_c.step()
    train_time = time.perf_counter() - t0

    def acc(x, y):
        ext.eval(); cls.eval()
        with torch.no_grad():
            logits, _ = cls(ext(torch.from_numpy(x)))
        return float((logits.argmax(1).numpy() == y).mean())

    return {
        "train_acc": acc(x_tr, y_tr),
        "test_acc": acc(x_te, y_te),
        "series_per_sec_train": N_TRAIN * EPOCHS / train_time,
    }


def run_ours(x_tr, y_tr, x_te, y_te):
    import jax

    from feature_level_style_transfer_for_tsc_tpu.data.dataset import TsClassificationData
    from feature_level_style_transfer_for_tsc_tpu.train.classifier import OSCNNClassifier

    labels = np.asarray([f"c{v}" for v in y_tr])
    labels_te = np.asarray([f"c{v}" for v in y_te])
    d = {}
    train = TsClassificationData(label_dict=d, is_train=True, arrays=(x_tr, labels))
    test = TsClassificationData(label_dict=d, is_train=False, arrays=(x_te, labels_te))

    clf = OSCNNClassifier(C, T, NCLS, with_cpc=False)
    # compile warmup (1 epoch), then steady-state timing for the rest
    state, _ = clf.fit(train, None, epochs=1, verbose=False)
    t0 = time.perf_counter()
    state, _ = clf.fit(train, None, epochs=EPOCHS, verbose=False)
    train_time = time.perf_counter() - t0
    return {
        "train_acc": clf.evaluate(state, train.x, train.y),
        "test_acc": clf.evaluate(state, test.x, test.y),
        "series_per_sec_train": N_TRAIN * EPOCHS / train_time,
    }


def main():
    seeds = 1
    for a in sys.argv[1:]:
        if a.startswith("--seeds="):
            seeds = int(a.split("=")[1])
    refs, ourss = [], []
    for s in range(seeds):
        global NOISE
        data = get_data(seed_shift=100 * s)
        refs.append(run_reference(*data))
        ourss.append(run_ours(*data))

    def agg(rs):
        return {
            k: float(np.mean([r[k] for r in rs])) for k in rs[0]
        } | {k + "_std": float(np.std([r[k] for r in rs])) for k in rs[0] if "acc" in k}

    ref, ours = agg(refs), agg(ourss)
    out = {
        "config": {"epochs": EPOCHS, "n_train": N_TRAIN, "T": T, "C": C,
                   "classes": NCLS, "seeds": seeds},
        "reference_torch_cpu": ref,
        "ours_jax": ours,
        "test_acc_gap": ours["test_acc"] - ref["test_acc"],
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results_parity.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
