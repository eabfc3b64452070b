"""Torch-side target-only control on the positive-control pair.

VERDICT-r3 item 1 contingency: our style arm failed to lift over target-only
on the shared-structure pair (results_positive_control.json, 0/4 cells
positive), so the attribution question is now "method or implementation?".
This script provides the torch half of the answer's denominator: the
REFERENCE'S OWN modules (OS_CNN_res extractor + OS_CNN classifier + CPC,
`/root/reference/train_and_test.py:38-52,129-133`) trained with the
reference's phase-1 objective and optimizers (CE + CPC, RMSprop 1e-3/3e-3,
Adam 2e-3, StepLR 25 with gamma 0.8/0.8/0.7 —
`/root/reference/train_and_test.py:97-107,131-134,141-180`) on the TARGET
data alone for the same total epoch budget the 5-phase curriculum gets
(1,718 epochs).  Together with `positive_control.py reference` (the
reference's full style-transfer `train()` on the same arrays) this yields a
pure-torch style-vs-target-only delta to compare against our pure-JAX delta.

Usage:
  python experiments/torch_target_only.py [n_target:seed ...]
Defaults: 16:0 32:0.  Merges rows `torch_target_only_n{N}_s{S}` into
experiments/results_positive_control.json (incrementally, so a cut-off run
still leaves a harvestable curve).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)

import torch  # noqa: E402
from torch import nn  # noqa: E402
from torch.utils.data import DataLoader, Dataset  # noqa: E402

# CPU-run shims, same set as parity_fullscale.run_reference
torch.Tensor.cuda = lambda self, *a, **k: self
nn.Module.cuda = lambda self, *a, **k: self
if not hasattr(torch, "qr"):
    torch.qr = lambda a: torch.linalg.qr(a)
if not hasattr(np, "float"):
    np.float = float
if "sktime" not in sys.modules:  # reference DataSource imports it at top level
    import types

    sk = types.ModuleType("sktime")
    skd = types.ModuleType("sktime.datasets")
    skd.load_from_tsfile = lambda *a, **k: (_ for _ in ()).throw(RuntimeError)
    sk.datasets = skd
    sys.modules["sktime"] = sk
    sys.modules["sktime.datasets"] = skd
sys.path.insert(0, "/root/reference")

from OS_CNN.OS_CNN import (  # noqa: E402
    OS_CNN,
    OS_CNN_res,
    layer_parameter_list_input_change,
)
from OS_CNN.OS_CNN_Structure_build import generate_layer_parameter_list  # noqa: E402
from Comparison.SLARDA.train import CPC  # noqa: E402

from positive_control import EPOCHS, get_pair, _merge  # noqa: E402

TOTAL_EPOCHS = sum(EPOCHS.values())  # 1,718
EVAL_EVERY = 2


class _Duck(Dataset):
    def __init__(self, x, y):
        self.x = torch.from_numpy(x).float()
        self.y = torch.from_numpy(np.asarray(y)).long()

    def __len__(self):
        return self.x.shape[0]

    def __getitem__(self, i):
        return self.x[i], self.y[i]


def _accuracy(ext, cls, loader):
    ext.eval()
    cls.eval()
    good = total = 0
    with torch.no_grad():
        for x, y in loader:
            out, _ = cls(ext(x.float()))
            good += int((out.argmax(-1) == y).sum())
            total += int(y.shape[0])
    return good / total


def run_cell(n_target, seed, noise=None):
    pair = get_pair(n_target, seed, noise)
    x_tr, y_tr = pair["t_train"]
    x_te, y_te = pair["t_test"]
    c, t = x_tr.shape[1], x_tr.shape[2]
    num_class = int(np.max(y_tr)) + 1

    torch.manual_seed(seed)
    # target module construction verbatim (train_and_test.py:38-52)
    budgets = [8 * 128 * c, 5 * 128 * 256 + 2 * 256 * 128]
    rf = min(int(t / 4), 89)
    specs = generate_layer_parameter_list(1, rf, budgets, c)
    ext = OS_CNN_res(specs)
    new_ch = sum(p[1] for p in specs[-1])
    cls = OS_CNN(layer_parameter_list_input_change(specs, new_ch), num_class)
    cpc = CPC(new_ch, 64, t // 2)
    ce = nn.CrossEntropyLoss()

    opt_ext = torch.optim.RMSprop(ext.parameters(), lr=0.001)
    opt_cls = torch.optim.RMSprop(cls.parameters(), lr=0.003)
    opt_cpc = torch.optim.Adam(cpc.parameters(), lr=0.002)
    sch_ext = torch.optim.lr_scheduler.StepLR(opt_ext, step_size=25, gamma=0.8)
    sch_cls = torch.optim.lr_scheduler.StepLR(opt_cls, step_size=25, gamma=0.8)
    sch_cpc = torch.optim.lr_scheduler.StepLR(opt_cpc, step_size=25, gamma=0.7)

    train_loader = DataLoader(_Duck(x_tr, y_tr), batch_size=20, shuffle=True)
    test_loader = DataLoader(_Duck(x_te, y_te), batch_size=20)

    key = f"torch_target_only_n{n_target}_s{seed}"
    if noise is not None:
        key += f"_x{noise:g}"
    accs = []
    t0 = time.perf_counter()
    for ep in range(TOTAL_EPOCHS):
        ext.train()
        cls.train()
        cpc.train()
        for x, y in train_loader:
            feat = ext(x.float())
            sl_loss = cpc(feat)
            out, _ = cls(feat)
            loss = ce(out, y) + sl_loss
            loss.backward()
            opt_ext.step()
            opt_cls.step()
            opt_cpc.step()
            opt_ext.zero_grad()
            opt_cls.zero_grad()
            opt_cpc.zero_grad()
        sch_ext.step()
        sch_cls.step()
        sch_cpc.step()
        if ep % EVAL_EVERY == 0 or ep == TOTAL_EPOCHS - 1:
            accs.append(_accuracy(ext, cls, test_loader))
            if len(accs) % 50 == 0:  # incremental merge: cut-off safe
                _merge(key, {
                    "final_test_acc": accs[-1], "best_test_acc": max(accs),
                    "last10_mean": float(np.mean(accs[-10:])),
                    "n_evals": len(accs), "partial_through_epoch": ep,
                    "wall_s": round(time.perf_counter() - t0, 1),
                })
    _merge(key, {
        "final_test_acc": accs[-1], "best_test_acc": max(accs),
        "last10_mean": float(np.mean(accs[-10:])), "n_evals": len(accs),
        "wall_s": round(time.perf_counter() - t0, 1), "epochs": TOTAL_EPOCHS,
    })


def main():
    raw = sys.argv[1:] or ["16:0", "32:0"]
    # cell syntax n:seed[:noise_target], e.g. 16:0:3.5 (hardened pair)
    for spec in raw:
        parts = spec.split(":")
        run_cell(int(parts[0]), int(parts[1]),
                 float(parts[2]) if len(parts) > 2 else None)


if __name__ == "__main__":
    main()
