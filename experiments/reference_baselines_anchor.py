"""Measured CPU anchors for the REFERENCE CoDATS / SLARDA pipelines.

Drives the reference's own torch modules through its Comparison training
loops (`/root/reference/Comparison/CoDATS/main.py:105-243` and
`/root/reference/Comparison/SLARDA/train.py:149-271` — scripts, so the
loop is reproduced here verbatim with the reference's modules, LRs,
Adam(2e-3)+StepLR(25,0.5) schedules and batch size 30) on the SAME
synthetic domains and epoch counts as `experiments/baselines_anchor.py`
measures ours.  CoDATS is instantiated at K=2 sources (the reference
hard-codes 3 symmetric per-source branches; ours was measured with 2).

Writes results_reference_baselines.json: target test accuracy +
train series/sec for both pipelines.

Usage: python experiments/reference_baselines_anchor.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch
import torch.nn as nn

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

from OS_CNN.OS_CNN_Structure_build import generate_layer_parameter_list  # noqa: E402
from OS_CNN.OS_CNN import OS_CNN, OS_CNN_res, layer_parameter_list_input_change  # noqa: E402
from Comparison.SLARDA.models import Discriminator_ATT  # noqa: E402
from Comparison.CoDATS.discriminator import (  # noqa: E402
    Discriminator_ATT as CoDATSDiscriminator,  # GRL(1.2) + num_class head
)
from Comparison.SLARDA.train import CPC, set_requires_grad  # noqa: E402

from feature_level_style_transfer_for_tsc_tpu.data.synthetic import make_arrays  # noqa: E402

T, NCLS, BS = 96, 3, 30  # matches experiments/baselines_anchor.py


def make_domain(n, c, seed, noise):
    x, y_str = make_arrays(n, c, T, NCLS, seed=seed, noise=noise)
    labels = sorted(set(y_str))
    y = np.asarray([labels.index(v) for v in y_str], np.int64)
    return torch.from_numpy(x), torch.from_numpy(y)


def batches(x, y, shuffle=True, seed=0):
    n = x.shape[0]
    idx = np.random.default_rng(seed).permutation(n) if shuffle else np.arange(n)
    return [
        (x[idx[i : i + BS]], y[idx[i : i + BS]])
        for i in range(0, n - BS + 1, BS)  # full batches, like DataLoader drop of tail? (keeps tail)
    ] + ([(x[idx[n - n % BS :]], y[idx[n - n % BS :]])] if n % BS else [])


def accuracy(extract, classify, x, y):
    with torch.no_grad():
        pred, _ = classify(extract(x.float()))
        return float((pred.argmax(1) == y).float().mean())


def build_arch(c, t):
    budgets = [8 * 128 * c, 5 * 128 * 256 + 2 * 256 * 128]
    rf = min(int(t / 4), 89)
    lpl = generate_layer_parameter_list(1, rf, budgets, c)
    feat = sum(p[1] for p in lpl[-1])
    return lpl, layer_parameter_list_input_change(lpl, feat), feat


def run_codats():
    """Reference CoDATS loop (main.py:105-243) at K=2 sources."""
    torch.manual_seed(0)
    xt, yt = make_domain(90, 2, 30, 1.5)
    xt_test, yt_test = make_domain(120, 2, 31, 1.5)
    sources = [make_domain(120, 1, 40, 0.8), make_domain(120, 3, 50, 1.0)]
    lpl, cls_lpl, feat = build_arch(2, T)

    resizes = [nn.Conv1d(xs.shape[1], 2, 1) for xs, _ in sources]
    trans = [nn.Linear(T, T) for _ in sources]
    ext = OS_CNN_res(lpl)
    t_cls = OS_CNN(cls_lpl, NCLS)
    s_clss = [OS_CNN(cls_lpl, NCLS) for _ in sources]
    disc = CoDATSDiscriminator(T, 128, 8, 8, 64, 1 + len(sources)).float()
    mods = resizes + trans + [ext, t_cls, disc] + s_clss
    opts = [torch.optim.Adam(m.parameters(), lr=0.002) for m in mods]
    scheds = [torch.optim.lr_scheduler.StepLR(o, step_size=25, gamma=0.5) for o in opts]
    ce = nn.CrossEntropyLoss()

    epochs = 60
    t0 = time.perf_counter()
    for ep in range(epochs):
        for m in mods:
            m.train()
        tb = batches(xt, yt, seed=ep)
        sbs = [batches(xs, ys, seed=100 + ep) for xs, ys in sources]
        rounds = min(len(tb), *[len(sb) for sb in sbs])
        for i in range(rounds):
            for o in opts:
                o.zero_grad()
            bt, lt = tb[i]
            ext.train()
            t_feat = ext(bt.float())
            feats, preds, losses, dlabels = [t_feat], [], [], [
                torch.zeros(len(lt), dtype=torch.long)
            ]
            ext.eval()  # BN-freeze for source passes (main.py:158-165)
            for k, sb in enumerate(sbs):
                bs_, ls_ = sb[i]
                f = trans[k](ext(resizes[k](bs_.float())))
                feats.append(f)
                dlabels.append(torch.full((len(ls_),), k + 1, dtype=torch.long))
                p, _ = s_clss[k](f)
                losses.append(ce(p, ls_))
            pred_d = disc(torch.cat(feats, 0))
            loss_disc = ce(pred_d, torch.cat(dlabels, 0))
            p_t, _ = t_cls(t_feat)
            loss = ce(p_t, lt) + sum(losses) + loss_disc
            loss.backward()
            for o in opts:
                o.step()
        for s in scheds:
            s.step()
    wall = time.perf_counter() - t0
    ext.eval()
    t_cls.eval()
    return {
        "final_test_acc": accuracy(ext, t_cls, xt_test, yt_test),
        "epochs": epochs,
        "series_per_sec_train": (90 + 2 * 120) * epochs / wall,
        "wall_s": round(wall, 1),
    }


def run_slarda():
    """Reference SLARDA loop (train.py:149-271)."""
    torch.manual_seed(0)
    xt, yt = make_domain(90, 2, 60, 1.5)
    xt_test, yt_test = make_domain(120, 2, 61, 1.5)
    xs, ys = make_domain(150, 3, 70, 0.8)
    lpl, cls_lpl, feat = build_arch(2, T)

    s_ext = OS_CNN_res(lpl)
    t_ext = OS_CNN_res(lpl)
    s_cls = OS_CNN(cls_lpl, NCLS)
    t_cls = OS_CNN(cls_lpl, NCLS)
    resize = nn.Conv1d(3, 2, 1)
    len_trans = nn.Linear(T, T)
    cpc = CPC(feat, 64, T // 2)
    ce = nn.CrossEntropyLoss()
    bce = nn.BCEWithLogitsLoss()

    opt = {
        "resize": torch.optim.Adam(resize.parameters(), lr=0.002),
        "s_ext": torch.optim.Adam(s_ext.parameters(), lr=0.002),
        "s_cls": torch.optim.Adam(s_cls.parameters(), lr=0.002),
        "t_ext": torch.optim.Adam(t_ext.parameters(), lr=0.002),
        "t_cls": torch.optim.Adam(t_cls.parameters(), lr=0.002),
        "trans": torch.optim.Adam(len_trans.parameters(), lr=0.002),
        "cpc": torch.optim.Adam(cpc.parameters(), lr=0.002),
    }
    scheds = {
        k: torch.optim.lr_scheduler.StepLR(o, step_size=25, gamma=0.5)
        for k, o in opt.items()
    }

    source_epochs, target_epochs = 30, 60
    t0 = time.perf_counter()
    # phase 1: source pretrain 2*CPC + CE (train.py:149-182)
    for ep in range(source_epochs):
        for m in (cpc, resize, s_ext, s_cls):
            m.train()
        for bx, by in batches(xs, ys, seed=ep):
            for k in ("cpc", "resize", "s_ext", "s_cls"):
                opt[k].zero_grad()
            feature = s_ext(resize(bx.float()))
            pred, _ = s_cls(feature)
            loss = 2 * cpc(feature) + ce(pred, by)
            loss.backward()
            for k in ("resize", "s_ext", "s_cls", "cpc"):
                opt[k].step()
        for k in ("s_ext", "s_cls", "cpc", "resize"):
            scheds[k].step()
    # weight transfer, skip 'hidden' (train.py:189-198)
    t_ext.load_state_dict(s_ext.state_dict())
    new_dict = t_cls.state_dict()
    new_dict.update(
        {k: v for k, v in s_cls.state_dict().items() if "hidden" not in k}
    )
    t_cls.load_state_dict(new_dict)
    set_requires_grad(resize, False)
    set_requires_grad(s_ext, False)
    set_requires_grad(s_cls, False)
    disc = Discriminator_ATT(T, 128, 8, 8, 64).float()
    opt_disc = torch.optim.Adam(disc.parameters(), lr=0.002)
    # phase 2: ADDA-style target adaptation (train.py:201-266)
    for ep in range(target_epochs):
        for m in (t_ext, t_cls, len_trans):
            m.train()
        tb = batches(xt, yt, seed=200 + ep)
        sb = batches(xs, ys, seed=300 + ep)
        for i in range(min(len(tb), len(sb))):
            bt, lt = tb[i]
            bs_, _ = sb[i]
            for k in ("t_ext", "trans", "t_cls"):
                opt[k].zero_grad()
            opt_disc.zero_grad()
            source_feature = s_ext(resize(bs_.float()))
            target_feature = t_ext(bt.float())
            target_changed = len_trans(target_feature)
            feat_concat = torch.cat((source_feature, target_changed), 0)
            pred_concat = disc(feat_concat.detach())
            label_concat = torch.cat(
                (torch.ones(len(bs_)), torch.zeros(len(bt))), 0
            )
            loss_disc = bce(pred_concat.squeeze(), label_concat)
            loss_disc.backward()
            opt_disc.step()
            for k in ("t_ext", "trans"):
                opt[k].zero_grad()
            opt_disc.zero_grad()
            pred_tgt = disc(target_changed)
            loss_tgt = bce(pred_tgt.squeeze(), torch.ones(len(bt)))
            pred, _ = t_cls(target_feature)
            (ce(pred, lt) + loss_tgt).backward()
            for k in ("t_ext", "trans", "t_cls"):
                opt[k].step()
        for k in ("trans", "t_ext", "t_cls"):
            scheds[k].step()
    wall = time.perf_counter() - t0
    t_ext.eval()
    t_cls.eval()
    return {
        "final_test_acc": accuracy(t_ext, t_cls, xt_test, yt_test),
        "source_epochs": source_epochs,
        "target_epochs": target_epochs,
        "series_per_sec_train": (90 + 150) * target_epochs / wall,
        "wall_s": round(wall, 1),
    }


def main():
    out = {"codats_reference_cpu": run_codats()}
    print("codats:", out["codats_reference_cpu"], flush=True)
    out["slarda_reference_cpu"] = run_slarda()
    print("slarda:", out["slarda_reference_cpu"], flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results_reference_baselines.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
