"""Config-4 at spec: multi-source voting over 5+ source domains (VERDICT r2 #3).

Reference pattern: K sequential `train()` runs (one per source), then vote
over MID-curriculum checkpoints — `multi_source_voting.py:265-279` loads
epoch_{10,82,280}.tar from three runs.  Here `cli.multi_source` trains
FIVE source->target members from one command (heterogeneous source shapes),
snapshots members at reference-style mixed curriculum depths via
--capture-epochs, and votes on the domain-sharded path with all three vote
rules (active + the two commented variants).

The target is label-scarce (24 train series) so the sources matter; a
target-only OS-CNN baseline anchors the lift.

Usage: python experiments/multisource_demo.py
Writes experiments/results_multisource_demo.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from feature_level_style_transfer_for_tsc_tpu.data.synthetic import (  # noqa: E402
    make_arrays,
    write_ts_file,
)

RESULTS = os.path.join(HERE, "results_multisource_demo.json")
ARCH = "/tmp/multisource_demo_arch"
OUT = "/tmp/multisource_demo_out"

TARGET = ("Target", 1, 150, 4, 2.5)  # name, C, T, n_cls, noise
SOURCES = [
    ("SrcA", 1, 150, 4, 1.5),
    ("SrcB", 1, 175, 4, 1.8),
    ("SrcC", 2, 150, 3, 1.5),
    ("SrcD", 1, 120, 5, 2.0),
    ("SrcE", 1, 150, 2, 1.2),
]
PHASE_EPOCHS = {"p1": 3, "p2": 20, "p3": 40, "p4": 60, "p5": 60}
CAPTURE = "20,40,58,58,58"  # reference-style mixed-depth members


def gen_archive():
    shutil.rmtree(ARCH, ignore_errors=True)
    name, c, t, ncls, noise = TARGET
    x, y = make_arrays(24, c, t, ncls, seed=1, noise=noise)  # label-scarce
    write_ts_file(f"{ARCH}/{name}/{name}_TRAIN.ts", x, y)
    x, y = make_arrays(120, c, t, ncls, seed=2, noise=noise)
    write_ts_file(f"{ARCH}/{name}/{name}_TEST.ts", x, y)
    for i, (name, c, t, ncls, noise) in enumerate(SOURCES):
        x, y = make_arrays(60, c, t, ncls, seed=10 + i, noise=noise)
        write_ts_file(f"{ARCH}/{name}/{name}_TRAIN.ts", x, y)
        x, y = make_arrays(60, c, t, ncls, seed=40 + i, noise=noise)
        write_ts_file(f"{ARCH}/{name}/{name}_TEST.ts", x, y)


def target_only_baseline():
    from feature_level_style_transfer_for_tsc_tpu.config import PipelineConfig
    from feature_level_style_transfer_for_tsc_tpu.data import TestData, TrainData
    from feature_level_style_transfer_for_tsc_tpu.train.classifier import (
        OSCNNClassifier,
    )

    d = {}
    tr = TrainData(ARCH, "Target/Target_TRAIN.ts", d)
    te = TestData(ARCH, "Target/Target_TEST.ts", d)
    clf = OSCNNClassifier(
        tr.in_channel, tr.time_length, tr.num_class,
        config=PipelineConfig(), with_cpc=False,
    )
    total = sum(PHASE_EPOCHS.values())  # same epoch budget as one member
    _, hist = clf.fit(tr, te, epochs=total, verbose=False)
    accs = [h["test_acc"] for h in hist if "test_acc" in h]
    return {"final": accs[-1], "best": max(accs), "epochs": total}


def target_only_ensemble():
    """The FAIR control (VERDICT r3 item 2): an ensemble of 5 differently-
    seeded TARGET-ONLY members at the same per-member epoch budget + capture
    schedule as the source-adapted members, voted with the same 3 rules —
    isolating how much of the ensemble lift is source transfer vs plain
    ensembling (reference vote rules: multi_source_voting.py:405-429)."""
    import jax

    from feature_level_style_transfer_for_tsc_tpu.config import PipelineConfig
    from feature_level_style_transfer_for_tsc_tpu.data import TestData, TrainData
    from feature_level_style_transfer_for_tsc_tpu.evaluation.voting import (
        entropy_only_vote,
        entropy_precision_vote,
        predicted_label_vote,
    )
    from feature_level_style_transfer_for_tsc_tpu.parallel import MultiSourceEnsemble
    from feature_level_style_transfer_for_tsc_tpu.train.classifier import OSCNNClassifier

    d = {}
    tr = TrainData(ARCH, "Target/Target_TRAIN.ts", d)
    te = TestData(ARCH, "Target/Target_TEST.ts", d)
    pretrain = sum(v for k, v in PHASE_EPOCHS.items() if k != "p5")
    captures = [int(c) for c in CAPTURE.split(",")]
    members, member_accs = [], []
    for i, cap in enumerate(captures):
        cfg = PipelineConfig(seed=i)  # seed i matches member i's init seed
        clf = OSCNNClassifier(
            tr.in_channel, tr.time_length, tr.num_class, config=cfg, with_cpc=False,
        )
        # same effective budget as style member i: phases 1-4 + capture epoch
        state, hist = clf.fit(tr, te, epochs=pretrain + cap, verbose=False)
        members.append({"params": state["params"], "mstate": state["mstate"]})
        accs = [h["test_acc"] for h in hist if "test_acc" in h]
        member_accs.append(accs[-1])
    ens = MultiSourceEnsemble(
        tr.in_channel, tr.time_length, tr.num_class, config=PipelineConfig(),
    )
    stacked = ens.stack(members)
    weights = ens.compute_class_weights(stacked, tr.x, tr.y)
    logits = ens.member_logits(stacked, jax.numpy.asarray(te.x))
    votes = {
        "entropy_precision": np.asarray(entropy_precision_vote(logits, weights, ens.voting)),
        "entropy_only": np.asarray(entropy_only_vote(logits)),
        "predicted_label": np.asarray(predicted_label_vote(logits, weights)),
    }
    return {
        "member_accs": member_accs,
        "member_mean": float(np.mean(member_accs)),
        "vote_variants": {k: float(np.mean(v == te.y)) for k, v in votes.items()},
        "per_member_epochs": [pretrain + c for c in captures],
    }


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "target_only_ensemble":
        # merge the fair-control arm into the existing results
        gen_archive()
        row = json.load(open(RESULTS)) if os.path.exists(RESULTS) else {}
        row["target_only_ensemble"] = target_only_ensemble()
        with open(RESULTS, "w") as f:
            json.dump(row, f, indent=2)
        print(json.dumps(row["target_only_ensemble"], indent=2))
        return

    gen_archive()
    shutil.rmtree(OUT, ignore_errors=True)

    from feature_level_style_transfer_for_tsc_tpu.cli import multi_source

    result = multi_source.main(
        [
            "--target-root", ARCH, "--target", "Target",
            "--source-root", ARCH,
            "--sources", ",".join(s[0] for s in SOURCES),
            "--out", OUT,
            "--phase-epochs", json.dumps(PHASE_EPOCHS),
            "--capture-epochs", CAPTURE,
        ]
    )
    baseline = target_only_baseline()
    row = {
        "n_sources": len(SOURCES),
        "sources": [dict(zip(("name", "C", "T", "n_cls", "noise"), s)) for s in SOURCES],
        "target_train_n": 24,
        "phase_epochs": PHASE_EPOCHS,
        "capture_epochs": CAPTURE,
        "member_accs": result["member_accs"],
        "member_mean": float(np.mean(result["member_accs"])),
        "vote_variants": result["vote_variants"],
        "ensemble_acc": result["ensemble_acc"],
        "target_only_baseline": baseline,
        "cli": "feature_level_style_transfer_for_tsc_tpu.cli.multi_source",
    }
    with open(RESULTS, "w") as f:
        json.dump(row, f, indent=2)
    print(json.dumps(row, indent=2))


if __name__ == "__main__":
    main()
