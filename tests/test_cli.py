"""CLI entry points exercised end-to-end on a tiny synthetic .ts archive."""

import json
import os

import numpy as np

from feature_level_style_transfer_for_tsc_tpu.data.synthetic import make_arrays, write_ts_file


def _make_archive(root, name, n=10, c=1, t=16, ncls=2, seed=0):
    x, y = make_arrays(n, c, t, ncls, seed=seed)
    write_ts_file(os.path.join(root, name, f"{name}_TRAIN.ts"), x, y)
    x2, y2 = make_arrays(n, c, t, ncls, seed=seed + 1)
    write_ts_file(os.path.join(root, name, f"{name}_TEST.ts"), x2, y2)


def test_cli_main_tiny(tmp_path):
    from feature_level_style_transfer_for_tsc_tpu.cli.main import main

    root = str(tmp_path / "arch")
    _make_archive(root, "TinyT", c=2, t=16, ncls=2, seed=0)
    _make_archive(root, "TinyS", c=1, t=12, ncls=3, seed=5)
    out = str(tmp_path / "out")
    main([
        "--target-root", root, "--target", "TinyT",
        "--source-root", root, "--source", "TinyS",
        "--out", out, "--budget-multiplier", "0.02",
        "--phase-epochs", '{"p1":1,"p2":1,"p3":1,"p4":1,"p5":2}',
    ])
    assert os.path.exists(os.path.join(out, "final_state.npz"))
    history = json.load(open(os.path.join(out, "history.json")))
    assert any(h["phase"] == "p5_eval" for h in history)
    # feature dumps for t-SNE parity
    assert os.path.exists(os.path.join(out, "feature_of_target_s2t"))

    # inference-only serving entry over the saved full state
    from feature_level_style_transfer_for_tsc_tpu.cli.predict import main as predict_main

    acc = predict_main([
        "--target-root", root, "--target", "TinyT",
        "--source-root", root, "--source", "TinyS",
        "--checkpoint", os.path.join(out, "final_state.npz"),
        "--budget-multiplier", "0.02",
        "--out", str(tmp_path / "pred"),
    ])
    preds = np.load(str(tmp_path / "pred_predict.npy"))
    assert preds.shape == (10,)
    # predictions reproduce the accuracy the training run logged last
    last_eval = [h for h in history if h["phase"] == "p5_eval"][-1]
    assert abs(acc - last_eval["target_test_acc"]) < 1e-6


def test_cli_visualize(tmp_path):
    from feature_level_style_transfer_for_tsc_tpu.cli.visualize import main

    pred = np.array([0, 1, 1, 0])
    lab = np.array([0, 1, 0, 0])
    np.save(str(tmp_path / "p.npy"), pred)
    np.save(str(tmp_path / "l.npy"), lab)
    out = str(tmp_path / "strip.png")
    main(["--predictions", str(tmp_path / "p.npy"), "--labels", str(tmp_path / "l.npy"),
          "--out", out])
    assert os.path.exists(out)


def test_cli_archive_sweep(tmp_path):
    from feature_level_style_transfer_for_tsc_tpu.cli.archive_sweep import main

    root = str(tmp_path / "arch")
    _make_archive(root, "A1", c=1, t=16, ncls=2, seed=0)
    _make_archive(root, "A2", c=1, t=20, ncls=3, seed=7)
    out = str(tmp_path / "sweep.json")
    main(["--root", root, "--epochs", "2", "--out", out, "--budget-multiplier", "0.02"])
    res = json.load(open(out))
    assert set(res) == {"A1", "A2"}
    # archive_sweep uses full budgets; just check it produced accuracies
    assert all("test_acc" in r for r in res.values())
