"""End-to-end run whose input is an archive-format file on disk (VERDICT r2 #5b).

Drives `cli.main` (train, shortened curriculum) and `cli.predict` (restore +
serve) on the vendored archive under datasets/Univariate_ts — real `.ts`
files in the real `<root>/<Name>/<Name>_{TRAIN,TEST}.ts` layout parsed by
the production loader (native C++ or python .ts parser), NOT arrays from
data/synthetic.py.  Mirrors the reference's own usage
(/root/reference/main.py:7-11 -> DataSource.TrainData/TestData).

Usage: python experiments/vendored_e2e.py [--full] [--multivariate]
  default: shortened curriculum (minutes on the v5e)
  --full:  the reference's complete 3/70/325/600/720
  --multivariate: VendSCP2 (datasets/Multivariate_ts, 2 channels) as the
    target — the reference main.py's own target is multivariate
    (/root/reference/main.py:7-8); exercises the ':'-separated-dimension
    parser path from disk through cli.main + cli.predict.
  --multisource: cli.multi_source over FIVE vendored source datasets from
    disk (VendEthanol,VendWorms,VendSkate,VendSemg,VendCoffee -> trains 5
    members through the production parser, votes on-device with all 3 vote
    rules; VERDICT r4 item 7).  Reference analogue: sequential `train()`
    runs + /root/reference/multi_source_voting.py:230-429.
Writes experiments/results_vendored_e2e.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

RESULTS = os.path.join(HERE, "results_vendored_e2e.json")


def run_multisource(full: bool):
    import time as _time

    phase_epochs = (
        {"p1": 3, "p2": 70, "p3": 325, "p4": 600, "p5": 720}
        if full
        else {"p1": 2, "p2": 10, "p3": 20, "p4": 30, "p5": 40}
    )
    out = "/tmp/vendored_e2e_ms"
    sources = "VendEthanol,VendWorms,VendSkate,VendSemg,VendCoffee"
    from feature_level_style_transfer_for_tsc_tpu.cli import (
        multi_source as cli_multi_source,
    )

    root = os.path.join(REPO, "datasets", "Univariate_ts")
    t0 = _time.perf_counter()
    result = cli_multi_source.main([
        "--target-root", root, "--target", "VendGunPoint",
        "--source-root", root, "--sources", sources,
        "--out", out, "--phase-epochs", json.dumps(phase_epochs),
    ])
    row = {
        "dataset": f"VendGunPoint <- {sources} (vendored archive files)",
        "loader": "production .ts path, 5 sources from disk via "
                  "cli.multi_source (train + on-device vote)",
        "phase_epochs": phase_epochs,
        "train_wall_s": round(_time.perf_counter() - t0, 1),
        "ensemble_acc": result["ensemble_acc"],
        "member_accs": result["member_accs"],
        "vote_variants": result["vote_variants"],
    }
    data = json.load(open(RESULTS)) if os.path.exists(RESULTS) else {}
    data["multisource_" + ("full" if full else "short")] = row
    with open(RESULTS, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps(row, indent=2))


def main():
    full = "--full" in sys.argv
    multivariate = "--multivariate" in sys.argv
    if "--multisource" in sys.argv:
        run_multisource(full)
        return
    out = os.path.join("/tmp", "vendored_e2e" + ("_mv" if multivariate else ""))
    phase_epochs = (
        {"p1": 3, "p2": 70, "p3": 325, "p4": 600, "p5": 720}
        if full
        else {"p1": 3, "p2": 30, "p3": 60, "p4": 90, "p5": 90}
    )

    from feature_level_style_transfer_for_tsc_tpu.cli import main as cli_main
    from feature_level_style_transfer_for_tsc_tpu.cli import predict as cli_predict

    if multivariate:
        target_root = os.path.join(REPO, "datasets", "Multivariate_ts")
        target = "VendSCP2"
    else:
        target_root = os.path.join(REPO, "datasets", "Univariate_ts")
        target = "VendGunPoint"
    root = os.path.join(REPO, "datasets", "Univariate_ts")
    t0 = time.perf_counter()
    cli_main.main(
        [
            "--target-root", target_root, "--target", target,
            "--source-root", root, "--source", "VendEthanol",
            "--out", out,
            "--phase-epochs", json.dumps(phase_epochs),
        ]
    )
    train_wall = time.perf_counter() - t0

    acc = cli_predict.main(
        [
            "--target-root", target_root, "--target", target,
            "--source-root", root, "--source", "VendEthanol",
            "--checkpoint", os.path.join(out, "final_state.npz"),
            "--out", os.path.join(out, "final"),
        ]
    )

    history = json.load(open(os.path.join(out, "history.json")))
    test_accs = [
        r["target_test_acc"] for r in history if r.get("phase") == "p5_eval"
    ]
    row = {
        "dataset": f"{target} <- VendEthanol (vendored archive-format files)",
        "loader": "production .ts path ("
        + ("Multivariate_ts target, ':'-separated dimensions"
           if multivariate else "datasets/Univariate_ts")
        + " on disk)",
        "phase_epochs": phase_epochs,
        "train_wall_s": round(train_wall, 1),
        "predict_cli_test_acc": acc,
        "final_test_acc": test_accs[-1],
        "best_test_acc": max(test_accs),
    }
    data = {}
    if os.path.exists(RESULTS):
        data = json.load(open(RESULTS))
    key = "full" if full else "short"
    if multivariate:
        key = "multivariate_" + key
    data[key] = row
    with open(RESULTS, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps(row, indent=2))


if __name__ == "__main__":
    main()
