"""CoDATS / SLARDA baseline runs (reference Comparison/ entry points).

Usage:
  python -m feature_level_style_transfer_for_tsc_tpu.cli.baselines codats \
      --target-root Univariate_ts --target Haptics \
      --source-root Univariate_ts --sources InlineSkate,Worms,SemgHandMovementCh2
  python -m feature_level_style_transfer_for_tsc_tpu.cli.baselines slarda \
      --target-root Multivariate_ts --target SelfRegulationSCP2 \
      --source-root Multivariate_ts --sources MotorImagery
"""

from __future__ import annotations

import argparse
import json
import os

from ..baselines import CoDATSPipeline, SLARDAPipeline
from ..config import PipelineConfig
from ..data import TestData, TrainData


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("baseline", choices=["codats", "slarda"])
    p.add_argument("--target-root", required=True)
    p.add_argument("--target", required=True)
    p.add_argument("--source-root", required=True)
    p.add_argument("--sources", required=True)
    p.add_argument("--epochs", type=int, default=0, help="0 = reference default")
    p.add_argument("--out", default="baseline_log")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    target_dict = {}
    t_train = TrainData(args.target_root, f"{args.target}/{args.target}_TRAIN.ts", target_dict)
    t_test = TestData(args.target_root, f"{args.target}/{args.target}_TEST.ts", target_dict)
    source_names = args.sources.split(",")
    source_trains = []
    for s in source_names:
        d = {}
        source_trains.append(TrainData(args.source_root, f"{s}/{s}_TRAIN.ts", d))

    cfg = PipelineConfig(seed=args.seed, batch_size=30)  # Comparison uses bs=30
    os.makedirs(args.out, exist_ok=True)

    if args.baseline == "codats":
        pipe = CoDATSPipeline(
            (t_train.in_channel, t_train.time_length, t_train.num_class),
            [(s.in_channel, s.time_length, s.num_class) for s in source_trains],
            config=cfg,
        )
        state, history = pipe.fit(
            t_train, t_test, source_trains, epochs=args.epochs or 600
        )
    else:
        assert len(source_trains) == 1, "slarda takes exactly one source"
        s = source_trains[0]
        pipe = SLARDAPipeline(
            (t_train.in_channel, t_train.time_length, t_train.num_class),
            (s.in_channel, s.time_length, s.num_class),
            config=cfg,
        )
        state, history = pipe.fit(
            t_train, t_test, s,
            source_epochs=70, target_epochs=args.epochs or 450,
        )
    with open(os.path.join(args.out, f"{args.baseline}_history.json"), "w") as f:
        json.dump(history, f)
    print("final:", history[-1])


if __name__ == "__main__":
    main()
