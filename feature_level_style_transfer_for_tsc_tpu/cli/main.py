"""Single source->target style-transfer training run.

Equivalent of the reference entry point `/root/reference/main.py:1-11` (which
hard-codes SelfRegulationSCP2 <- EthanolLevel), with the datasets, epoch
counts and output paths as flags.

Usage:
  python -m feature_level_style_transfer_for_tsc_tpu.cli.main \
      --target-root Multivariate_ts --target SelfRegulationSCP2 \
      --source-root Univariate_ts --source EthanolLevel \
      --out train_log
"""

from __future__ import annotations

import argparse
import json
import os

from ..config import PipelineConfig
from ..data import TestData, TrainData
from ..io import save_checkpoint
from ..train.pipeline import StyleTransferPipeline


def build_datasets(target_root, target, source_root, source):
    target_dict, source_dict = {}, {}
    t_train = TrainData(target_root, f"{target}/{target}_TRAIN.ts", target_dict)
    t_test = TestData(target_root, f"{target}/{target}_TEST.ts", target_dict)
    s_train = TrainData(source_root, f"{source}/{source}_TRAIN.ts", source_dict)
    s_test = TestData(source_root, f"{source}/{source}_TEST.ts", source_dict)
    return t_train, t_test, s_train, s_test


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--target-root", required=True)
    p.add_argument("--target", required=True)
    p.add_argument("--source-root", required=True)
    p.add_argument("--source", required=True)
    p.add_argument("--out", default="train_log")
    p.add_argument("--joint-epochs", type=int, default=720)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--phase-epochs",
        default=None,
        help='JSON dict overriding phase lengths, e.g. \'{"p1":1,"p2":1,"p3":1,"p4":1,"p5":2}\'',
    )
    p.add_argument("--budget-multiplier", type=float, default=1.0)
    p.add_argument(
        "--resume", action="store_true",
        help="resume from <out>/final_state.npz (full state: params, all "
        "optimizer moments, schedulers, GradNorm weights, PRNG)",
    )
    args = p.parse_args(argv)

    t_train, t_test, s_train, s_test = build_datasets(
        args.target_root, args.target, args.source_root, args.source
    )
    cfg = PipelineConfig(seed=args.seed, joint_epochs=args.joint_epochs,
                         checkpoint_dir=args.out,
                         budget_multiplier=args.budget_multiplier)
    pipe = StyleTransferPipeline(
        t_train.in_channel, t_train.time_length, t_train.num_class,
        s_train.in_channel, s_train.time_length, s_train.num_class, cfg,
    )
    os.makedirs(args.out, exist_ok=True)

    def target_member(state):
        # reference utils.save_target_classification_modules (utils.py:9-15):
        # target extractor + classifier state_dicts. A torch state_dict
        # includes BN buffers, so mstate rides along — and this is exactly the
        # member layout cli.multi_source / cli.predict ensemble-serving load
        # (multi_source_voting.py:265-279 consumes these epoch tars).
        return {
            "params": {"ext": state["params"]["t_ext"], "cls": state["params"]["t_cls"]},
            "mstate": {"ext": state["mstate"]["t_ext"], "cls": state["mstate"]["t_cls"]},
        }

    def source_member(state):
        # reference utils.save_source_classification_modules (utils.py:18-25):
        # source extractor + DimensionUnification + source classifier.
        return {
            "params": {"ext": state["params"]["s_ext"],
                       "dim_uni": state["params"]["dim_uni"],
                       "cls": state["params"]["s_cls"]},
            # DimensionUnification has no BN buffers -> no mstate entry
            "mstate": {"ext": state["mstate"]["s_ext"],
                       "cls": state["mstate"]["s_cls"]},
        }

    def checkpoint_hook(epoch, state):
        # train_and_test.py:780-781 saves both sides at the eval cadence
        save_checkpoint(os.path.join(args.out, f"epoch_{epoch}.npz"),
                        target_member(state))
        save_checkpoint(os.path.join(args.out, f"epoch_{epoch}_source.npz"),
                        source_member(state))

    def phase_checkpoint_hook(phase, state):
        # analogue of the reference's post-phase-3 classifier_itself.tar pair
        # (train_and_test.py:364-372), generalized to every phase boundary;
        # the target-side file feeds cli.multi_source --member-checkpoints
        save_checkpoint(
            os.path.join(args.out, f"{phase}_target_classifier_itself.npz"),
            target_member(state),
        )
        save_checkpoint(
            os.path.join(args.out, f"{phase}_source_classifier_itself.npz"),
            source_member(state),
        )

    state = None
    resume_path = os.path.join(args.out, "final_state.npz")
    if args.resume and os.path.exists(resume_path):
        import jax

        from ..io import restore_checkpoint

        template = pipe.init_state(jax.random.PRNGKey(cfg.seed))
        state = restore_checkpoint(resume_path, template)
        print(f"resumed from {resume_path}")

    epochs = json.loads(args.phase_epochs) if args.phase_epochs else None
    state, history = pipe.run(
        t_train, t_test, s_train, s_test, epochs=epochs, state=state,
        checkpoint_hook=checkpoint_hook,
        phase_checkpoint_hook=phase_checkpoint_hook, artifact_dir=args.out,
        log_file=os.path.join(args.out, "log.jsonl"),
    )
    save_checkpoint(os.path.join(args.out, "final_state.npz"), state)
    with open(os.path.join(args.out, "history.json"), "w") as f:
        json.dump(history, f)
    print("done; final:", history[-1])


if __name__ == "__main__":
    main()
