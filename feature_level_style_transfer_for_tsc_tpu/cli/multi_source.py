"""Multi-source training + entropy/precision-weighted ensemble voting.

Equivalent of the reference's sequential per-source `train()` runs followed
by `/root/reference/multi_source_voting.py:230-429`, except:

* the K source->target pipelines are launched from one command;
* the trained target-shaped models are stacked on a "domain"-sharded mesh
  axis and the vote reduction runs on-device (see parallel/multi_source.py);
* the per-class precision weights come from the target train split and the
  final predictions + true labels are saved as .npy like the reference.

Usage:
  python -m feature_level_style_transfer_for_tsc_tpu.cli.multi_source \
      --target-root Multivariate_ts --target StandWalkJump \
      --source-root Univariate_ts --sources EthanolLevel,Worms,InlineSkate \
      --out multi_log
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from ..config import PipelineConfig
from ..data import TestData, TrainData
from ..io import save_checkpoint, save_prediction_strip
from ..parallel import MultiSourceEnsemble, make_mesh
from ..train.pipeline import StyleTransferPipeline


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--target-root", required=True)
    p.add_argument("--target", required=True)
    p.add_argument("--source-root", required=True)
    p.add_argument("--sources", required=True, help="comma-separated source dataset names")
    p.add_argument("--out", default="multi_log")
    p.add_argument("--joint-epochs", type=int, default=720)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--member-checkpoints", default=None,
        help="comma-separated member .npz checkpoints: skip training and "
        "vote directly (reference multi_source_voting.py loads 3 tars)",
    )
    p.add_argument("--phase-epochs", default=None, help="JSON phase-length override")
    p.add_argument("--budget-multiplier", type=float, default=1.0)
    p.add_argument(
        "--capture-epochs", default=None,
        help="comma-separated phase-5 epochs; source i's member is snapshot "
        "at capture_epochs[i %% len] instead of end-of-run — the reference "
        "votes over MID-curriculum checkpoints (epoch_{10,82,280}.tar at "
        "multi_source_voting.py:265-279). Epochs must be multiples of "
        "eval_every (the checkpoint cadence).",
    )
    args = p.parse_args(argv)
    phase_epochs = json.loads(args.phase_epochs) if args.phase_epochs else None

    sources = args.sources.split(",")
    target_dict = {}
    t_train = TrainData(args.target_root, f"{args.target}/{args.target}_TRAIN.ts", target_dict)
    t_test = TestData(args.target_root, f"{args.target}/{args.target}_TEST.ts", target_dict)
    os.makedirs(args.out, exist_ok=True)

    members = []
    if args.member_checkpoints:
        from ..io import restore_checkpoint
        from ..train.classifier import OSCNNClassifier

        cfg0 = PipelineConfig(budget_multiplier=args.budget_multiplier)
        model_def = OSCNNClassifier(
            t_train.in_channel, t_train.time_length, t_train.num_class,
            config=cfg0, with_cpc=False,
        )
        st = model_def.init_state(jax.random.PRNGKey(0))
        template = {"params": st["params"], "mstate": st["mstate"]}
        for path in args.member_checkpoints.split(","):
            members.append(restore_checkpoint(path, template))
        sources = []
    capture_epochs = (
        [int(e) for e in args.capture_epochs.split(",")]
        if args.capture_epochs else None
    )

    def extract_member(state):
        return {
            "params": {"ext": state["params"]["t_ext"], "cls": state["params"]["t_cls"]},
            "mstate": {"ext": state["mstate"]["t_ext"], "cls": state["mstate"]["t_cls"]},
        }

    def make_member_fn(i, source):
        def fn():
            source_dict = {}
            s_train = TrainData(args.source_root, f"{source}/{source}_TRAIN.ts", source_dict)
            s_test = TestData(args.source_root, f"{source}/{source}_TEST.ts", source_dict)
            cfg = PipelineConfig(seed=args.seed + i, joint_epochs=args.joint_epochs,
                                 budget_multiplier=args.budget_multiplier)
            pipe = StyleTransferPipeline(
                t_train.in_channel, t_train.time_length, t_train.num_class,
                s_train.in_channel, s_train.time_length, s_train.num_class, cfg,
            )
            snap = {}
            capture_at = (
                capture_epochs[i % len(capture_epochs)] if capture_epochs else None
            )

            def checkpoint_hook(e, state):
                if capture_at is not None and e == capture_at:
                    snap["member"] = jax.device_get(extract_member(state))

            state, history = pipe.run(
                t_train, t_test, s_train, s_test, epochs=phase_epochs,
                verbose=False, checkpoint_hook=checkpoint_hook,
            )
            member = snap.get("member") or extract_member(state)
            tag = f"@p5e{capture_at}" if "member" in snap else ""
            save_checkpoint(os.path.join(args.out, f"member_{source}.npz"), member)
            print(f"[{source}{tag}] final:", history[-1])
            return member

        return fn

    if sources:
        # K heterogeneous pipelines round-robined across devices (one chip
        # here -> sequential; a pod slice trains members concurrently)
        from ..parallel.multi_pipeline import train_members_parallel

        members.extend(
            train_members_parallel([make_member_fn(i, s) for i, s in enumerate(sources)])
        )

    domain = len(members)
    mesh = None
    if len(jax.devices()) >= domain:
        mesh = make_mesh(data=1, domain=domain, devices=jax.devices()[:domain])
    ens = MultiSourceEnsemble(
        t_train.in_channel, t_train.time_length, t_train.num_class,
        config=PipelineConfig(budget_multiplier=args.budget_multiplier), mesh=mesh,
    )
    stacked = ens.stack(members)
    result = ens.evaluate(stacked, t_train, t_test)
    np.save(os.path.join(args.out, "final_predict.npy"), result["predictions"])
    np.save(os.path.join(args.out, "true_label.npy"), t_test.y)
    save_prediction_strip(
        os.path.join(args.out, "prediction_strip.png"), result["predictions"], t_test.y
    )
    with open(os.path.join(args.out, "ensemble.json"), "w") as f:
        json.dump(
            {
                "ensemble_acc": result["ensemble_acc"],
                "member_accs": result["member_accs"],
                "vote_variants": result["vote_variants"],
            },
            f,
        )
    print(
        "ensemble accuracy:", result["ensemble_acc"],
        "members:", result["member_accs"],
        "variants:", result["vote_variants"],
    )
    return result


if __name__ == "__main__":
    main()
