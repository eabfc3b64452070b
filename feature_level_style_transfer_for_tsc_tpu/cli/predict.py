"""Inference-only entry point: load trained checkpoint(s) and classify.

The reference has no serving path — its closest artifacts are the
prediction/accuracy halves of `multi_source_voting.py:368-429` (which saves
`final_predict.npy`) and `utils.eval_model_testdata` (`utils.py:27-52`).
This CLI is that capability as a standalone command over the checkpoints
`cli.main` / `cli.multi_source` write:

* ONE checkpoint: restore `final_state.npz` (params + BatchNorm running
  statistics), run the fused no-grad inference path on the requested target
  split, save predictions, print accuracy.
* SEVERAL checkpoints (comma-separated): ensemble serving — the member
  models are stacked along a leading model axis and evaluated as ONE vmapped
  program (the same domain-sharded machinery as `parallel/multi_source.py`,
  so on a pod slice the members ride different devices and the vote
  reduction is a psum), then combined with the selected reference vote rule
  (`multi_source_voting.py:405-429` and its two in-tree variants).  Mixed
  checkpoint layouts are accepted: full pipeline states from `cli.main` and
  extracted members from `cli.multi_source` are auto-detected from their
  npz key paths.

Usage:
  python -m feature_level_style_transfer_for_tsc_tpu.cli.predict \
      --target-root Multivariate_ts --target SelfRegulationSCP2 \
      --source-root Univariate_ts --source EthanolLevel \
      --checkpoint train_log/final_state.npz --out predictions
  # ensemble over 3 members, entropy+precision vote:
  ... --checkpoint m1.npz,m2.npz,m3.npz --vote entropy_precision
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..config import PipelineConfig
from ..train.pipeline import StyleTransferPipeline
from .main import build_datasets


def _is_member_layout(path):
    """True when the checkpoint is a `cli.multi_source` member (keys under
    ``['params']['ext']…``) rather than a full `cli.main` pipeline state
    (``['params']['t_ext']…``)."""
    with np.load(path if path.endswith(".npz") else path + ".npz") as z:
        return any("['params']['ext']" in k for k in z.files)


def _load_member(path, pipe_template, member_template):
    """Restore one ensemble member, auto-detecting the checkpoint layout.

    For a full pipeline state the target-side (extractor, classifier) member
    is extracted exactly like `cli.multi_source.extract_member` / the
    reference's per-checkpoint model rebuild (multi_source_voting.py:240-279).
    """
    from ..io import restore_checkpoint

    if _is_member_layout(path):
        return restore_checkpoint(path, member_template)
    full = restore_checkpoint(path, pipe_template)
    return {
        "params": {"ext": full["params"]["t_ext"], "cls": full["params"]["t_cls"]},
        "mstate": {"ext": full["mstate"]["t_ext"], "cls": full["mstate"]["t_cls"]},
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--target-root", required=True)
    p.add_argument("--target", required=True)
    p.add_argument("--source-root", required=True,
                   help="the source the checkpoint was trained with (shapes)")
    p.add_argument("--source", required=True)
    p.add_argument("--checkpoint", required=True,
                   help="full-state .npz written by cli.main (final_state.npz); "
                   "comma-separate several for vmapped ensemble serving "
                   "(cli.main states and cli.multi_source members both accepted)")
    p.add_argument("--split", choices=("test", "train"), default="test")
    p.add_argument("--out", default="predictions",
                   help="prefix: writes <out>_predict.npy "
                   "(reference final_predict.npy analogue)")
    p.add_argument("--vote", default="entropy_precision",
                   choices=("entropy_precision", "entropy_only", "predicted_label"),
                   help="ensemble vote rule (multi-checkpoint only)")
    p.add_argument("--budget-multiplier", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    from ..io import restore_checkpoint

    t_train, t_test, s_train, _ = build_datasets(
        args.target_root, args.target, args.source_root, args.source
    )
    cfg = PipelineConfig(seed=args.seed, budget_multiplier=args.budget_multiplier)
    pipe = StyleTransferPipeline(
        t_train.in_channel, t_train.time_length, t_train.num_class,
        s_train.in_channel, s_train.time_length, s_train.num_class, cfg,
    )
    template = pipe.init_state(jax.random.PRNGKey(cfg.seed))
    # Restore only params + mstate: inference never touches optimizer state,
    # and the opt pytree layout depends on training-time config knobs
    # (e.g. fused_optimizers) this CLI doesn't know — a full-state restore
    # would fail on any layout mismatch.
    pipe_template = {"params": template["params"], "mstate": template["mstate"]}

    ds = t_test if args.split == "test" else t_train
    paths = [s.strip() for s in args.checkpoint.split(",") if s.strip()]
    if not paths:
        p.error("--checkpoint is empty after splitting on ','")

    if len(paths) == 1 and not _is_member_layout(paths[0]):
        restored = restore_checkpoint(paths[0], pipe_template)
        state = dict(template)
        state.update(restored)
        preds = pipe.predict_target(state, ds.x)
        member_accs = None
    elif len(paths) == 1:
        # A single cli.multi_source member: restore through the member
        # template and classify with plain argmax (the reference's
        # single-model path, utils.py:27-52 — voting needs >=2 models).
        from ..train.classifier import OSCNNClassifier

        model_def = OSCNNClassifier(
            t_train.in_channel, t_train.time_length, t_train.num_class,
            config=cfg, with_cpc=False,
        )
        st = model_def.init_state(jax.random.PRNGKey(0))
        member = restore_checkpoint(
            paths[0], {"params": st["params"], "mstate": st["mstate"]}
        )
        logits = model_def.predict_logits(
            member["params"], member["mstate"], jax.numpy.asarray(ds.x)
        )
        preds = np.asarray(jax.numpy.argmax(logits, -1))
        member_accs = None
    else:
        from ..evaluation.voting import (
            entropy_only_vote,
            entropy_precision_vote,
            predicted_label_vote,
        )
        from ..parallel import MultiSourceEnsemble, make_mesh
        from ..train.classifier import OSCNNClassifier

        model_def = OSCNNClassifier(
            t_train.in_channel, t_train.time_length, t_train.num_class,
            config=cfg, with_cpc=False,
        )
        st = model_def.init_state(jax.random.PRNGKey(0))
        member_template = {"params": st["params"], "mstate": st["mstate"]}
        members = [_load_member(pp, pipe_template, member_template) for pp in paths]

        mesh = None
        if len(jax.devices()) >= len(members):
            mesh = make_mesh(data=1, domain=len(members),
                             devices=jax.devices()[:len(members)])
        ens = MultiSourceEnsemble(
            t_train.in_channel, t_train.time_length, t_train.num_class,
            config=cfg, mesh=mesh,
        )
        stacked = ens.stack(members)
        # Precision weights always come from the target TRAIN split
        # (reference :281-367), regardless of which split is scored.
        weights = ens.compute_class_weights(stacked, t_train.x, t_train.y)
        logits = ens.member_logits(stacked, jax.numpy.asarray(ds.x))
        if args.vote == "entropy_precision":
            preds = np.asarray(entropy_precision_vote(logits, weights, ens.voting))
        elif args.vote == "entropy_only":
            preds = np.asarray(entropy_only_vote(logits))
        else:
            preds = np.asarray(predicted_label_vote(logits, weights))
        member_accs = [
            float(np.mean(np.asarray(jax.numpy.argmax(l, -1)) == ds.y))
            for l in logits
        ]

    out_path = f"{args.out}_predict.npy"
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.save(out_path, preds)
    acc = float(np.mean(preds == ds.y))
    extra = (
        f" vote={args.vote} members={[round(a, 4) for a in member_accs]}"
        if member_accs is not None else ""
    )
    print(f"n={len(preds)} split={args.split} accuracy={acc:.4f}{extra} -> {out_path}")
    return acc


if __name__ == "__main__":
    main()
