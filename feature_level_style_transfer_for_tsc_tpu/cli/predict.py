"""Inference-only entry point: load a trained checkpoint and classify.

The reference has no serving path — its closest artifacts are the
prediction/accuracy halves of `multi_source_voting.py:368-429` (which saves
`final_predict.npy`) and `utils.eval_model_testdata` (`utils.py:27-52`).
This CLI is that capability as a standalone command over the checkpoints
`cli.main` writes: restore `final_state.npz` (full state, incl. BatchNorm
running statistics), run the fused no-grad inference path on the requested
target split, save predictions, print accuracy.

Usage:
  python -m feature_level_style_transfer_for_tsc_tpu.cli.predict \
      --target-root Multivariate_ts --target SelfRegulationSCP2 \
      --source-root Univariate_ts --source EthanolLevel \
      --checkpoint train_log/final_state.npz --out predictions
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..config import PipelineConfig
from ..train.pipeline import StyleTransferPipeline
from .main import build_datasets


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--target-root", required=True)
    p.add_argument("--target", required=True)
    p.add_argument("--source-root", required=True,
                   help="the source the checkpoint was trained with (shapes)")
    p.add_argument("--source", required=True)
    p.add_argument("--checkpoint", required=True,
                   help="full-state .npz written by cli.main (final_state.npz)")
    p.add_argument("--split", choices=("test", "train"), default="test")
    p.add_argument("--out", default="predictions",
                   help="prefix: writes <out>_predict.npy "
                   "(reference final_predict.npy analogue)")
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
    restored = restore_checkpoint(
        args.checkpoint,
        {"params": template["params"], "mstate": template["mstate"]},
    )
    state = dict(template)
    state.update(restored)

    ds = t_test if args.split == "test" else t_train
    preds = pipe.predict_target(state, ds.x)
    out_path = f"{args.out}_predict.npy"
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.save(out_path, preds)
    acc = float(np.mean(preds == ds.y))
    print(f"n={len(preds)} split={args.split} accuracy={acc:.4f} -> {out_path}")
    return acc


if __name__ == "__main__":
    main()
