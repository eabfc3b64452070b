"""Micro-profile the vmapped _phase5_forward sub-pieces at K in {1, 8}.

results_vmap_phase5_breakdown.json shows the PURE FORWARD inflates 11x at
K=8 (super-linear) while the extractor and flow-forward components scale
sub-linearly — so something else in `_phase5_forward`
(train/pipeline.py:541-607) is the pathology.  This times each sub-piece
in isolation under jit(vmap(.)) with PER-RUN params (the multirun regime):

  ext_t / ext_s : omni-scale extractors
  cpc_pair      : cpc_apply_pair (anchor scans)
  flow_fwd_pair : waveglow_forward_pair + both NLLs
  flow_infer    : waveglow_infer (inverse 1x1 + coupling inverse)
  cls_heads     : both classifiers + s2t eval pass + heads
  cdan          : cdan_loss (random-layer outer product + AD net + GRL)
  prob_fd       : prob_transfer (LSTM twice) + 3 feature-discriminator passes
  noise         : noise_transfer_apply

Usage: python experiments/vmap_forward_microprofile.py [K ...]
Writes experiments/results_vmap_forward_microprofile.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from feature_level_style_transfer_for_tsc_tpu.config import PipelineConfig  # noqa: E402
from feature_level_style_transfer_for_tsc_tpu.losses.cdan import cdan_loss  # noqa: E402
from feature_level_style_transfer_for_tsc_tpu.models.adapters import (  # noqa: E402
    noise_transfer_apply,
    prob_transfer_apply,
)
from feature_level_style_transfer_for_tsc_tpu.models.cpc import cpc_apply_pair  # noqa: E402
from feature_level_style_transfer_for_tsc_tpu.models.critics import (  # noqa: E402
    feature_discriminator_apply,
)
from feature_level_style_transfer_for_tsc_tpu.models.flow import (  # noqa: E402
    waveglow_forward_pair,
    waveglow_infer,
    waveglow_loss,
)
from feature_level_style_transfer_for_tsc_tpu.models.os_cnn import os_cnn_head  # noqa: E402
from feature_level_style_transfer_for_tsc_tpu.train.pipeline import (  # noqa: E402
    StyleTransferPipeline,
)

B = 20
RESULTS = os.path.join(HERE, "results_vmap_forward_microprofile.json")


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def stackk(tree, k):
    return jax.tree_util.tree_map(lambda l: jnp.stack([l] * k), tree)


def main():
    ks = [int(a) for a in sys.argv[1:]] or [1, 8]
    pipe = StyleTransferPipeline(1, 150, 4, 1, 150, 4, PipelineConfig())
    state = pipe.init_state(jax.random.PRNGKey(0))
    params, mstate, consts = state["params"], state["mstate"], state["consts"]
    key = jax.random.PRNGKey(1)
    xt = jax.random.normal(key, (B, 150, 1))
    xs = jax.random.normal(key, (B, 150, 1))
    wn_ch = pipe.config.flow.wn_channels
    # representative activations (shapes as in _phase5_forward)
    feat_t, _ = pipe.target_features(params, mstate, xt, False)
    feat_s, _ = pipe.source_features(params, mstate, xs, False)
    logits_t, pool_t, _ = pipe.classify_target(params, mstate, feat_t, False)
    logits_s, pool_s, _ = pipe.classify_source(params, mstate, feat_s, False)
    nf_out_t, nf_out_s = waveglow_forward_pair(
        params["nf"], feat_t, feat_s, wn_ch, pipe.log_s_clamp
    )
    noise_t = nf_out_t[0]

    pieces = {
        "ext_t": lambda p, m, r: pipe.target_features(p, m, xt, True)[0],
        "ext_s": lambda p, m, r: pipe.source_features(p, m, xs, True)[0],
        "cpc_pair": lambda p, m, r: cpc_apply_pair(
            p["cpc"], feat_t, feat_s, r, jax.random.fold_in(r, 1)
        ),
        "flow_fwd_pair": lambda p, m, r: tuple(
            waveglow_loss(o)
            for o in waveglow_forward_pair(p["nf"], feat_t, feat_s, wn_ch, pipe.log_s_clamp)
        ),
        "flow_infer": lambda p, m, r: waveglow_infer(
            p["nf"], noise_t, wn_ch, log_s_clamp=pipe.log_s_clamp
        ),
        "cls_heads": lambda p, m, r: (
            pipe.classify_target(p, m, feat_t, True)[0],
            pipe.classify_target(p, m, feat_s, False)[0],
            pipe.classify_source(p, m, feat_s, True)[0],
        ),
        "cdan": lambda p, m, r: cdan_loss(
            p["ad"], m["ad"], feat_t, feat_s, logits_t, logits_s,
            random_layer=consts["random_layer"], training=True, dropout_rng=r,
        )[0],
        "prob_fd": lambda p, m, r: feature_discriminator_apply(
            p["fd"], m["fd"], prob_transfer_apply(p["prob_trans"], pool_t), training=True
        )[0],
        "noise": lambda p, m, r: noise_transfer_apply(
            p["noise"], m["noise"], noise_t, nf_out_s[0]
        )[0],
    }

    rows = {}
    rng = jax.random.PRNGKey(2)
    for k in ks:
        pk, mk = stackk(params, k), stackk(mstate, k)
        rngs = jnp.stack([rng] * k)
        row = {}
        for name, fn in pieces.items():
            f = jax.jit(jax.vmap(fn))
            row[f"{name}_ms"] = round(1e3 * timeit(f, pk, mk, rngs), 3)
            print(f"k={k} {name}: {row[f'{name}_ms']}", flush=True)
        rows[f"k{k}"] = row
    if len(ks) > 1 and "k1" in rows:
        for k in ks[1:]:
            rows[f"k{k}_ratio_vs_k1"] = {
                kk: round(rows[f"k{k}"][kk] / max(rows["k1"][kk], 1e-9), 2)
                for kk in rows["k1"]
            }
    with open(RESULTS, "w") as f:
        json.dump(rows, f, indent=2)
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
