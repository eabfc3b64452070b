"""Can batching per-loss cotangents through ONE flow backward beat separate
pullbacks under the K-run vmap?  (VERDICT r3 item 3, the "stacked cotangent"
candidate.)

The phase-5 GradNorm step pays the flow backward ~3x per step: in the total
pull, the nf pull and the s2t2s pull (train/pipeline.py:696-746).  The
constant-one-hot DCE trick makes each pull traverse only its ancestors, but
under vmap(K) the measured fwd_vjp6 section still scales ~7.2x at K=8
(results_vmap_phase5_breakdown.json) — the per-loss pulls serialize.

This microbench isolates the candidate at the flow level: vjp of
`waveglow_forward_pair` once, then
  (a) L sequential pullback calls with distinct cotangents      [today]
  (b) ONE vmapped pullback over the stacked (L, ...) cotangents [candidate]
at K in {1, 8} outer vmap, production GunPoint geometry.  If (b) does not
beat (a) at K=8, the per-run pullback serialization is not recoverable by
cotangent batching and the ledger closes this branch.

Usage: python experiments/pullback_batched_cotangent.py
Writes experiments/results_pullback_batched_cotangent.json.
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
from feature_level_style_transfer_for_tsc_tpu.models.flow import (  # noqa: E402
    waveglow_forward_pair,
    waveglow_init,
    waveglow_loss,
)

RESULTS = os.path.join(HERE, "results_pullback_batched_cotangent.json")

B, T, C = 20, 150, 128  # production GunPoint-scale feature geometry
L = 3  # distinct cotangents (total, nf-merged, s2t2s)


def timed(fn, *args, n_iter=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter * 1000.0


def main():
    cfg = PipelineConfig()
    fc = cfg.flow
    key = jax.random.PRNGKey(0)
    params = waveglow_init(key, fc.n_flows, C, fc.wn_channels, fc.wn_layers)

    def losses_fn(p, xa, xb):
        ta, tb = waveglow_forward_pair(p, xa, xb, fc.wn_channels, cfg.log_s_clamp)
        return jnp.stack([waveglow_loss(ta), waveglow_loss(tb)])

    res = {}
    for K in (1, 8):
        kk = jax.random.split(jax.random.PRNGKey(1), 2)
        if K == 1:
            xa = jax.random.normal(kk[0], (B, T, C))
            xb = jax.random.normal(kk[1], (B, T, C))
            f = losses_fn
        else:
            xa = jax.random.normal(kk[0], (K, B, T, C))
            xb = jax.random.normal(kk[1], (K, B, T, C))
            f = jax.vmap(losses_fn, in_axes=(None, 0, 0))

        # cotangent seeds shaped like f's output
        ct_shape = (2,) if K == 1 else (K, 2)
        seeds = [
            jnp.broadcast_to(jnp.asarray(s, jnp.float32), ct_shape)
            for s in ([1.0, 1.0], [1.0, 0.0], [0.0, 1.0])
        ][:L]
        stacked = jnp.stack(seeds)  # (L, ...) seed matrix

        @jax.jit
        def seq_pulls(p, xa, xb, seeds_tuple):
            _, pb = jax.vjp(lambda q: f(q, xa, xb), p)
            return [pb(s)[0] for s in seeds_tuple]

        @jax.jit
        def batched_pull(p, xa, xb, stacked):
            _, pb = jax.vjp(lambda q: f(q, xa, xb), p)
            return jax.vmap(lambda s: pb(s)[0])(stacked)

        t_seq = timed(seq_pulls, params, xa, xb, tuple(seeds))
        t_bat = timed(batched_pull, params, xa, xb, stacked)
        # exactness: each batched slice must match its sequential pull
        g_seq = seq_pulls(params, xa, xb, tuple(seeds))
        g_bat = batched_pull(params, xa, xb, stacked)
        diffs = [
            max(
                float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(
                    jax.tree_util.tree_leaves(g_seq[i]),
                    [l[i] for l in jax.tree_util.tree_leaves(g_bat)],
                )
            )
            for i in range(L)
        ]
        res[f"k{K}"] = {
            "seq_3pulls_ms": round(t_seq, 3),
            "batched_pull_ms": round(t_bat, 3),
            "speedup": round(t_seq / t_bat, 3),
            "max_absdiff": max(diffs),
        }
        print(f"K={K}", res[f"k{K}"], flush=True)

    with open(RESULTS, "w") as fh:
        json.dump(res, fh, indent=2)


if __name__ == "__main__":
    main()
