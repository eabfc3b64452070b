"""Kernel-frontier measurement: inv-1x1 slogdet batching (VERDICT r2 #8).

SURVEY §7 lists "inv-1x1 conv + slogdet" as a candidate fused kernel.  The
flows are SEQUENTIAL (flow k consumes flow k-1's output), so their 1x1
matmuls cannot be batched into one gemm; what CAN be hoisted is the
data-independent part — each flow's ``slogdet(W_k)`` (and, for the infer
direction, ``inv(W_k)``) depends only on parameters, so the 3 per-flow
LU factorizations can run as ONE batched [n_flows, C, C] factorization at
the top of the traversal instead of 3 interleaved ones.

This measures the full phase-5 production step (the only consumer that
matters) with the current per-flow form vs a batched-slogdet variant of
`waveglow_forward`, and ledgers the verdict in docs/DESIGN.md either way.

Usage: python experiments/inv1x1_frontier.py
Writes experiments/results_inv1x1_frontier.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

RESULTS = os.path.join(HERE, "results_inv1x1_frontier.json")
TIMED = 50


def main():
    import jax
    import jax.numpy as jnp

    from feature_level_style_transfer_for_tsc_tpu.config import PipelineConfig
    from feature_level_style_transfer_for_tsc_tpu.data.synthetic import make_arrays
    from feature_level_style_transfer_for_tsc_tpu.data.batching import epoch_batches
    from feature_level_style_transfer_for_tsc_tpu.models import flow as flow_mod
    from feature_level_style_transfer_for_tsc_tpu.train.pipeline import (
        StyleTransferPipeline,
    )

    # GunPoint-scale pair, the bench.py production-step shape
    pipe = StyleTransferPipeline(1, 150, 4, 1, 150, 4, PipelineConfig())
    state = pipe.init_state(jax.random.PRNGKey(0))
    xt_, yt_ = make_arrays(20, 1, 150, 4, seed=0)
    xs_, ys_ = make_arrays(20, 1, 150, 4, seed=1)
    lt = np.asarray([sorted(set(yt_)).index(v) for v in yt_])
    ls = np.asarray([sorted(set(ys_)).index(v) for v in ys_])
    # make_arrays is (N, C, T); the pipeline consumes channel-last (N, T, C)
    xt, yt = epoch_batches(np.transpose(xt_, (0, 2, 1)), lt, jax.random.PRNGKey(2), 20)
    xs, ys = epoch_batches(np.transpose(xs_, (0, 2, 1)), ls, jax.random.PRNGKey(3), 20)
    xt, yt, xs, ys = (jnp.asarray(a) for a in (xt, yt, xs, ys))

    def timed_step():
        st = jax.device_put(state)
        _, m = pipe.phase5_epoch(st, xt, yt, xs, ys, jnp.asarray(0))  # compile
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        cur = st
        for e in range(TIMED):
            cur, m = pipe.phase5_epoch(cur, xt, yt, xs, ys, jnp.asarray(e))
        jax.block_until_ready(m)
        return (time.perf_counter() - t0) / TIMED * 1e3  # ms/step (1 batch/epoch)

    baseline_ms = timed_step()

    # ---- batched-slogdet variant: one [n_flows,C,C] slogdet up front -------
    orig_forward = flow_mod.waveglow_forward

    def batched_forward(params, x, n_wn_ch, log_s_clamp=0.0, xgrad_only=False):
        n_flows = len(params["convinv"])
        ws = jnp.stack([params["convinv"][k]["weight"] for k in range(n_flows)])
        _, logdets = jnp.linalg.slogdet(ws)  # ONE batched LU for all flows
        b, t, _ = x.shape
        log_s_list, log_det_w_list = [], []
        audio = x
        for k in range(n_flows):
            w = params["convinv"][k]["weight"]
            audio = jnp.matmul(audio, w.T, precision=jax.lax.Precision.HIGHEST)
            log_det_w_list.append(b * t * logdets[k])
            n_half = audio.shape[-1] // 2
            audio_0, audio_1 = audio[..., :n_half], audio[..., n_half:]
            output = flow_mod.wn_apply(
                params["wn"][k], audio_0, n_wn_ch, xgrad_only=xgrad_only
            )
            bb = output[..., :n_half]
            log_s = flow_mod._soft_clamp(output[..., n_half:], log_s_clamp)
            audio_1, _ = flow_mod.affine_coupling_forward(audio_1, log_s, bb)
            log_s_list.append(log_s)
            audio = jnp.concatenate([audio_0, audio_1], axis=-1)
        return audio, log_s_list, log_det_w_list

    # patch the underlying forward (waveglow_forward_pair resolves it from
    # flow_mod at trace time) and rebuild the pipeline (fresh jit cache) so
    # phase5 traces the batched variant
    flow_mod.waveglow_forward = batched_forward
    try:
        pipe2 = StyleTransferPipeline(1, 150, 4, 1, 150, 4, PipelineConfig())
        st = jax.device_put(state)
        _, m = pipe2.phase5_epoch(st, xt, yt, xs, ys, jnp.asarray(0))
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        cur = st
        for e in range(TIMED):
            cur, m = pipe2.phase5_epoch(cur, xt, yt, xs, ys, jnp.asarray(e))
        jax.block_until_ready(m)
        variant_ms = (time.perf_counter() - t0) / TIMED * 1e3
    finally:
        flow_mod.waveglow_forward = orig_forward

    row = {
        "baseline_ms_per_step": round(baseline_ms, 3),
        "batched_slogdet_ms_per_step": round(variant_ms, 3),
        "speedup": round(baseline_ms / variant_ms, 4),
        "timed_steps": TIMED,
        "note": "production phase-5 step, GunPoint scale, one real v5e chip",
    }
    with open(RESULTS, "w") as f:
        json.dump(row, f, indent=2)
    print(json.dumps(row, indent=2))


if __name__ == "__main__":
    main()
