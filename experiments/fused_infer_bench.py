"""Measure the fused conv+foldedBN+ReLU inference epilogue vs the unfused
eval path, on the real TPU, at GunPoint scale and the reference main.py's
shapes.  Writes results_fused_infer.json with per-batch predict latency and
series/sec for both paths (accept/decline evidence for docs/DESIGN.md).

Usage: python experiments/fused_infer_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from feature_level_style_transfer_for_tsc_tpu.config import PipelineConfig
from feature_level_style_transfer_for_tsc_tpu.train.pipeline import StyleTransferPipeline

B = 20
SCALES = {
    "gunpoint": dict(t=(1, 150, 2), s=(1, 150, 5)),
    "mainpy": dict(t=(2, 1152, 2), s=(1, 1751, 4)),
}


def time_fn(fn, *args, iters=50):
    jax.block_until_ready(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    results = {}
    for name, shapes in SCALES.items():
        (c_t, t_t, n_t) = shapes["t"]
        (c_s, t_s, n_s) = shapes["s"]
        pipe = StyleTransferPipeline(c_t, t_t, n_t, c_s, t_s, n_s, PipelineConfig())
        state = pipe.init_state(jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.default_rng(0).standard_normal((B, t_t, c_t), np.float32))

        @jax.jit
        def predict_unfused(params, mstate, xb):
            feat, _ = pipe.target_features(params, mstate, xb, False)
            logits, _, _ = pipe.classify_target(params, mstate, feat, False)
            return logits

        fused_ms = time_fn(
            lambda p, m, xb: pipe._predict_target(p, m, xb),
            state["params"], state["mstate"], x,
        ) * 1e3
        unfused_ms = time_fn(predict_unfused, state["params"], state["mstate"], x) * 1e3
        results[name] = {
            "fused_ms_per_batch": round(fused_ms, 3),
            "unfused_ms_per_batch": round(unfused_ms, 3),
            "fused_series_per_sec": round(B / fused_ms * 1e3, 1),
            "unfused_series_per_sec": round(B / unfused_ms * 1e3, 1),
            "speedup": round(unfused_ms / fused_ms, 3),
        }
        print(name, results[name], flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results_fused_infer.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
