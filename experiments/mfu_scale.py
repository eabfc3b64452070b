"""Production-step MFU + bf16-knob measurement at two scales.

Times `StyleTransferPipeline.phase5_epoch` (the production step: GradNorm
pullbacks, staged adversarial weights, 11 optimizers, clipping) at

  * GunPoint scale (univariate T=150 pair) and
  * the reference main.py's own shapes (SelfRegulationSCP2-like T=1152 <-
    EthanolLevel-like T=1751, main.py:7-10),

each with compute_dtype float32 and bfloat16 (the OS-CNN conv path knob,
config.py), reporting XLA cost-analysis FLOPs per step and the achieved
fraction of the v5e's 197e12 bf16 peak.  Writes results_mfu.json.

Usage: python experiments/mfu_scale.py
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
NB = 5  # batches per timed epoch
V5E_PEAK_FLOPS = 197e12
SCALES = {
    "gunpoint": dict(t=(1, 150, 2), s=(1, 150, 5)),
    "mainpy": dict(t=(2, 1152, 2), s=(1, 1751, 4)),
}


def measure(scale, dtype):
    (c_t, t_t, n_t), (c_s, t_s, n_s) = SCALES[scale]["t"], SCALES[scale]["s"]
    cfg = PipelineConfig(compute_dtype=dtype)
    pipe = StyleTransferPipeline(c_t, t_t, n_t, c_s, t_s, n_s, cfg)
    state = pipe.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.standard_normal((NB, B, t_t, c_t)), jnp.float32)
    xs = jnp.asarray(rng.standard_normal((NB, B, t_s, c_s)), jnp.float32)
    yt = jnp.zeros((NB, B), jnp.int32)
    ys = jnp.zeros((NB, B), jnp.int32)
    epoch = jnp.zeros((), jnp.int32)

    new_state, metrics = pipe.phase5_epoch(state, xt, yt, xs, ys, epoch)
    jax.block_until_ready(new_state["params"])
    assert all(bool(jnp.all(jnp.isfinite(v))) for v in metrics.values()), metrics

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        new_state, _ = pipe.phase5_epoch(state, xt, yt, xs, ys, epoch)
        jax.block_until_ready(new_state["params"])
    dt = (time.perf_counter() - t0) / reps / NB

    flops = None
    try:
        cost = (
            type(pipe).phase5_epoch
            .lower(pipe, state, xt, yt, xs, ys, epoch)
            .compile()
            .cost_analysis()
        )
        if cost and "flops" in cost:
            flops = float(cost["flops"]) / NB
    except Exception:
        pass
    rec = {
        "step_ms": round(dt * 1e3, 2),
        "series_per_sec": round(2 * B / dt, 1),
    }
    if flops:
        rec["flops_per_step"] = round(flops)
        rec["achieved_tflops"] = round(flops / dt / 1e12, 2)
        rec["mfu_vs_bf16_peak"] = round(flops / dt / V5E_PEAK_FLOPS, 5)
    return rec


def main():
    out = {}
    for scale in SCALES:
        for dtype in ("float32", "bfloat16"):
            key = f"{scale}_{dtype}"
            out[key] = measure(scale, dtype)
            print(key, out[key], flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "results_mfu.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
