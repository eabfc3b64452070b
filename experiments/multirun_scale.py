"""Chip-filling scaling: K vmapped independent runs per program (VERDICT r2 #1).

A single reference-scale run is latency-bound (~1-2% MFU,
results_mfu.json); this measures aggregate phase-5 throughput and MFU when
K independent curriculum runs (seed sweep of the same pair) execute as ONE
vmapped program (train/multirun.py) for K in {1, 4, 8, 16}.

Per K: build K stacked GunPoint-scale pairs, warm up (compile + 1 epoch),
then time N phase-5 epochs steady-state.  FLOPs/step is the single-run
production-step count measured by bench.py (45.3 GFLOP) scaled by K.

Usage: python experiments/multirun_scale.py [K ...]
Writes experiments/results_multirun_scale.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from parity_fullscale import get_pair, N_TRAIN, T_T, C_T, N_CLS_T, T_S, C_S, N_CLS_S  # noqa: E402

_TAG = os.environ.get("FLSTTSC_MULTIRUN_TAG", "")
RESULTS = os.path.join(
    HERE, f"results_multirun_scale{'_' + _TAG if _TAG else ''}.json"
)
# bench.py round-2 measured FLOPs of one production phase-5 step at this scale
FLOPS_PER_STEP_1RUN = 45_335_661_773
V5E_BF16_PEAK = 394e12  # TPU v5e peak bf16 FLOP/s
TIMED_EPOCHS = 30


def main():
    import jax
    import jax.numpy as jnp

    from feature_level_style_transfer_for_tsc_tpu.config import PipelineConfig
    from feature_level_style_transfer_for_tsc_tpu.train.multirun import (
        MultiRunData,
        MultiRunStylePipeline,
    )
    from feature_level_style_transfer_for_tsc_tpu.train.pipeline import (
        StyleTransferPipeline,
    )

    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 8, 16]
    rows = {}
    if os.path.exists(RESULTS):
        rows = json.load(open(RESULTS))

    for k in ks:
        # get_pair is channel-first (N, C, T); MultiRunData wants (N, T, C)
        pairs = [
            {
                name: (np.transpose(v[0], (0, 2, 1)), v[1])
                for name, v in get_pair(seed).items()
            }
            for seed in range(k)
        ]
        data = MultiRunData.from_pairs(pairs)
        cfg = PipelineConfig()
        fp = os.environ.get("FLSTTSC_FAST_PULLBACKS", "")
        if fp:
            # measure the GradNorm-pullback knobs through this sweep: value
            # is a comma list of knobs (only "stacked" survives; "xonly" was
            # deleted in round 5, docs/DESIGN.md).  Tag the results file
            # with FLSTTSC_MULTIRUN_TAG so sweeps don't overwrite the
            # default's.
            import dataclasses

            knobs = {s.strip() for s in fp.split(",")}
            cfg = dataclasses.replace(
                cfg,
                merged_pullbacks=True,
                stacked_pullbacks="stacked" in knobs,
            )
        pipe = StyleTransferPipeline(C_T, T_T, N_CLS_T, C_S, T_S, N_CLS_S, cfg)
        mpipe = MultiRunStylePipeline(pipe)
        states = mpipe.init_states(list(range(k)))
        skeys = jax.vmap(jax.random.PRNGKey)(jnp.arange(k) + 1)
        sks = jax.vmap(lambda key: jax.random.split(key)[1])(skeys)
        nb = -(-N_TRAIN // pipe.config.batch_size)
        bs = pipe.config.batch_size

        # warm-up: compile + one epoch
        states, m = mpipe._p5(states, *data.t_train, *data.s_train, sks, jnp.asarray(0))
        jax.block_until_ready(m)

        t0 = time.perf_counter()
        for e in range(1, 1 + TIMED_EPOCHS):
            states, m = mpipe._p5(
                states, *data.t_train, *data.s_train, sks, jnp.asarray(e)
            )
        jax.block_until_ready(m)
        wall = time.perf_counter() - t0
        # force full materialization of the carried states — a wedged device
        # acking without executing (seen once, docs/DESIGN.md hazard ledger)
        # would otherwise produce physically impossible timings
        checksum = float(
            sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(states["params"]))
        )
        assert np.isfinite(checksum), f"k={k}: non-finite params after timing"
        print(f"k={k}: params checksum {checksum:.6g}", flush=True)

        steps = TIMED_EPOCHS * nb
        series_per_sec = k * steps * bs / wall
        mfu = k * steps * FLOPS_PER_STEP_1RUN / wall / V5E_BF16_PEAK
        rows[f"k{k}"] = {
            "n_runs": k,
            "epochs_timed": TIMED_EPOCHS,
            "batches_per_epoch": nb,
            "wall_s": round(wall, 3),
            "ms_per_step": round(1e3 * wall / steps, 3),
            "aggregate_series_per_sec": round(series_per_sec, 1),
            "mfu_vs_bf16_peak": round(mfu, 5),
            "speedup_vs_k1": None,  # filled below
        }
        print(f"k={k}: {rows[f'k{k}']}", flush=True)

    if "k1" in rows:
        base = rows["k1"]["aggregate_series_per_sec"]
        for key in rows:
            rows[key]["speedup_vs_k1"] = round(
                rows[key]["aggregate_series_per_sec"] / base, 2
            )
    with open(RESULTS, "w") as f:
        json.dump(rows, f, indent=2)
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
