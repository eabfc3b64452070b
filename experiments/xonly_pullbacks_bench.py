"""HISTORICAL (round 3/4): the `xonly_pullbacks` knob this benchmarked was
DELETED in round 5 (docs/DESIGN.md "GradNorm pullback knobs") — this
driver no longer runs; results_xonly_pullbacks.json is the archived
measurement that justified merged_pullbacks (still live) and the deleted
knob.

Original docstring follows.

Measure the GradNorm-pullback knobs on the v5e.

The phase-5 step takes SIX one-hot pullbacks of one forward
(results_vmap_phase5_breakdown.json: at K=8 the 6-pull pattern costs
134.7 ms vs 18.4 ms for a single pullback — it IS the step).  Two exact
optimizations attack it:

  * config.xonly_pullbacks — the trunk pulls route through the fused WN's
    input-grad-only backward (ops/wn_fused._wn_core_x): XLA cannot DCE the
    weight-grad gemms inside the opaque kernel, the flag drops them.
  * config.merged_pullbacks — t_nf/s_nf (and t_c/s_c) pulls merge into one
    backward each (cross-trunk grads structurally zero): 6 backwards -> 4.

Both are bit-equivalent to the default (tests/test_multirun.py).  This
times the production `phase5_epoch` (1 batch/epoch, GunPoint scale, like
bench.py) across all four combinations, unvmapped and vmapped K=8 (the
multirun chip-filling regime).  Verdict goes to docs/DESIGN.md and the
winning combination becomes the default.

Usage: python experiments/xonly_pullbacks_bench.py [K ...]
Writes experiments/results_xonly_pullbacks.json.
"""

from __future__ import annotations

import dataclasses
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
from feature_level_style_transfer_for_tsc_tpu.train.pipeline import (  # noqa: E402
    StyleTransferPipeline,
)

B = 20
RESULTS = os.path.join(HERE, "results_xonly_pullbacks.json")


def timeit(fn, *args, n=30):
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
    key = jax.random.PRNGKey(1)
    xt = jax.random.normal(key, (B, 150, 1))
    yt = jnp.zeros((B,), jnp.int32)
    xs = jax.random.normal(key, (B, 150, 1))
    ys = jnp.zeros((B,), jnp.int32)

    combos = [
        ("base", False, False),
        ("xonly", True, False),
        ("merged", False, True),
        ("both", True, True),
    ]
    rows = {}
    metrics_by_tag = {}
    for tag, xonly, merged in combos:
        cfg = dataclasses.replace(
            PipelineConfig(), xonly_pullbacks=xonly, merged_pullbacks=merged
        )
        pipe = StyleTransferPipeline(1, 150, 4, 1, 150, 4, cfg)
        state = pipe.init_state(jax.random.PRNGKey(0))

        def epoch(st):
            _, metrics = pipe.phase5_epoch(
                st, xt[None], yt[None], xs[None], ys[None], jnp.asarray(0)
            )
            return metrics

        for k in ks:
            f = jax.jit(jax.vmap(epoch)) if k > 1 else jax.jit(epoch)
            arg = stackk(state, k) if k > 1 else state
            rows[f"{tag}_k{k}_epoch_ms"] = round(1e3 * timeit(f, arg), 3)
            print(f"{tag} k={k}: {rows[f'{tag}_k{k}_epoch_ms']} ms", flush=True)
        metrics_by_tag[tag] = {
            kk: np.asarray(v).tolist() for kk, v in jax.device_get(epoch(state)).items()
        }

    for tag, _, _ in combos[1:]:
        for k in ks:
            rows[f"{tag}_k{k}_speedup"] = round(
                rows[f"base_k{k}_epoch_ms"] / rows[f"{tag}_k{k}_epoch_ms"], 4
            )
    # on-device numerics cross-check: GradNorm weights (consume the trunk
    # norms) must match the base to float noise under every combo
    gw_b = np.asarray(metrics_by_tag["base"]["gradnorm_w_s"])
    for tag, _, _ in combos[1:]:
        gw = np.asarray(metrics_by_tag[tag]["gradnorm_w_s"])
        rows[f"{tag}_gradnorm_w_s_max_absdiff"] = float(np.max(np.abs(gw - gw_b)))
    rows["note"] = "phase5_epoch, GunPoint scale, one real v5e chip"
    with open(RESULTS, "w") as f:
        json.dump(rows, f, indent=2)
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    raise SystemExit(
        "archived driver: the xonly_pullbacks knob was deleted in round 5 "
        "(docs/DESIGN.md); results_*.json files are the historical record")

    main()
