"""HISTORICAL (round 4): the `xonly_pullbacks` knob this gated was DELETED
in round 5 after this sweep's 0/96 PASS was falsified by the very next
30-epoch K=16 run (the non-finite basin moved past the gate window) —
docs/DESIGN.md "GradNorm pullback knobs".  Kept as the record of why
finite stability gates cannot certify fp-schedule-sensitive knobs.

Original docstring follows.

Seed-controlled stability sweep for `xonly_pullbacks` at K=16 (VERDICT r3
item 3).

Round 3 parked `xonly_pullbacks` opt-in after runs 4/5 of the K=16 vmapped
sweep went non-finite at phase-5 epoch 5 (docs/DESIGN.md ledger: an
fp-schedule sensitivity amplified by RMSprop's first-step dynamics, not
wrong math — the kernel d/dx is bit-identical).  Open questions answered
here, on the real chip, same protocol as `multirun_scale.py` (p5 from init,
GunPoint scale):

  1. Is the K=16 non-finite basin reproducible across DATA seeds, or
     specific to pairs 4/5 of the original sweep?
  2. Does `log_s_clamp=2.0` (the flow's opt-in log-scale soft-clamp) tame it?

Grid: data_offset in {0, 100, 200} x log_s_clamp in {0.0, 2.0}, K=16,
xonly+merged ON, per-run finiteness checked after every epoch.  A cell row
records the first non-finite epoch per run (-1 = stayed finite).

ROUND-4 POSTSCRIPT — the 8-epoch window was too short.  The original run
of this sweep (8 epochs, 0/96 non-finite) prompted a default flip to ON;
the standard 30-epoch K=16 timing sweep under that default immediately
went non-finite (queue3 step 2) — the basin had moved past epoch 8, not
vanished.  The flip was reverted (docs/DESIGN.md "K=16 hazard") and the
default window here is now 30 epochs to match the sweep this gates.

Usage: python experiments/xonly_stability_sweep.py [epochs]
Writes experiments/results_xonly_stability.json.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from parity_fullscale import (  # noqa: E402
    C_S, C_T, N_CLS_S, N_CLS_T, T_S, T_T, get_pair,
)

RESULTS = os.path.join(HERE, "results_xonly_stability.json")
K = 16


def run_cell(data_offset: int, log_s_clamp: float, n_epochs: int):
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

    pairs = [
        {
            name: (np.transpose(v[0], (0, 2, 1)), v[1])
            for name, v in get_pair(data_offset + s).items()
        }
        for s in range(K)
    ]
    data = MultiRunData.from_pairs(pairs)
    cfg = dataclasses.replace(
        PipelineConfig(),
        xonly_pullbacks=True, merged_pullbacks=True, log_s_clamp=log_s_clamp,
    )
    pipe = StyleTransferPipeline(C_T, T_T, N_CLS_T, C_S, T_S, N_CLS_S, cfg)
    mpipe = MultiRunStylePipeline(pipe)
    states = mpipe.init_states(list(range(K)))
    skeys = jax.vmap(jax.random.PRNGKey)(jnp.arange(K) + 1)
    sks = jax.vmap(lambda key: jax.random.split(key)[1])(skeys)

    first_bad = np.full(K, -1, np.int32)
    for e in range(n_epochs):
        states, m = mpipe._p5(
            states, *data.t_train, *data.s_train, sks, jnp.asarray(e)
        )
        # per-run finiteness over params (leading K axis)
        finite = None
        for leaf in jax.tree_util.tree_leaves(states["params"]):
            f = jnp.all(jnp.isfinite(leaf.reshape(K, -1)), axis=1)
            finite = f if finite is None else finite & f
        finite = np.asarray(finite)
        newly_bad = (~finite) & (first_bad < 0)
        first_bad[newly_bad] = e
    return {
        "first_nonfinite_epoch_per_run": first_bad.tolist(),
        "n_nonfinite": int(np.sum(first_bad >= 0)),
        "epochs": n_epochs,
    }


def main():
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    rows = json.load(open(RESULTS)) if os.path.exists(RESULTS) else {}
    for off in (0, 100, 200):
        for clamp in (0.0, 2.0):
            key = f"off{off}_clamp{clamp:g}"
            if key in rows:
                continue
            rows[key] = run_cell(off, clamp, n_epochs)
            print(key, rows[key], flush=True)
            with open(RESULTS, "w") as f:
                json.dump(rows, f, indent=2)
    bad = {k: v["n_nonfinite"] for k, v in rows.items() if isinstance(v, dict)}
    rows["_summary"] = {
        "n_nonfinite_by_cell": bad,
        "any_nonfinite": any(v > 0 for v in bad.values()),
    }
    with open(RESULTS, "w") as f:
        json.dump(rows, f, indent=2)
    print(json.dumps(rows["_summary"], indent=2))


if __name__ == "__main__":
    raise SystemExit(
        "archived driver: the xonly_pullbacks knob was deleted in round 5 "
        "(docs/DESIGN.md); results_*.json files are the historical record")

    main()
