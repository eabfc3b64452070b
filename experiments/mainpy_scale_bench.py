"""Throughput at the reference main.py's own shapes.

The reference's hard-coded pair (main.py:7-10) is SelfRegulationSCP2
(multivariate, C=2-ish EEG, T=1152) <- EthanolLevel (univariate, T=1751).
This measures our full style-transfer train step at those shapes — the
long-series regime where the Pallas conv heuristic hands layers back to
XLA and the CDAN random matrix is ~236MB.

Usage: python experiments/mainpy_scale_bench.py
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
import optax

from feature_level_style_transfer_for_tsc_tpu.config import PipelineConfig
from feature_level_style_transfer_for_tsc_tpu.train.pipeline import StyleTransferPipeline

B = 20
C_T, T_T, N_T = 2, 1152, 2     # SelfRegulationSCP2-like
C_S, T_S, N_S = 1, 1751, 4     # EthanolLevel-like
STEPS = 5


def main():
    pipe = StyleTransferPipeline(C_T, T_T, N_T, C_S, T_S, N_S, PipelineConfig())
    state = pipe.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.standard_normal((B, T_T, C_T)), jnp.float32)
    xs = jnp.asarray(rng.standard_normal((B, T_S, C_S)), jnp.float32)
    yt = jnp.zeros((B,), jnp.int32)
    ys = jnp.zeros((B,), jnp.int32)
    names = tuple(pipe.tx)

    def loss_fn(params, mstate, consts, r):
        losses, new_m, _ = pipe._phase5_forward(params, mstate, consts, xt, yt, xs, ys, r)
        return sum(losses.values()), new_m

    def step(carry, r):
        params, mstate, opt = carry
        grads, new_m = jax.grad(loss_fn, has_aux=True)(params, mstate, state["consts"], r)
        new_p, new_o = dict(params), dict(opt)
        for n in names:
            upd, new_o[n] = pipe.tx[n].update(grads[n], opt[n], params[n])
            new_p[n] = optax.apply_updates(params[n], upd)
        return (new_p, new_m, new_o), None

    @jax.jit
    def run(carry, rs):
        return jax.lax.scan(step, carry, rs)[0]

    carry = (state["params"], state["mstate"], state["opt"])
    rs = jax.random.split(jax.random.PRNGKey(1), STEPS)
    carry = run(carry, rs)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    carry = run(carry, jax.random.split(jax.random.PRNGKey(2), STEPS))
    jax.block_until_ready(carry)
    dt = (time.perf_counter() - t0) / STEPS
    out = {
        "shapes": {"target": [C_T, T_T, N_T], "source": [C_S, T_S, N_S], "batch": B},
        "step_ms": round(dt * 1e3, 2),
        "series_per_sec": round(2 * B / dt, 2),
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "results_mainpy_scale.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
