"""Break down the vmapped phase-5 step at K in {1,8}: which sub-function
inflates under vmap with per-run params (train/multirun.py regime)?

Pieces timed (all jit(vmap(...)), GunPoint scale like bench.py):
  * fwd:      _phase5_forward (all losses, no grads)
  * fwd_vjp:  value + ONE pullback of the scalar total (the main backward)
  * fwd_vjp6: value + the 6 one-hot pullbacks of phase5_epoch's GradNorm
              pattern (total + 2 t-losses + 3 s-losses, DCE-seeded)
  * epoch:    full phase5_epoch, 1 batch (adds GradNorm closed form, the
              11 optimizers, WGAN clipping, schedulers, lax.scan)

Usage: python experiments/vmap_phase5_breakdown.py [K ...]
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
from feature_level_style_transfer_for_tsc_tpu.train.pipeline import (  # noqa: E402
    StyleTransferPipeline,
)

B = 20
RESULTS = os.path.join(HERE, "results_vmap_phase5_breakdown.json")


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
    key = jax.random.PRNGKey(1)
    xt = jax.random.normal(key, (B, 150, 1))
    yt = jnp.zeros((B,), jnp.int32)
    xs = jax.random.normal(key, (B, 150, 1))
    ys = jnp.zeros((B,), jnp.int32)
    rng = jax.random.PRNGKey(2)

    def fwd(st, k_):
        losses, _, _ = pipe._phase5_forward(
            st["params"], st["mstate"], st["consts"], xt, yt, xs, ys, k_
        )
        return losses

    def fwd_vjp(st, k_):
        def total(p):
            losses, _, _ = pipe._phase5_forward(
                p, st["mstate"], st["consts"], xt, yt, xs, ys, k_
            )
            return sum(jnp.sum(v) for v in losses.values())

        return jax.value_and_grad(total)(st["params"])[0]

    def fwd_vjp6(st, k_):
        def all_losses(p):
            losses, _, _ = pipe._phase5_forward(
                p, st["mstate"], st["consts"], xt, yt, xs, ys, k_
            )
            total = sum(jnp.sum(v) for v in losses.values())
            return jnp.stack(
                [total, losses["t_nf"], losses["t_c"], losses["s_nf"],
                 losses["s_c"], losses["s2t2s_c"]]
            )

        vec, pullback = jax.vjp(all_losses, st["params"])
        pulls = [pullback(jnp.asarray(np.eye(6, dtype=np.float32)[i]))[0]
                 for i in range(6)]
        return vec, jax.tree_util.tree_map(lambda *ls: sum(ls), *pulls)

    def epoch(st):
        new_st, metrics = pipe.phase5_epoch(
            st, xt[None], yt[None], xs[None], ys[None], jnp.asarray(0)
        )
        return metrics

    rows = {}
    for k in ks:
        stk = stackk(state, k)
        rngs = jnp.stack([rng] * k)
        row = {}
        for name, fn in (("fwd", fwd), ("fwd_vjp", fwd_vjp), ("fwd_vjp6", fwd_vjp6)):
            f = jax.jit(jax.vmap(fn))
            row[f"{name}_ms"] = round(1e3 * timeit(f, stk, rngs), 3)
        f = jax.jit(jax.vmap(epoch))
        row["epoch_ms"] = round(1e3 * timeit(f, stk), 3)
        rows[f"k{k}"] = row
        print(f"k={k}: {row}", flush=True)

    if len(ks) > 1 and "k1" in rows:
        for k in ks[1:]:
            rows[f"k{k}_time_ratio_vs_k1"] = {
                kk: round(rows[f"k{k}"][kk] / rows["k1"][kk], 2) for kk in rows["k1"]
            }
    with open(RESULTS, "w") as f:
        json.dump(rows, f, indent=2)
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
