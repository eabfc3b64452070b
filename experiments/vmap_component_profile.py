"""Localize the vmapped-multirun slowdown: time each hot component at
K in {1, 8} with PER-RUN weights (the multirun regime, train/multirun.py).

Suspicion: under vmap with batched weights, XLA lowers conv_general_dilated
to grouped conv (feature/batch groups), which the TPU backend handles far
worse than the batched matmuls the rest of the model becomes.  This measures
value-and-grad wall per component at GunPoint scale (the bench.py pipeline):

  * os_extractor: masked omni-scale res extractor (Pallas fwd, XLA-conv VJP)
  * flow:         full 3-flow WaveGlow forward + NLL (24 dilated convs)

Usage: python experiments/vmap_component_profile.py [K ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from feature_level_style_transfer_for_tsc_tpu.config import PipelineConfig  # noqa: E402
from feature_level_style_transfer_for_tsc_tpu.models import flow as flow_mod  # noqa: E402
from feature_level_style_transfer_for_tsc_tpu.models.os_cnn import (  # noqa: E402
    os_cnn_res_apply,
)
from feature_level_style_transfer_for_tsc_tpu.train.pipeline import (  # noqa: E402
    StyleTransferPipeline,
)

B, T_T, C_T, N_T = 20, 150, 2, 2  # GunPoint-ish (bench.py scale)
T_S, C_S, N_S = 120, 1, 3
RESULTS = os.path.join(HERE, "results_vmap_component_profile.json")


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def stack(tree, k, jitter=1e-3):
    return jax.tree_util.tree_map(
        lambda l: jnp.stack([l + jitter * i for i in range(k)]), tree
    )


def main():
    ks = [int(a) for a in sys.argv[1:]] or [1, 8]
    key = jax.random.PRNGKey(0)
    pipe = StyleTransferPipeline(C_T, T_T, N_T, C_S, T_S, N_S, PipelineConfig())
    state = pipe.init_state(key)
    params, mstate = state["params"], state["mstate"]
    x = jax.random.normal(key, (B, T_T, C_T))
    feat0, _ = os_cnn_res_apply(
        params["t_ext"], mstate["t_ext"], pipe.t_ext_masks, x, True
    )
    feat0 = feat0[..., : pipe.nf_channels] if hasattr(pipe, "nf_channels") else feat0
    c_feat = pipe.feat_channels - pipe.feat_channels % 2
    feat = jax.random.normal(key, (B, T_T, c_feat))

    def ext_loss(p, st, xx):
        y, _ = os_cnn_res_apply(p, st, pipe.t_ext_masks, xx, True)
        return jnp.sum(y * y)

    ext_vg = jax.value_and_grad(ext_loss)

    def flow_loss(p, f):
        out = flow_mod.waveglow_forward(p, f, pipe.config.flow.wn_channels)
        return flow_mod.waveglow_loss(out)

    flow_vg = jax.value_and_grad(flow_loss)
    nf_params = params["nf"]
    if feat.shape[-1] != c_feat:
        feat = feat[..., :c_feat]

    rows = {}
    for impl in ("conv", "im2col"):
        os.environ["FLSTTSC_CONV_IMPL"] = impl
        for k in ks:
            row = {}
            f_ext = jax.jit(jax.vmap(ext_vg))
            row["os_extractor_vg_ms"] = 1e3 * timeit(
                f_ext, stack(params["t_ext"], k), stack(mstate["t_ext"], k),
                jnp.stack([x] * k),
            )
            f_flow = jax.jit(jax.vmap(flow_vg))
            row["flow_vg_ms"] = 1e3 * timeit(
                f_flow, stack(nf_params, k), jnp.stack([feat] * k)
            )
            rows[f"{impl}_k{k}"] = {kk: round(v, 3) for kk, v in row.items()}
            print(f"{impl} k={k}: {rows[f'{impl}_k{k}']}", flush=True)

    for impl in ("conv", "im2col"):
        if f"{impl}_k1" in rows and len(ks) > 1:
            for k in ks[1:]:
                rows[f"{impl}_k{k}_per_run_slowdown"] = {
                    kk: round(rows[f"{impl}_k{k}"][kk] / (k * rows[f"{impl}_k1"][kk]), 2)
                    for kk in rows[f"{impl}_k1"]
                }
    with open(RESULTS, "w") as f:
        json.dump(rows, f, indent=2)
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
