"""Drill into the vmapped flow inflation (results_vmap_forward_microprofile:
flow_fwd_pair 11.6x, flow_infer 3.6x at K=8 while everything else is flat).

Times each flow internal under jit(vmap(.)) with per-run params, K in {1,8}:

  slogdet3   : the 3 inv-1x1 slogdets alone (batched LU under vmap)
  inv3       : the 3 jnp.linalg.inv calls alone (infer path)
  mix3       : the 3 HIGHEST-precision (B*T, C) @ (C, C) channel mixings
  wn1        : ONE wn_apply (8 dilated convs + gates + res/skip 1x1s)
  wn1_im2col : same with FLSTTSC_CONV_IMPL=im2col
  full       : waveglow_forward + loss (the measured offender, for scale)

Usage: python experiments/vmap_flow_internals.py [K ...]
Writes experiments/results_vmap_flow_internals.json.
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
from feature_level_style_transfer_for_tsc_tpu.models import flow as F  # noqa: E402
from feature_level_style_transfer_for_tsc_tpu.train.pipeline import (  # noqa: E402
    StyleTransferPipeline,
)

B = 40  # pair-batched size as in _phase5_forward
RESULTS = os.path.join(HERE, "results_vmap_flow_internals.json")


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
    pipe = StyleTransferPipeline(1, 150, 4, 1, 150, 4, PipelineConfig())
    state = pipe.init_state(jax.random.PRNGKey(0))
    nf = state["params"]["nf"]
    wn_ch = pipe.config.flow.wn_channels
    c = pipe.feat_channels - pipe.feat_channels % 2
    print(f"feat_channels={pipe.feat_channels} wn_channels={wn_ch}", flush=True)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (B, 150, c))
    xh = x[..., : c // 2]

    def slogdet3(p, xx):
        return sum(jnp.linalg.slogdet(ci["weight"])[1] for ci in p["convinv"])

    def inv3(p, xx):
        return sum(jnp.sum(jnp.linalg.inv(ci["weight"])) for ci in p["convinv"])

    def mix3(p, xx):
        y = xx
        for ci in p["convinv"]:
            y = jnp.matmul(y, ci["weight"].T, precision=jax.lax.Precision.HIGHEST)
        return y

    def wn1(p, xx):
        return F.wn_apply(p["wn"][0], xx[..., : c // 2], wn_ch)

    def full(p, xx):
        return F.waveglow_loss(F.waveglow_forward(p, xx, wn_ch))

    pieces = [
        ("slogdet3", slogdet3, x),
        ("inv3", inv3, x),
        ("mix3", mix3, x),
        ("wn1", wn1, x),
        ("full", full, x),
    ]

    rows = {}
    for k in ks:
        pk = stackk(nf, k)
        row = {}
        os.environ["FLSTTSC_WN_FUSED"] = "0"
        for name, fn, arg in pieces:
            os.environ["FLSTTSC_CONV_IMPL"] = "conv"
            f = jax.jit(jax.vmap(fn))
            row[f"{name}_ms"] = round(1e3 * timeit(f, pk, jnp.stack([arg] * k)), 3)
            print(f"k={k} {name}: {row[f'{name}_ms']}", flush=True)
        # fused single-kernel WN (ops/wn_fused.py)
        os.environ["FLSTTSC_WN_FUSED"] = "1"
        for name, fn in (("wn1_fused", wn1), ("full_fused", full)):
            f = jax.jit(jax.vmap(fn))
            row[f"{name}_ms"] = round(1e3 * timeit(f, pk, jnp.stack([x] * k)), 3)
            print(f"k={k} {name}: {row[f'{name}_ms']}", flush=True)
        f = jax.jit(jax.vmap(jax.value_and_grad(full)))
        row["full_vg_fused_ms"] = round(1e3 * timeit(f, pk, jnp.stack([x] * k)), 3)
        print(f"k={k} full_vg_fused: {row['full_vg_fused_ms']}", flush=True)
        os.environ["FLSTTSC_WN_FUSED"] = "0"
        for impl in ("im2col", "pallas"):
            os.environ["FLSTTSC_CONV_IMPL"] = impl
            f = jax.jit(jax.vmap(wn1))
            row[f"wn1_{impl}_ms"] = round(
                1e3 * timeit(f, stackk(nf, k), jnp.stack([x] * k)), 3
            )
            print(f"k={k} wn1_{impl}: {row[f'wn1_{impl}_ms']}", flush=True)
            f = jax.jit(jax.vmap(full))
            row[f"full_{impl}_ms"] = round(
                1e3 * timeit(f, stackk(nf, k), jnp.stack([x] * k)), 3
            )
            print(f"k={k} full_{impl}: {row[f'full_{impl}_ms']}", flush=True)
        # grad too: the multirun regime differentiates the flow every step
        for impl in ("conv", "pallas"):
            os.environ["FLSTTSC_CONV_IMPL"] = impl
            f = jax.jit(jax.vmap(jax.value_and_grad(full)))
            row[f"full_vg_{impl}_ms"] = round(
                1e3 * timeit(f, stackk(nf, k), jnp.stack([x] * k)), 3
            )
            print(f"k={k} full_vg_{impl}: {row[f'full_vg_{impl}_ms']}", flush=True)
        os.environ["FLSTTSC_CONV_IMPL"] = "conv"
        rows[f"k{k}"] = row
    if len(ks) > 1 and "k1" in rows:
        for k in ks[1:]:
            rows[f"k{k}_ratio_vs_k1"] = {
                kk: round(rows[f"k{k}"][kk] / max(rows["k1"][kk], 1e-9), 2)
                for kk in rows["k1"]
            }
    with open(RESULTS, "w") as f:
        json.dump(rows, f, indent=2)
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
