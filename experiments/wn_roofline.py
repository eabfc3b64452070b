"""Roofline attribution for the fused WN kernel (ops/wn_fused.py).

The K-run multirun sweep still scales near-linearly in K even with the
fused kernel (results_multirun_scale.json: 1.25x aggregate at K=4), and the
bf16-MXU-operand knob moved it ~2% — contradicting the "MXU-bound" reading.
This probe settles where the kernel's time actually goes:

  * exact MXU FLOP counts enumerated from the kernel's own gemm list;
  * timings at K in {1, 8} for fwd and value+grad of the 3-flow NLL;
  * trace-time ablations (FLSTTSC_WN_ABLATE, diagnostics only) that remove
    (a) the tanh*sigmoid gates  -> VPU transcendental share,
    (b) the tap masks           -> VPU mask/where share,
    (c) the cond projection     -> 2 gemms/layer share,
  * f32 vs bf16 MXU operands at each point.

Effective TFLOP/s uses the FULL (un-ablated) FLOP count for ablated rows so
the delta reads directly as time removed.

Usage: python experiments/wn_roofline.py [K ...]
Writes experiments/results_wn_roofline.json.
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
from feature_level_style_transfer_for_tsc_tpu.models import flow as F  # noqa: E402
from feature_level_style_transfer_for_tsc_tpu.train.pipeline import (  # noqa: E402
    StyleTransferPipeline,
)

B = 40
T = 150
RESULTS = os.path.join(HERE, "results_wn_roofline.json")


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


def wn_gemm_flops(rows: int, n_half: int, c: int, n_layers: int):
    """MXU FLOPs enumerated from _wn_fwd_kernel / _wn_bwd_kernel's gemms."""
    g = lambda m, k, n: 2 * m * k * n
    fwd = g(rows, n_half, c)  # start
    per_layer_fwd = (
        3 * g(rows, c, 2 * c)  # taps
        + g(rows, n_half, 2 * c)  # cond
        + g(rows, c, 2 * c)  # res/skip
    )
    fwd += n_layers * per_layer_fwd + g(rows, c, 2 * n_half)  # end
    bwd = g(rows, 2 * n_half, c)  # g_skip = g_y @ we.T
    per_layer_bwd = (
        3 * g(rows, c, 2 * c)  # tap recompute
        + g(rows, n_half, 2 * c)  # cond recompute
        + g(c, rows, 2 * c)  # gwr
        + g(rows, 2 * c, c)  # g_acts
        + 3 * g(c, rows, 2 * c)  # gwi taps
        + g(n_half, rows, 2 * c)  # gwc
        + g(rows, 2 * c, n_half)  # g_x cond
        + 3 * g(rows, 2 * c, c)  # tap_sum_t
    )
    bwd += n_layers * per_layer_bwd
    bwd += g(n_half, rows, c) + g(rows, c, n_half)  # gws + gx start
    bwd += g(c, rows, 2 * n_half)  # gwe (outside kernel)
    return fwd, fwd + bwd  # (fwd, value+grad incl. fwd)


def main():
    ks = [int(a) for a in sys.argv[1:]] or [1, 8]
    pipe = StyleTransferPipeline(1, T, 4, 1, T, 4, PipelineConfig())
    state = pipe.init_state(jax.random.PRNGKey(0))
    nf = state["params"]["nf"]
    wn_ch = pipe.config.flow.wn_channels
    n_layers = pipe.config.flow.wn_layers
    n_flows = pipe.config.flow.n_flows
    c_feat = pipe.feat_channels - pipe.feat_channels % 2
    n_half = c_feat // 2
    t8 = -(-T // 8) * 8
    rows = B * t8
    fwd_fl, vg_fl = wn_gemm_flops(rows, n_half, wn_ch, n_layers)
    meta = {
        "B": B, "T": T, "t8": t8, "rows": rows,
        "n_half": n_half, "wn_channels": wn_ch, "n_layers": n_layers,
        "n_flows": n_flows,
        "wn1_fwd_gflop": round(fwd_fl / 1e9, 3),
        "wn1_vg_gflop": round(vg_fl / 1e9, 3),
    }
    print(meta, flush=True)

    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (B, T, c_feat))

    def wn1(p, xx):
        return F.wn_apply(p["wn"][0], xx[..., :n_half], wn_ch)

    def full(p, xx):
        return F.waveglow_loss(F.waveglow_forward(p, xx, wn_ch))

    # the 3-flow full does n_flows wn_applies (+ 1x1 mixings + slogdets)
    full_fwd_fl = n_flows * fwd_fl
    full_vg_fl = n_flows * vg_fl

    os.environ["FLSTTSC_WN_FUSED"] = "1"
    rows_out = {"meta": meta}
    for k in ks:
        pk = stackk(nf, k)
        xk = jnp.stack([x] * k)
        row = {}
        for mxu in ("f32", "bf16"):
            os.environ["FLSTTSC_WN_MXU"] = mxu
            for ab in ("", "nogate", "nomask", "nocond", "nogate,nomask,nocond"):
                os.environ["FLSTTSC_WN_ABLATE"] = ab
                tag = ab.replace(",", "+") if ab else "all"
                f = jax.jit(jax.vmap(lambda p, xx: jnp.sum(wn1(p, xx))))
                ms = 1e3 * timeit(f, pk, xk)
                row[f"wn1_fwd_{mxu}_{tag}_ms"] = round(ms, 3)
                row[f"wn1_fwd_{mxu}_{tag}_tflops"] = round(
                    k * fwd_fl / (ms / 1e3) / 1e12, 2
                )
                fv = jax.jit(jax.vmap(jax.value_and_grad(full)))
                ms = 1e3 * timeit(fv, pk, xk)
                row[f"vg_{mxu}_{tag}_ms"] = round(ms, 3)
                row[f"vg_{mxu}_{tag}_tflops"] = round(
                    k * full_vg_fl / (ms / 1e3) / 1e12, 2
                )
                print(f"k={k} {mxu} [{tag}] "
                      f"wn1_fwd={row[f'wn1_fwd_{mxu}_{tag}_ms']}ms "
                      f"vg={row[f'vg_{mxu}_{tag}_ms']}ms", flush=True)
        os.environ["FLSTTSC_WN_ABLATE"] = ""
        os.environ["FLSTTSC_WN_MXU"] = "f32"
        rows_out[f"k{k}"] = row
    with open(RESULTS, "w") as fh:
        json.dump(rows_out, fh, indent=2)
    print(json.dumps(rows_out, indent=2))


if __name__ == "__main__":
    main()
