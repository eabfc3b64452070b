"""Headline benchmark: feature-level style-transfer train step throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "series/sec", "vs_baseline": N}

The workload is the joint style-transfer training step (BASELINE.json's
headline: "flow style transfer + OS-CNN fwd/bwd") on a GunPoint-scale
synthetic pair (univariate, T=150, batch 20+20):

  extractors -> DimensionUnification -> CPC x2 -> WaveGlow fwd x2 (NLL) ->
  NoiseTransfer -> WaveGlow infer -> classify target/s2t/source ->
  CDAN + ProbTransfer/s2t2s CE + WGAN critic -> backward -> 11 opt steps.

GradNorm's weight machinery is excluded on BOTH sides (its extra backward
passes are implementation-specific); everything else in the reference's
phase-5 batch body (train_and_test.py:539-766) is exercised.

The baseline is the reference's OWN torch modules driven on CPU (imported
from /root/reference with CUDA placement no-op'ed — the reference publishes
no numbers, so the anchor is measured, per BASELINE.md).  Set
BENCH_SKIP_REFERENCE=1 to reuse the cached baseline number.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# ---- workload shapes (GunPoint-scale, reference BASELINE config 2) --------
B = 20
T_T, C_T, N_T = 150, 1, 2
T_S, C_S, N_S = 150, 1, 5
TIMED_STEPS = 10
WARMUP_STEPS = 3
CACHE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_baseline.json")


def _synth(seed, b, t, c, ncls):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, c, t)).astype(np.float32)
    x = (x - x.mean(-1, keepdims=True)) / (x.std(-1, keepdims=True) + 1e-8)
    y = rng.integers(0, ncls, b).astype(np.int64)
    return x, y


# ---------------------------------------------------------------------------
# Reference (torch, CPU) — drives the reference's own modules.
# ---------------------------------------------------------------------------

def measure_reference_cpu() -> float:
    import torch

    # CUDA placement -> no-op (reference hard-codes .cuda(); CPU-only torch)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if not hasattr(torch, "qr"):  # removed in newer torch; reference uses it
        torch.qr = lambda a: torch.linalg.qr(a)
    if not hasattr(np, "float"):  # removed in numpy>=1.24; C_DAN.py uses it
        np.float = float

    # stub sktime (absent from this image) — only its import is needed, the
    # bench feeds tensors directly
    import types

    if "sktime" not in sys.modules:
        sk = types.ModuleType("sktime")
        skd = types.ModuleType("sktime.datasets")
        skd.load_from_tsfile = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("not used in bench")
        )
        sk.datasets = skd
        sys.modules["sktime"] = sk
        sys.modules["sktime.datasets"] = skd

    sys.path.insert(0, "/root/reference")
    from OS_CNN.OS_CNN_Structure_build import generate_layer_parameter_list
    from OS_CNN.OS_CNN import OS_CNN_res, OS_CNN, layer_parameter_list_input_change
    from Simplified_NF_WaveGlow import WaveGlow, WaveGlowLoss
    from widgets import (
        DimensionUnification,
        ProbTransfer,
        NoiseTransfer,
        AdversarialNetworkforCDAN,
        FeatureDiscriminatorforSource,
        wgan_loss,
    )
    from C_DAN import RandomLayer, CDAN
    from Comparison.SLARDA.train import CPC

    # build exactly like train_and_test.py:38-79
    budgets_t = [8 * 128 * C_T, 5 * 128 * 256 + 2 * 256 * 128]
    budgets_s = [8 * 128 * C_S, 5 * 128 * 256 + 2 * 256 * 128]
    rf_t = min(int(T_T / 4), 89)
    rf_s = min(int(T_S / 4), 89)
    lpl_t = generate_layer_parameter_list(1, rf_t, budgets_t, C_T)
    lpl_s = generate_layer_parameter_list(1, rf_s, budgets_s, C_S)
    t_ext = OS_CNN_res(lpl_t)
    feat_ch = sum(p[1] for p in lpl_t[-1])
    cls_lpl = layer_parameter_list_input_change(lpl_t, feat_ch)
    t_cls = OS_CNN(cls_lpl, N_T)
    s_ext = OS_CNN_res(lpl_s)
    s_feat_ch = sum(p[1] for p in lpl_s[-1])
    dim_uni = DimensionUnification(s_feat_ch, feat_ch, T_S, T_T)
    s_cls = OS_CNN(cls_lpl, N_S)
    prob_trans = ProbTransfer(t_cls.length_before_classification)
    nf = WaveGlow(3, feat_ch, 120)
    noise_mix = NoiseTransfer(feat_ch, T_T, with_nvidia=False)
    nf_loss = WaveGlowLoss()
    rand_layer = RandomLayer([feat_ch * T_T, N_T], with_nvidia=False)
    ad_net = AdversarialNetworkforCDAN(1024, 1024)
    feat_disc = FeatureDiscriminatorforSource(t_cls.length_before_classification)
    cpc = CPC(feat_ch, 64, T_T // 2)
    ce = torch.nn.CrossEntropyLoss()

    mods = [t_ext, t_cls, s_ext, dim_uni, s_cls, prob_trans, nf, noise_mix, ad_net, feat_disc, cpc]
    for m in mods:
        m.train()
    opts = [torch.optim.RMSprop(m.parameters(), lr=1e-3) for m in
            (t_ext, t_cls, s_ext, dim_uni, s_cls, prob_trans, nf, noise_mix, ad_net, feat_disc)]
    opts.append(torch.optim.Adam(cpc.parameters(), lr=2e-3))

    xt, yt = _synth(0, B, T_T, C_T, N_T)
    xs, ys = _synth(1, B, T_S, C_S, N_S)
    xt = torch.from_numpy(xt)
    yt = torch.from_numpy(yt)
    xs = torch.from_numpy(xs)
    ys = torch.from_numpy(ys)

    def step():
        t_feat = t_ext(xt)
        t_sl = cpc(t_feat)
        s_feat = dim_uni(s_ext(xs))
        s_sl = cpc(s_feat)
        t_nf_out = nf(t_feat)
        s_nf_out = nf(s_feat)
        t_nf = nf_loss(t_nf_out)
        s_nf = nf_loss(s_nf_out)
        s2t_noise = noise_mix(t_nf_out[0], s_nf_out[0])
        s2t_feat = nf.infer(s2t_noise)
        t_logits, t_pool = t_cls(t_feat)
        t_cls.eval()
        s2t_logits, s2t_pool = t_cls(s2t_feat)
        t_cls.train()
        s_logits, s_pool = s_cls(s_feat)
        loss_cdan = CDAN(t_feat, s2t_feat, t_logits, s2t_logits, ad_net, rand_layer)
        t2s = prob_trans(t_pool)
        s2t2s = prob_trans(s2t_pool)
        s2t2s_logits = s_cls.hidden(s2t2s)
        total = (
            t_nf + s_nf + ce(t_logits, yt) + ce(s_logits, ys)
            + ce(s2t2s_logits, ys) + loss_cdan
            + wgan_loss(feat_disc(t2s), feat_disc(s2t2s), feat_disc(s_pool))
            + t_sl + s_sl
        )
        for o in opts:
            o.zero_grad()
        total.backward()
        for o in opts:
            o.step()

    for _ in range(WARMUP_STEPS):
        step()
    t0 = time.perf_counter()
    for _ in range(TIMED_STEPS):
        step()
    dt = (time.perf_counter() - t0) / TIMED_STEPS
    return (2 * B) / dt  # series/sec


# ---------------------------------------------------------------------------
# Ours (JAX, TPU)
# ---------------------------------------------------------------------------

def measure_ours() -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from feature_level_style_transfer_for_tsc_tpu.config import PipelineConfig
    from feature_level_style_transfer_for_tsc_tpu.train.pipeline import StyleTransferPipeline

    pipe = StyleTransferPipeline(C_T, T_T, N_T, C_S, T_S, N_S, PipelineConfig())
    state = pipe.init_state(jax.random.PRNGKey(0))

    xt, yt = _synth(0, B, T_T, C_T, N_T)
    xs, ys = _synth(1, B, T_S, C_S, N_S)
    xt = jnp.asarray(np.transpose(xt, (0, 2, 1)))
    xs = jnp.asarray(np.transpose(xs, (0, 2, 1)))
    yt = jnp.asarray(yt.astype(np.int32))
    ys = jnp.asarray(ys.astype(np.int32))

    names = ("t_ext", "t_cls", "s_ext", "dim_uni", "s_cls", "prob_trans",
             "nf", "noise", "ad", "fd", "cpc")

    def loss_fn(params, mstate, consts, rng):
        losses, new_m, _ = pipe._phase5_forward(params, mstate, consts, xt, yt, xs, ys, rng)
        total = (
            losses["t_nf"] + losses["s_nf"] + losses["t_c"] + losses["s_c"]
            + losses["s2t2s_c"] + losses["cdan"] + losses["fd"]
            + losses["t_sl"] + losses["s_sl"]
        )
        return total, new_m

    def step(carry, rng):
        params, mstate, opt = carry
        grads, new_m = jax.grad(loss_fn, has_aux=True)(params, mstate, state["consts"], rng)
        new_params = dict(params)
        new_opt = dict(opt)
        for name in names:
            upd, new_opt[name] = pipe.tx[name].update(grads[name], opt[name], params[name])
            new_params[name] = optax.apply_updates(params[name], upd)
        return (new_params, new_m, new_opt), None

    @jax.jit
    def run_steps(carry, rngs):
        # mirror the real pipeline's execution model: one jitted scan over
        # the steps of an epoch (zero per-step dispatch)
        carry, _ = jax.lax.scan(step, carry, rngs)
        return carry

    # warmup uses the SAME scan length so the timed call hits the jit cache
    rngs_w = jax.random.split(jax.random.PRNGKey(1), TIMED_STEPS)
    rngs_t = jax.random.split(jax.random.PRNGKey(2), TIMED_STEPS)
    carry = (state["params"], state["mstate"], state["opt"])
    carry = run_steps(carry, rngs_w)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    carry = run_steps(carry, rngs_t)
    jax.block_until_ready(carry)
    dt = (time.perf_counter() - t0) / TIMED_STEPS
    return (2 * B) / dt


def main():
    if os.environ.get("BENCH_SKIP_REFERENCE") and os.path.exists(CACHE_FILE):
        baseline = json.load(open(CACHE_FILE))["reference_cpu_series_per_sec"]
    else:
        baseline = measure_reference_cpu()
        json.dump({"reference_cpu_series_per_sec": baseline}, open(CACHE_FILE, "w"))

    ours = measure_ours()
    print(
        json.dumps(
            {
                "metric": "style-transfer train step throughput (flow + OS-CNN fwd/bwd, GunPoint-scale)",
                "value": round(ours, 2),
                "unit": "series/sec",
                "vs_baseline": round(ours / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
