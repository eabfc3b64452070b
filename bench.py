"""Headline benchmark: the PRODUCTION phase-5 train step, end to end.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "series/sec", "vs_baseline": N, ...}

The workload is the full phase-5 production epoch step on a GunPoint-scale
synthetic pair (univariate, T=150, batch 20+20): extractors ->
DimensionUnification -> CPC x2 -> WaveGlow fwd x2 (NLL) -> NoiseTransfer ->
WaveGlow infer -> classify target/s2t/source -> CDAN + ProbTransfer/s2t2s CE
+ WGAN critic -> GradNorm (per-loss trunk pullbacks + weight Adam + renorm)
-> epoch-staged adversarial weighting -> 11 optimizer steps -> WGAN clipping
-> per-epoch schedulers.  That is `StyleTransferPipeline.phase5_epoch`
verbatim — the same function `run()` executes — vs the reference's own
torch modules driven through its full batch body INCLUDING its GradNorm
double-backward machinery (train_and_test.py:539-766).

Extra reported keys:
  * simple_step_series_per_sec — round-1's simplified sum-of-losses step,
    kept for cross-round comparability;
  * flops_per_step / mfu — XLA cost-analysis FLOPs of the jitted production
    step and the achieved fraction of the chip's bf16 peak (v5e: 197e12
    FLOP/s; an f32 workload can reach at most ~half of that, so this MFU is
    a conservative lower bound);
  * vmap8_* — 8 independent runs vmapped into ONE program
    (train/multirun.py): the chip-filling aggregate throughput/MFU a seed
    sweep achieves on one chip.

The baseline is measured, not copied (the reference publishes no numbers,
BASELINE.md).  Set BENCH_SKIP_REFERENCE=1 to reuse the cached baseline.
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
# the reference's production step is tens of seconds on this CPU; a few
# timed steps give a stable per-step anchor without blowing the bench budget
REF_TIMED_STEPS = 3
REF_WARMUP_STEPS = 1
# the baseline denominator is pinned as the MAX over all recorded sample
# passes (REF_PASSES fresh passes per measuring run, persisted with host-
# load metadata in CACHE_FILE): contention only slows the reference, so the
# least-contended observed rate is its honest speed — a single contended-
# core pass had swung the denominator ~3x between rounds (ADVICE r4)
REF_PASSES = 3
V5E_PEAK_FLOPS = 197e12  # bf16 peak of one v5e chip
CACHE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_baseline.json")


def _synth(seed, b, t, c, ncls):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, c, t)).astype(np.float32)
    x = (x - x.mean(-1, keepdims=True)) / (x.std(-1, keepdims=True) + 1e-8)
    y = rng.integers(0, ncls, b).astype(np.int64)
    return x, y


# ---------------------------------------------------------------------------
# Reference (torch, CPU) — drives the reference's own modules through the
# full phase-5 batch body incl. GradNorm (train_and_test.py:539-766).
# ---------------------------------------------------------------------------


def _stage(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)

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

    # GradNorm weights + their Adams (train_and_test.py:500-507)
    w_t = torch.nn.Parameter(torch.tensor([2.0, 5.0]))
    w_s = torch.nn.Parameter(torch.tensor([2.0, 2.0, 4.0]))
    opt_w_t = torch.optim.Adam([w_t], lr=2e-4)
    opt_w_s = torch.optim.Adam([w_s], lr=1e-3)
    gn = {"initial_t": None, "initial_s": None}
    alpha = 3

    xt, yt = _synth(0, B, T_T, C_T, N_T)
    xs, ys = _synth(1, B, T_S, C_S, N_S)
    xt = torch.from_numpy(xt)
    yt = torch.from_numpy(yt)
    xs = torch.from_numpy(xs)
    ys = torch.from_numpy(ys)

    def step():
        # ---- forward: train_and_test.py:547-603 ----
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
        t_c = ce(t_logits, yt)
        s_c = ce(s_logits, ys)
        loss_cdan = CDAN(t_feat, s2t_feat, t_logits, s2t_logits, ad_net, rand_layer)
        t2s = prob_trans(t_pool)
        s2t2s = prob_trans(s2t_pool)
        s2t2s_logits = s_cls.hidden(s2t2s)
        s2t2s_c = ce(s2t2s_logits, ys)
        fd = wgan_loss(feat_disc(t2s), feat_disc(s2t2s), feat_disc(s_pool))

        # ---- GradNorm-weighted total + staged weights (:646-672, epoch 0) --
        loss_t_stacked = torch.stack([t_nf, t_c])
        loss_s_stacked = torch.stack([s_nf, s_c, s2t2s_c])
        if gn["initial_t"] is None:
            gn["initial_t"] = 1 / (1 + np.exp(-loss_t_stacked.data.numpy()))
            gn["initial_s"] = 1 / (1 + np.exp(-loss_s_stacked.data.numpy()))
        total = (
            torch.sum(w_t * loss_t_stacked) + torch.sum(w_s * loss_s_stacked)
            + 3 * loss_cdan + 3 * fd + 2 * t_sl + 2 * s_sl
        )
        for o in opts:
            o.zero_grad()
        opt_w_t.zero_grad()
        opt_w_s.zero_grad()
        total.backward(retain_graph=True)
        opt_w_t.zero_grad()
        opt_w_s.zero_grad()

        # ---- per-loss trunk grad norms (:681-691) ----
        shared_t = t_ext.return_last_layer()
        shared_s = s_ext.return_last_layer()
        norms_t, norms_s = [], []
        for i in range(2):
            g = torch.autograd.grad(loss_t_stacked[i], shared_t.parameters(), retain_graph=True)
            norms_t.append(torch.cat([torch.norm(w_t[i] * gi).unsqueeze(0) for gi in g]).sum())
        for i in range(3):
            g = torch.autograd.grad(loss_s_stacked[i], shared_s.parameters(), retain_graph=True)
            norms_s.append(torch.cat([torch.norm(w_s[i] * gi).unsqueeze(0) for gi in g]).sum())
        norms_t_stack = torch.stack(norms_t)
        norms_s_stack = torch.stack(norms_s)

        # ---- inverse train rate + weight grads (:693-715) ----
        ratio_t = (1 / (1 + np.exp(-loss_t_stacked.data.numpy()))) / gn["initial_t"]
        ratio_s = (1 / (1 + np.exp(-loss_s_stacked.data.numpy()))) / gn["initial_s"]
        inv_t = ratio_t / np.mean(ratio_t)
        inv_s = ratio_s / np.mean(ratio_s)
        const_t = torch.tensor(np.mean(norms_t_stack.data.numpy()) * inv_t ** alpha)
        const_s = torch.tensor(np.mean(norms_s_stack.data.numpy()) * inv_s ** alpha)
        gn_loss_t = torch.sum(torch.abs(norms_t_stack - const_t))
        gn_loss_s = torch.sum(torch.abs(norms_s_stack - const_s))
        grad_w_t = torch.autograd.grad(gn_loss_t, w_t, retain_graph=True)[0]
        grad_w_s = torch.autograd.grad(gn_loss_s, w_s, retain_graph=True)[0]

        # ---- graph-clearing second backward + manual grads (:727-751) ----
        saved_t = w_t.data.numpy().copy()
        saved_s = w_s.data.numpy().copy()
        total.data = total.data * 0.0
        w_t.data = w_t.data * 0.0
        w_s.data = w_s.data * 0.0
        loss_t_stacked.data = loss_t_stacked.data * 0.0
        loss_s_stacked.data = loss_s_stacked.data * 0.0
        loss_cdan.data = loss_cdan.data * 0.0
        fd.data = fd.data * 0.0
        total.backward()
        w_t.data = torch.tensor(saved_t)
        w_s.data = torch.tensor(saved_s)
        w_t.grad = grad_w_t
        w_s.grad = grad_w_s
        opt_w_t.step()
        opt_w_s.step()
        for o in opts:
            o.step()
        # ---- renorm + WGAN clipping (:756-766) ----
        w_t.data[:].clamp_(min=0.0)
        w_t.data = w_t.data * (7 / torch.sum(w_t.data))
        w_s.data[:].clamp_(min=0.0)
        w_s.data = w_s.data * (8 / torch.sum(w_s.data))
        for p in ad_net.parameters():
            p.data.clamp_(-0.0005, 0.0005)
        for p in feat_disc.parameters():
            p.data.clamp_(-0.01, 0.01)

    for _ in range(REF_WARMUP_STEPS):
        step()
    rates = []
    for _ in range(REF_PASSES):
        t0 = time.perf_counter()
        for _ in range(REF_TIMED_STEPS):
            step()
        dt = (time.perf_counter() - t0) / REF_TIMED_STEPS
        rates.append((2 * B) / dt)  # series/sec per pass
    return rates


# ---------------------------------------------------------------------------
# Ours (JAX, TPU) — the production phase5_epoch, verbatim.
# ---------------------------------------------------------------------------

def _build_pipeline():
    import jax

    from feature_level_style_transfer_for_tsc_tpu.config import PipelineConfig
    from feature_level_style_transfer_for_tsc_tpu.train.pipeline import StyleTransferPipeline

    pipe = StyleTransferPipeline(C_T, T_T, N_T, C_S, T_S, N_S, PipelineConfig())
    state = pipe.init_state(jax.random.PRNGKey(0))
    return pipe, state


def _epoch_batches():
    import jax.numpy as jnp

    xts, yts, xss, yss = [], [], [], []
    for i in range(TIMED_STEPS):
        xt, yt = _synth(2 * i, B, T_T, C_T, N_T)
        xs, ys = _synth(2 * i + 1, B, T_S, C_S, N_S)
        xts.append(np.transpose(xt, (0, 2, 1)))
        yts.append(yt.astype(np.int32))
        xss.append(np.transpose(xs, (0, 2, 1)))
        yss.append(ys.astype(np.int32))
    return (jnp.asarray(np.stack(xts)), jnp.asarray(np.stack(yts)),
            jnp.asarray(np.stack(xss)), jnp.asarray(np.stack(yss)))


def measure_ours_production(pipe, state):
    """Time phase5_epoch (one jitted scan over TIMED_STEPS batches) and
    return (series/sec, flops_per_step or None)."""
    import jax
    import jax.numpy as jnp

    xb_t, yb_t, xb_s, yb_s = _epoch_batches()
    epoch = jnp.zeros((), jnp.int32)

    new_state, _ = pipe.phase5_epoch(state, xb_t, yb_t, xb_s, yb_s, epoch)
    jax.block_until_ready(new_state["params"])

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        new_state, _ = pipe.phase5_epoch(state, xb_t, yb_t, xb_s, yb_s, epoch)
        jax.block_until_ready(new_state["params"])
    dt = (time.perf_counter() - t0) / reps / TIMED_STEPS

    flops = None
    try:
        lowered = type(pipe).phase5_epoch.lower(
            pipe, state, xb_t, yb_t, xb_s, yb_s, epoch
        )
        cost = lowered.compile().cost_analysis()
        if cost and "flops" in cost:
            flops = float(cost["flops"]) / TIMED_STEPS
    except Exception:
        pass
    return (2 * B) / dt, flops, dt


def measure_ours_simple(pipe, state):
    """Round-1's simplified sum-of-losses step (kept for comparability)."""
    import jax
    import jax.numpy as jnp
    import optax

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
        carry, _ = jax.lax.scan(step, carry, rngs)
        return carry

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


def measure_ours_multirun(pipe, k=8):
    """K independent runs vmapped into ONE program (train/multirun.py) —
    the chip-filling path: aggregate production-step throughput when the
    seed sweep every result needs anyway shares the chip."""
    import jax
    import jax.numpy as jnp

    from feature_level_style_transfer_for_tsc_tpu.train.multirun import (
        MultiRunData,
        MultiRunStylePipeline,
    )

    mpipe = MultiRunStylePipeline(pipe)
    pairs = []
    for r in range(k):
        xt, yt = _synth(100 + 2 * r, B, T_T, C_T, N_T)
        xs, ys = _synth(101 + 2 * r, B, T_S, C_S, N_S)
        pair = {
            "t_train": (np.transpose(xt, (0, 2, 1)), yt.astype(np.int32)),
            "s_train": (np.transpose(xs, (0, 2, 1)), ys.astype(np.int32)),
        }
        pair["t_test"], pair["s_test"] = pair["t_train"], pair["s_train"]
        pairs.append(pair)
    data = MultiRunData.from_pairs(pairs)
    states = mpipe.init_states(list(range(k)))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(k))

    # N == B -> one production step per run per epoch call
    states, m = mpipe._p5(states, *data.t_train, *data.s_train, keys, jnp.asarray(0))
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for e in range(1, 1 + TIMED_STEPS):
        states, m = mpipe._p5(
            states, *data.t_train, *data.s_train, keys, jnp.asarray(e)
        )
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / TIMED_STEPS
    return k * 2 * B / dt, dt


def _load_cache():
    try:
        with open(CACHE_FILE) as f:
            cache = json.load(f)
    except (OSError, ValueError):
        return {"samples": []}
    if "samples" not in cache:  # legacy scalar format
        legacy = cache.get("reference_production_series_per_sec")
        cache = {"samples": []}
        if legacy is not None:
            cache["samples"] = [{"series_per_sec": float(legacy),
                                 "load_1m": None, "note": "legacy-r4"}]
    return cache


def _save_cache(cache):
    tmp = CACHE_FILE + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cache, f, indent=1)
    os.replace(tmp, CACHE_FILE)


def main():
    import datetime

    cache = _load_cache()
    if not (os.environ.get("BENCH_SKIP_REFERENCE") and cache["samples"]):
        _stage("measuring reference torch baseline on CPU "
               f"({REF_PASSES} passes x {REF_TIMED_STEPS} steps)")
        load0 = os.getloadavg()[0]
        for rate in measure_reference_cpu():
            cache["samples"].append({
                "series_per_sec": rate,
                "load_1m": round(os.getloadavg()[0], 2),
                "load_1m_at_start": round(load0, 2),
                "utc": datetime.datetime.utcnow().isoformat(
                    timespec="seconds"),
            })
    # The denominator is the MAX over all recorded samples: this single-core
    # box is often contended (background experiment queues), and contention
    # only ever makes the reference SLOWER — so the least-contended observed
    # rate is the reference's honest speed-of-light here, and taking it is
    # conservative against us (lowest multiplier) and stable across rounds
    # (the r2-r4 denominators 0.998-3.119 differed by host load alone,
    # ADVICE r4).  Absolute series/s is the headline; vs_baseline secondary.
    baseline = float(max(s["series_per_sec"] for s in cache["samples"]))
    cache["reference_production_series_per_sec"] = baseline
    _save_cache(cache)
    _stage(f"baseline {baseline:.3f} series/s "
           f"(max of {len(cache['samples'])} samples); building pipeline")
    pipe, state = _build_pipeline()
    _stage("measuring production step (compile + timed)")
    ours, flops, step_time = measure_ours_production(pipe, state)
    _stage(f"production {ours:.1f} series/s; measuring simple step")
    simple = measure_ours_simple(pipe, state)
    _stage(f"simple {simple:.1f} series/s; measuring vmap8")
    out = {
        "metric": "phase-5 PRODUCTION train step throughput (GradNorm + staged adversarial + 11 opts, GunPoint-scale)",
        "value": round(ours, 2),
        "unit": "series/sec",
        "vs_baseline": round(ours / baseline, 2),
        "baseline_series_per_sec": round(baseline, 3),
        "baseline_n_samples": len(cache["samples"]),
        "baseline_load_1m": cache["samples"][-1].get("load_1m"),
        "simple_step_series_per_sec": round(simple, 2),
    }
    if flops:
        out["flops_per_step"] = round(flops)
        out["mfu_vs_bf16_peak"] = round(flops / step_time / V5E_PEAK_FLOPS, 5)
    k = 8
    vmap_agg, vmap_dt = measure_ours_multirun(pipe, k=k)
    _stage(f"vmap8 {vmap_agg:.1f} series/s aggregate")
    out[f"vmap{k}_aggregate_series_per_sec"] = round(vmap_agg, 2)
    out[f"vmap{k}_vs_baseline"] = round(vmap_agg / baseline, 2)
    if flops:
        out[f"vmap{k}_mfu_vs_bf16_peak"] = round(
            k * flops / vmap_dt / V5E_PEAK_FLOPS, 5
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
