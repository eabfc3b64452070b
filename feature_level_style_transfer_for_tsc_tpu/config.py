"""Typed configuration with the reference's hard-coded values as defaults.

The reference has no config system: every hyperparameter is a literal
scattered through `/root/reference/train_and_test.py` (budgets :38-40, phase
lengths :143,182,222,375,513, LRs/schedules :97-134, GradNorm :500-511,
755-761, clipping :763-766) and `multi_source_voting.py:405-420` (voting
constants).  This dataclass centralizes them so reference behavior is
reproducible by default while everything is overridable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple


@dataclass(frozen=True)
class FlowConfig:
    """Simplified WaveGlow (reference Simplified_NF_WaveGlow.py:125-146,
    instantiated train_and_test.py:71)."""

    n_flows: int = 3
    wn_channels: int = 120
    wn_layers: int = 8
    kernel_size: int = 3
    sigma: float = 1.0


@dataclass(frozen=True)
class OptimConfig:
    """LRs and schedules (reference train_and_test.py:97-134)."""

    lr_target_ext: float = 1e-3
    lr_target_cls: float = 3e-3
    lr_source_ext: float = 1e-3
    lr_dim_uni: float = 1e-3
    lr_source_cls: float = 3e-3
    lr_prob_trans: float = 1e-3
    lr_nf: float = 1e-3
    lr_noise_trans: float = 5e-3
    lr_ad_net: float = 1e-3
    lr_feat_disc: float = 1e-3
    lr_cpc: float = 2e-3

    steplr_step: int = 25
    steplr_gamma: float = 0.8
    cpc_steplr_gamma: float = 0.7
    noise_steplr_step: int = 55
    noise_steplr_gamma: float = 0.6
    plateau_factor: float = 0.7
    plateau_min_lr: float = 1e-4

    ad_net_clip: float = 5e-4
    feat_disc_clip: float = 1e-2


@dataclass(frozen=True)
class GradNormConfig:
    """GradNorm weights (reference train_and_test.py:500-511,753-761)."""

    alpha: float = 3.0
    weights_t_init: Tuple[float, ...] = (2.0, 5.0)
    weights_s_init: Tuple[float, ...] = (2.0, 2.0, 4.0)
    weights_t_sum: float = 7.0
    weights_s_sum: float = 8.0
    lr_weights_t: float = 2e-4
    lr_weights_s: float = 1e-3


@dataclass(frozen=True)
class PipelineConfig:
    """The full five-phase curriculum (reference train_and_test.py:22-798)."""

    batch_size: int = 20
    max_kernel_size: int = 89  # reference :40
    cdan_dim: int = 1024  # reference :76
    cpc_hidden: int = 64  # reference :131
    #: scales the OS-CNN parameter budgets (1.0 = reference budgets
    #: train_and_test.py:38-39); tests shrink it to keep models tiny.
    budget_multiplier: float = 1.0
    #: "bfloat16" runs the OS-CNN conv path (the FLOP carrier) in bf16 on
    #: the MXU; BatchNorm stats, losses and the flow's invertible mixings
    #: (pinned at HIGHEST precision) stay f32.  Default f32 end to end —
    #: measured accept/decline note in docs/DESIGN.md.
    compute_dtype: str = "float32"
    #: opt-in flow stabilizer: >0 soft-clamps the coupling's log-scale to
    #: ``c*tanh(log_s/c)`` in BOTH directions (forward density and infer),
    #: bounding the early-phase-5 NLL transient seen with truncated NF
    #: pretrain (ROADMAP item 4).  0.0 = off = exact reference semantics
    #: (the reference has the same transient exposure — not a parity bug).
    log_s_clamp: float = 0.0
    #: step the 10 RMSprop module optimizers as ONE fused flat update with
    #: per-element LRs (same elementwise math, equality-tested).  MEASURED
    #: SLOWER on the v5e (0.94x: the whole-tree ravel/unravel costs more
    #: than 10 small optax chains save — see docs/DESIGN.md), so default
    #: off; kept for remeasurement at larger parameter counts.
    fused_optimizers: bool = False
    #: (`xonly_pullbacks` — an input-grad-only fused-WN backward for the
    #: GradNorm trunk pulls, 1.13-1.15x at K<=8 — was DELETED in round 5:
    #: within round 4 it was flipped ON after a 0/96 stability sweep and
    #: falsified by the very next 30-epoch K=16 run; the hazard — an
    #: fp-schedule perturbation relocating a non-finite RMSprop basin past
    #: any finite gate window — is inherent, and a stabilizer would change
    #: reference-parity optimizer numerics.  Ledger: docs/DESIGN.md
    #: "GradNorm pullback knobs".)
    #:
    #: merge the GradNorm trunk pulls whose cross-trunk gradients are
    #: structurally ZERO: t_nf depends only on the t_ext trunk and s_nf only
    #: on s_ext (the pair-batched flow is per-sample), so ONE pullback
    #: seeded e_{t_nf}+e_{s_nf} yields both trunk grads exactly — likewise
    #: t_c/s_c.  6 backwards/step -> 4, bit-identical trunk norms
    #: (tests/test_multirun.py).  Default ON: measured 1.16x alone
    #: (experiments/results_xonly_pullbacks.json).
    merged_pullbacks: bool = True
    #: batch the flow-traversing GradNorm pulls — total, nf-merged, s2t2s
    #: — as ONE vmapped pullback over a stacked
    #: cotangent matrix instead of sequential calls, so the flow backward
    #: (the dominant phase-5 cost under the K-run vmap,
    #: results_vmap_phase5_breakdown.json fwd_vjp6 7.2x at K=8) runs once
    #: with a size-3 cotangent batch rather than three times.  The
    #: classifier-only pull stays separate so its constant-seed DCE keeps
    #: skipping the flow entirely.  Same pullback linear map, batched —
    #: equality tested in tests/test_multirun.py; measured on-chip before
    #: any default flip (experiments/pullback_batched_cotangent.py).
    stacked_pullbacks: bool = False

    target_pretrain_epochs: int = 3  # reference :143
    source_pretrain_epochs: int = 70  # reference :182
    selfsup_epochs: int = 325  # 65*5, reference :222
    selfsup_supervised_every: int = 50  # reference :231
    nf_pretrain_epochs: int = 600  # reference :375
    nf_supervised_every: int = 75  # reference :388
    joint_epochs: int = 720  # reference :23

    eval_every: int = 2  # reference :778
    checkpoint_dir: str = "train_log"
    seed: int = 0

    flow: FlowConfig = field(default_factory=FlowConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    gradnorm: GradNormConfig = field(default_factory=GradNormConfig)


@dataclass(frozen=True)
class VotingConfig:
    """Ensemble voting constants (reference multi_source_voting.py:405-420)."""

    entropy_scale: float = 120.0
    weight_base: float = 9.0
