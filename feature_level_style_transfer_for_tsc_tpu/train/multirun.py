"""Vmapped multi-run training: K independent curriculum runs in ONE program.

A single reference-scale style-transfer run (`/root/reference/main.py` →
`train_and_test.py:22-798`) is latency-bound on a TPU v5e — its ~45 GFLOP
phase-5 step fills ~1-2% of the MXU (experiments/results_mfu.json).  The
TPU-native answer is to batch K *independent* runs (different seeds of the
same dataset pair — the seed-sweep every result in this repo needs anyway)
into one program: every `phase{1..5}_epoch` of `StyleTransferPipeline` is a
pure jitted pytree->pytree function, so `jax.vmap` over a stacked state axis
turns K curricula into one XLA program whose per-op batch is K× larger.

Key discipline matches the sequential orchestrator (`pipeline.py` `run()`)
exactly: per-run shuffle key chains `PRNGKey(seed+1) -> split per epoch ->
split(k1, k2) for the paired phases`, and batch assembly reproduces
`data/batching.epoch_batches` (permutation + wrap-around tail fill) — so a
K-run sweep is trajectory-equivalent to K sequential runs up to float
reassociation (asserted in tests/test_multirun.py).

Epoch batching runs ON DEVICE here (one fused program per epoch) instead of
the host-side numpy of `epoch_batches`: with K runs the host would otherwise
assemble and ship K epochs of batches per dispatch.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.batching import num_full_batches
from .pipeline import StyleTransferPipeline


def stack_states(states: Sequence[Dict]) -> Dict:
    """Stack per-run states along a new leading run axis."""
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *states)


def unstack_state(states: Dict, i: int) -> Dict:
    """Extract run ``i``'s state from a stacked state."""
    return jax.tree_util.tree_map(lambda l: l[i], states)


class MultiRunData:
    """K same-shaped dataset pairs stacked along a leading run axis.

    ``from_pairs`` accepts K dicts with keys t_train/t_test/s_train/s_test,
    each an (x, y) tuple; all runs must share shapes (the same-dataset
    seed-sweep case).  Use ``broadcast`` when every run sees identical data.
    """

    def __init__(self, t_train, t_test, s_train, s_test):
        # each: (x [K, N, T, C], y [K, N])
        self.t_train, self.t_test = t_train, t_test
        self.s_train, self.s_test = s_train, s_test
        self.n_runs = t_train[0].shape[0]

    @classmethod
    def from_pairs(cls, pairs):
        def gather(split):
            xs = jnp.asarray(np.stack([np.asarray(p[split][0]) for p in pairs]))
            ys = jnp.asarray(np.stack([np.asarray(p[split][1]) for p in pairs]))
            return xs, ys

        return cls(*(gather(s) for s in ("t_train", "t_test", "s_train", "s_test")))

    @classmethod
    def broadcast(cls, pair, n_runs: int):
        return cls.from_pairs([pair] * n_runs)


class MultiRunStylePipeline:
    """K-run vmapped wrapper around one `StyleTransferPipeline` definition."""

    def __init__(self, pipe: StyleTransferPipeline):
        self.pipe = pipe
        bs = pipe.config.batch_size

        def batches(x, y, key):
            """Device-side `epoch_batches`: same permutation + wrap fill."""
            n = x.shape[0]
            nb = num_full_batches(n, bs)
            perm = jax.random.permutation(key, n)
            reps = -(-(nb * bs) // n)
            idx = jnp.tile(perm, reps)[: nb * bs]
            return (
                x[idx].reshape(nb, bs, *x.shape[1:]),
                y[idx].reshape(nb, bs),
            )

        def paired(xt, yt, xs, ys, key):
            k1, k2 = jax.random.split(key)
            bt, lt = batches(xt, yt, k1)
            bsx, ls = batches(xs, ys, k2)
            nb = min(bt.shape[0], bsx.shape[0])  # reference rounds_per_epoch
            return bt[:nb], lt[:nb], bsx[:nb], ls[:nb]

        self._p1 = jax.jit(
            jax.vmap(lambda st, x, y, k: pipe.phase1_epoch(st, *batches(x, y, k)))
        )
        self._p2 = jax.jit(
            jax.vmap(lambda st, x, y, k: pipe.phase2_epoch(st, *batches(x, y, k)))
        )
        self._p3 = {
            sup: jax.jit(
                jax.vmap(
                    lambda st, xt, yt, xs, ys, k, _sup=sup: pipe.phase3_epoch(
                        st, *paired(xt, yt, xs, ys, k), _sup
                    )
                )
            )
            for sup in (False, True)
        }
        self._p4 = {
            sup: jax.jit(
                jax.vmap(
                    lambda st, xt, yt, xs, ys, k, _sup=sup: pipe.phase4_epoch(
                        st, *paired(xt, yt, xs, ys, k), _sup
                    )
                )
            )
            for sup in (False, True)
        }
        self._p5 = jax.jit(
            jax.vmap(
                lambda st, xt, yt, xs, ys, k, e: pipe.phase5_epoch(
                    st, *paired(xt, yt, xs, ys, k), e
                ),
                in_axes=(0, 0, 0, 0, 0, 0, None),
            )
        )
        self._split = jax.jit(jax.vmap(lambda k: tuple(jax.random.split(k))))

        def acc_t(params, mstate, x, y):
            logits = pipe._predict_target(params, mstate, x)
            return jnp.mean(jnp.argmax(logits, -1) == y)

        def acc_s(params, mstate, x, y):
            logits = pipe._predict_source(params, mstate, x)
            return jnp.mean(jnp.argmax(logits, -1) == y)

        self._acc_t = jax.jit(jax.vmap(acc_t))
        self._acc_s = jax.jit(jax.vmap(acc_s))

    def init_states(self, seeds: Sequence[int]) -> Dict:
        # init_state is host-side (numpy QR orthonormal flow init etc.), so
        # build each run eagerly and stack — one-time cost, exact per-seed
        # parity with the sequential path.
        return stack_states(
            [self.pipe.init_state(jax.random.PRNGKey(int(s))) for s in seeds]
        )

    def evaluate_target(self, states, x, y):
        return np.asarray(self._acc_t(states["params"], states["mstate"], x, y))

    def evaluate_source(self, states, x, y):
        return np.asarray(self._acc_s(states["params"], states["mstate"], x, y))

    def run(
        self,
        data: MultiRunData,
        seeds: Sequence[int],
        *,
        epochs: Optional[Dict[str, int]] = None,
        states: Optional[Dict] = None,
        eval_hook=None,
        verbose: bool = False,
    ):
        """Run K full curricula concurrently; mirrors `pipeline.run()`.

        Returns (stacked final states, history) where each history record's
        metrics are per-run arrays of shape [K].  ``eval_hook(epoch, states,
        accs)`` fires every cfg.eval_every phase-5 epochs with ``accs`` a
        dict of [K] arrays.
        """
        pipe, cfg = self.pipe, self.pipe.config
        seeds = np.asarray(seeds)
        assert len(seeds) == data.n_runs, (len(seeds), data.n_runs)
        ep = {
            "p1": cfg.target_pretrain_epochs,
            "p2": cfg.source_pretrain_epochs,
            "p3": cfg.selfsup_epochs,
            "p4": cfg.nf_pretrain_epochs,
            "p5": cfg.joint_epochs,
        }
        if epochs:
            ep.update(epochs)
        if states is None:
            states = self.init_states(list(seeds))
        # per-run shuffle-key chains, same discipline as pipeline.run()
        skeys = jax.vmap(jax.random.PRNGKey)(jnp.asarray(seeds + 1))
        history = []

        def log(phase, e, metrics):
            rec = {"phase": phase, "epoch": e}
            rec.update({k: np.asarray(v) for k, v in metrics.items()})
            history.append(rec)
            if verbose:
                print({k: (v.tolist() if hasattr(v, "tolist") else v) for k, v in rec.items()})

        def next_keys():
            nonlocal skeys
            skeys, sks = self._split(skeys)
            return sks

        tt, te = data.t_train, data.t_test
        st, se = data.s_train, data.s_test
        for e in range(ep["p1"]):
            states, m = self._p1(states, *tt, next_keys())
            log("p1", e, m)
        for e in range(ep["p2"]):
            states, m = self._p2(states, *st, next_keys())
            log("p2", e, m)
        for e in range(ep["p3"]):
            sup = e % cfg.selfsup_supervised_every == 0
            states, m = self._p3[sup](states, *tt, *st, next_keys())
            log("p3", e, m)
        for e in range(ep["p4"]):
            sup = e % cfg.nf_supervised_every == 0
            states, m = self._p4[sup](states, *tt, *st, next_keys())
            log("p4", e, m)
        for e in range(ep["p5"]):
            states, m = self._p5(states, *tt, *st, next_keys(), jnp.asarray(e))
            log("p5", e, m)
            if e % cfg.eval_every == 0:
                accs = {
                    "target_train_acc": self.evaluate_target(states, *tt),
                    "target_test_acc": self.evaluate_target(states, *te),
                    "source_train_acc": self.evaluate_source(states, *st),
                    "source_test_acc": self.evaluate_source(states, *se),
                }
                log("p5_eval", e, accs)
                if eval_hook:
                    eval_hook(e, states, accs)
        return states, history
