"""GradNorm loss balancing, re-designed for JAX.

The reference implements GradNorm inline with a graph-clearing
double-backward trick (`/root/reference/train_and_test.py:498-761`):
per-loss gradient norms w.r.t. the shared trunk, an inverse-train-rate
target built from sigmoid(loss) ratios vs the first step, an L1 gap loss,
and manual assignment of the weight gradients.

Here the math is explicit and closed-form:

* ``norms_i = w_i * N_i`` where ``N_i = sum_p ||d loss_i / d trunk_p||_2``
  (matches the reference's ``sum of torch.norm(w_i * g)`` since w_i >= 0);
* the constant target is ``mean(norms) * inverse_train_rate ** alpha``
  with everything detached (reference :693-712);
* ``d gap / d w_i = sign(w_i * N_i - const_i) * N_i`` — no second autograd
  pass needed;
* after the Adam step the weights are clamped to >= 0 and renormalized to a
  fixed sum (7 for the target group, 8 for the source group,
  reference :753-761).

``N_i`` itself is obtained with ONE forward of a trunk->losses function and
one VJP pull-back per loss (`per_loss_trunk_grad_norms`) — the same
backward count as the reference but with no retain_graph gymnastics, all
inside jit.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


class GradNormState(NamedTuple):
    weights: jax.Array  # (L,) loss weights, clamped >= 0, fixed sum
    initial_sigmoid_loss: jax.Array  # (L,) sigmoid of first-step losses
    initialized: jax.Array  # bool scalar
    opt_state: optax.OptState  # Adam state for the weights


def gradnorm_init(init_weights, optimizer: optax.GradientTransformation) -> GradNormState:
    w = jnp.asarray(init_weights, jnp.float32)
    return GradNormState(
        weights=w,
        initial_sigmoid_loss=jnp.ones_like(w),
        initialized=jnp.array(False),
        opt_state=optimizer.init(w),
    )


def per_loss_trunk_grad_norms(
    losses_of_trunk: Callable, trunk_params, num_losses: int
) -> Tuple[jax.Array, jax.Array]:
    """N_i = sum over trunk tensors of ||d loss_i / d tensor||_2.

    ``losses_of_trunk`` maps the trunk params pytree to a (L,) loss vector;
    one forward, L VJP pull-backs (reference does the same L ``autograd.grad``
    calls at train_and_test.py:681-690).
    Returns (losses, N) both of shape (L,).
    """
    losses, pullback = jax.vjp(losses_of_trunk, trunk_params)

    def norm_of(i):
        basis = jnp.zeros((num_losses,)).at[i].set(1.0)
        (grads,) = pullback(basis)
        leaf_norms = [jnp.linalg.norm(g.reshape(-1)) for g in jax.tree_util.tree_leaves(grads)]
        return jnp.sum(jnp.stack(leaf_norms))

    n = jnp.stack([norm_of(i) for i in range(num_losses)])
    return losses, n


def gradnorm_step(
    state: GradNormState,
    losses: jax.Array,
    trunk_grad_norms: jax.Array,
    optimizer: optax.GradientTransformation,
    *,
    alpha: float = 3.0,
    weight_sum: float = 7.0,
) -> GradNormState:
    """One GradNorm weight update (reference :646-761 semantics)."""
    sig = jax.nn.sigmoid(losses)
    initial = jnp.where(state.initialized, state.initial_sigmoid_loss, sig)
    loss_ratio = sig / initial
    inverse_train_rate = loss_ratio / jnp.mean(loss_ratio)

    norms = state.weights * trunk_grad_norms
    mean_norm = jnp.mean(norms)
    const = jax.lax.stop_gradient(mean_norm * inverse_train_rate ** alpha)
    grad_w = jnp.sign(norms - const) * trunk_grad_norms

    updates, new_opt = optimizer.update(grad_w, state.opt_state, state.weights)
    w = optax.apply_updates(state.weights, updates)
    w = jnp.maximum(w, 0.0)
    w = w * (weight_sum / jnp.sum(w))
    return GradNormState(
        weights=w,
        initial_sigmoid_loss=initial,
        initialized=jnp.array(True),
        opt_state=new_opt,
    )
