"""Loss-level behavior tests: CE parity, CDAN, GradNorm dynamics, CPC."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from feature_level_style_transfer_for_tsc_tpu.losses import (
    cross_entropy,
    gradnorm_init,
    gradnorm_step,
    softmax_entropy,
    wgan_loss,
)
from feature_level_style_transfer_for_tsc_tpu.losses.cdan import cdan_loss
from feature_level_style_transfer_for_tsc_tpu.losses.gradnorm import (
    per_loss_trunk_grad_norms,
)
from feature_level_style_transfer_for_tsc_tpu.models import (
    ad_net_init,
    cpc_apply,
    cpc_init,
    random_layer_init,
)


def test_cross_entropy_matches_manual():
    logits = jnp.asarray([[2.0, 0.5, -1.0], [0.0, 1.0, 0.0]])
    labels = jnp.asarray([0, 2])
    got = float(cross_entropy(logits, labels))
    p = np.exp(np.asarray(logits))
    p = p / p.sum(1, keepdims=True)
    want = float(np.mean([-np.log(p[0, 0]), -np.log(p[1, 2])]))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_softmax_entropy_epsilon():
    probs = jnp.asarray([[0.5, 0.5], [1.0, 0.0]])
    ent = np.asarray(softmax_entropy(probs))
    # reference epsilon 1e-5 inside the log
    want0 = -2 * 0.5 * np.log(0.5 + 1e-5)
    np.testing.assert_allclose(ent[0], want0, rtol=1e-5)
    assert ent[1] < 1e-4  # near-zero entropy for a one-hot


def test_wgan_loss_signs():
    t = jnp.ones((4, 1))
    s2t2s = jnp.full((4, 1), 2.0)
    src = jnp.full((4, 1), 3.0)
    assert float(wgan_loss(t, s2t2s, src)) == -1.0 - 2.0 + 3.0


def test_cdan_counter_and_grad_direction():
    key = jax.random.PRNGKey(0)
    ad_p, ad_s = ad_net_init(key, 16, 8)
    rl = random_layer_init(jax.random.PRNGKey(1), [6 * 4, 3], 16)
    t_feat = jax.random.normal(jax.random.PRNGKey(2), (5, 4, 6))
    s_feat = jax.random.normal(jax.random.PRNGKey(3), (5, 4, 6))
    t_log = jax.random.normal(jax.random.PRNGKey(4), (5, 3))
    s_log = jax.random.normal(jax.random.PRNGKey(5), (5, 3))

    loss, new_state = cdan_loss(
        ad_p, ad_s, t_feat, s_feat, t_log, s_log, random_layer=rl, training=True
    )
    assert int(new_state.iter_num) == 1  # two critic calls: -1 -> 0 -> 1
    assert np.isfinite(float(loss))

    # GRL sits on the critic INPUT (and the entropy path), so the gradient
    # w.r.t. the FEATURES is reversed: gradient ascent on the features (as
    # reported by jax.grad) must DECREASE the actual loss, while the critic's
    # own parameter gradients are untouched (true ascent direction).
    def loss_of_feat(tf):
        l, _ = cdan_loss(
            ad_p, new_state, tf, s_feat, t_log, s_log, random_layer=rl, training=False
        )
        return l

    g_feat = jax.grad(loss_of_feat)(t_feat)
    eps = 1e-2
    gn = g_feat / (jnp.linalg.norm(g_feat) + 1e-12)
    l0 = float(loss_of_feat(t_feat))
    l_plus = float(loss_of_feat(t_feat + eps * gn))
    assert l_plus < l0, (l0, l_plus)

    def loss_of_adnet(p):
        l, _ = cdan_loss(
            p, new_state, t_feat, s_feat, t_log, s_log, random_layer=rl, training=False
        )
        return l

    g_p = jax.grad(loss_of_adnet)(ad_p)
    moved = jax.tree_util.tree_map(
        lambda p, gg: p + 1e-3 * gg / (jnp.linalg.norm(gg) + 1e-12), ad_p, g_p
    )
    assert float(loss_of_adnet(moved)) > float(loss_of_adnet(ad_p))


def test_gradnorm_weight_update_and_renorm():
    opt = optax.adam(0.1)
    state = gradnorm_init([2.0, 5.0], opt)
    losses = jnp.asarray([1.0, 3.0])
    norms = jnp.asarray([0.5, 4.0])
    s1 = gradnorm_step(state, losses, norms, opt, alpha=3.0, weight_sum=7.0)
    np.testing.assert_allclose(float(jnp.sum(s1.weights)), 7.0, rtol=1e-5)
    assert bool(s1.initialized)
    # initial sigmoid captured on first step and kept afterwards
    np.testing.assert_allclose(
        np.asarray(s1.initial_sigmoid_loss), np.asarray(jax.nn.sigmoid(losses)), rtol=1e-6
    )
    s2 = gradnorm_step(s1, losses * 2, norms, opt, alpha=3.0, weight_sum=7.0)
    np.testing.assert_allclose(np.asarray(s2.initial_sigmoid_loss),
                               np.asarray(s1.initial_sigmoid_loss))
    assert np.all(np.asarray(s2.weights) >= 0)


def test_gradnorm_closed_form_grad_matches_autograd():
    """d/dw sum |w*N - const| == sign(w*N - const) * N."""
    w = jnp.asarray([1.5, 2.5, 3.0])
    n = jnp.asarray([0.7, 1.3, 0.2])
    const = jnp.asarray([1.0, 4.0, 0.5])

    def gap(w):
        return jnp.sum(jnp.abs(w * n - const))

    auto = jax.grad(gap)(w)
    closed = jnp.sign(w * n - const) * n
    np.testing.assert_allclose(np.asarray(auto), np.asarray(closed), atol=1e-6)


def test_per_loss_trunk_grad_norms():
    trunk = {"w": jnp.asarray([[1.0, 2.0], [3.0, 4.0]]), "b": jnp.asarray([0.5, -0.5])}

    def losses_of_trunk(p):
        l1 = jnp.sum(p["w"] ** 2)
        l2 = jnp.sum(p["b"] * 3.0)
        return jnp.stack([l1, l2])

    losses, norms = per_loss_trunk_grad_norms(losses_of_trunk, trunk, 2)
    # d l1/d w = 2w (norm sqrt(sum 4w^2)), d l1/d b = 0
    want1 = np.linalg.norm(2 * np.asarray(trunk["w"]).ravel())
    np.testing.assert_allclose(float(norms[0]), want1, rtol=1e-5)
    # d l2/d b = [3,3] -> norm 3*sqrt(2); d l2/d w = 0
    np.testing.assert_allclose(float(norms[1]), 3 * np.sqrt(2), rtol=1e-5)


def test_cpc_loss_near_log_batch_at_init():
    """With random (uninformative) predictions InfoNCE ~= ln(B)."""
    b, t_len, c = 8, 32, 6
    params = cpc_init(jax.random.PRNGKey(0), c, 12, t_len // 2)
    feats = jax.random.normal(jax.random.PRNGKey(1), (b, t_len, c))
    loss = float(cpc_apply(params, feats, jax.random.PRNGKey(2)))
    assert 0.5 * np.log(b) < loss < 2.5 * np.log(b), loss
