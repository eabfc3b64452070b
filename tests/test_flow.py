"""Normalizing-flow tests: invertibility, logdet, loss, zero-init identity."""

import jax
import jax.numpy as jnp
import numpy as np

from feature_level_style_transfer_for_tsc_tpu.models import flow as F

N_WN = 16  # small WN width for tests


def _params(key, c=8, n_flows=3):
    # 2 WN layers (vs production 8) keeps CPU test compiles fast; the
    # invertibility math is identical.
    return F.waveglow_init(key, n_flows, c, N_WN, n_wn_layers=2)


def test_inv1x1_orthonormal_init_and_inverse():
    p = F.inv1x1_init(jax.random.PRNGKey(0), 6)
    w = np.asarray(p["weight"])
    np.testing.assert_allclose(w @ w.T, np.eye(6), atol=1e-5)
    assert np.linalg.det(w) > 0
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 6))
    y, logdet = F.inv1x1_forward(p, z)
    np.testing.assert_allclose(F.inv1x1_inverse(p, y), z, atol=1e-5)
    # logdet = B*T*logdet(W) ~ 0 for a rotation
    assert abs(float(logdet)) < 1e-3


def test_inv1x1_logdet_general_weight():
    p = {"weight": jnp.asarray(np.diag([2.0, 0.5, 1.0, 3.0]).astype(np.float32))}
    z = jnp.ones((3, 7, 4))
    _, logdet = F.inv1x1_forward(p, z)
    want = 3 * 7 * np.log(2.0 * 0.5 * 1.0 * 3.0)
    np.testing.assert_allclose(float(logdet), want, rtol=1e-4)


def test_waveglow_invertibility():
    params = _params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 8))
    z, log_s, log_det = F.waveglow_forward(params, x, N_WN)
    assert len(log_s) == 3 and len(log_det) == 3
    x_rec = F.waveglow_infer(params, z, N_WN)
    np.testing.assert_allclose(x_rec, x, atol=1e-4)


def test_waveglow_zero_init_couplings_are_identity():
    # end conv is zero-initialized, so each coupling starts as identity and
    # the whole flow is just the product of rotations -> z = R x.
    params = _params(jax.random.PRNGKey(2), c=4, n_flows=2)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 6, 4))
    z, log_s, _ = F.waveglow_forward(params, x, N_WN)
    for ls in log_s:
        np.testing.assert_allclose(np.asarray(ls), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(z)), np.linalg.norm(np.asarray(x)), rtol=1e-4
    )


def test_waveglow_loss_closed_form():
    z = jnp.ones((2, 3, 4))
    log_s = [jnp.full((2, 3, 2), 0.5)]
    log_det = [jnp.asarray(1.25)]
    loss = F.waveglow_loss((z, log_s, log_det))
    want = (24 / 2 - 0.5 * 12 - 1.25) / 24
    np.testing.assert_allclose(float(loss), want, rtol=1e-6)


def test_waveglow_loss_decreases_under_training():
    # quick sanity: a few Adam steps on the NLL reduce it
    import optax

    params = _params(jax.random.PRNGKey(4), c=4, n_flows=2)
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 10, 4)) * 2.0

    def loss_fn(p):
        return F.waveglow_loss(F.waveglow_forward(p, x, N_WN))

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    l0 = float(loss_fn(params))

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    for _ in range(30):
        params, opt_state, l = step(params, opt_state)
    assert float(l) < l0


def test_log_s_soft_clamp_stabilizer():
    """Opt-in stabilizer (config.log_s_clamp): bounds |log_s|, stays an
    exact bijection (forward/infer with the same cap), and cap=0 is the
    reference-exact path."""
    params = _params(jax.random.PRNGKey(4), c=8, n_flows=2)
    # blow up the zero-init end convs so raw log_s is huge
    params = jax.tree_util.tree_map(lambda p: p, params)
    for wn in params["wn"]:
        wn["end"]["weight"] = wn["end"]["weight"] + 3.0
        wn["end"]["bias"] = wn["end"]["bias"] + 5.0
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 12, 8))

    cap = 1.5
    z_c, log_s_c, _ = F.waveglow_forward(params, x, N_WN, log_s_clamp=cap)
    for ls in log_s_c:
        assert float(jnp.max(jnp.abs(ls))) <= cap + 1e-6
    x_rec = F.waveglow_infer(params, z_c, N_WN, log_s_clamp=cap)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-3)

    # raw log_s really was out of range (the clamp did something)
    _, log_s_raw, _ = F.waveglow_forward(params, x, N_WN)
    assert float(max(jnp.max(jnp.abs(ls)) for ls in log_s_raw)) > cap

    # cap=0 (default) is bit-identical to the pre-knob path
    z0, _, _ = F.waveglow_forward(params, x, N_WN, log_s_clamp=0.0)
    z_ref, _, _ = F.waveglow_forward(params, x, N_WN)
    np.testing.assert_array_equal(np.asarray(z0), np.asarray(z_ref))
