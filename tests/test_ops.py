"""Op-level tests: masked conv vs explicit multi-branch conv, gate, BN, GRL."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feature_level_style_transfer_for_tsc_tpu.ops import (
    batch_norm,
    build_os_mask,
    fused_add_tanh_sigmoid_multiply,
    gradient_reversal,
    grl_coeff,
    masked_os_conv,
)
from feature_level_style_transfer_for_tsc_tpu.ops.batchnorm import init_bn_stats
from feature_level_style_transfer_for_tsc_tpu.ops.osconv import (
    _conv_pallas,
    _conv_xla,
    init_os_conv_params,
)


def _explicit_branches(x, weight, mask, spec):
    """Golden: run each branch as its own centered 'same' conv."""
    outs = []
    col = 0
    K = spec[-1][-1]
    pad_l, pad_r = (K - 1) // 2, K // 2
    x_pad = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
    w = weight * mask
    for (_, out_ch, k) in spec:
        wb = w[:, :, col : col + out_ch]
        y = jax.lax.conv_general_dilated(
            x_pad, wb, (1,), "VALID", dimension_numbers=("NWC", "WIO", "NWC")
        )
        outs.append(y)
        col += out_ch
    return jnp.concatenate(outs, axis=-1)


def test_masked_conv_equals_explicit_branches():
    spec = [(3, 4, 1), (3, 4, 2), (3, 4, 3), (3, 4, 5)]
    key = jax.random.PRNGKey(0)
    params = init_os_conv_params(key, spec)
    mask = jnp.asarray(build_os_mask(spec))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 3))
    got = masked_os_conv(x, params["weight"], params["bias"], mask)
    want = _explicit_branches(x, params["weight"], mask, spec) + params["bias"]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_masked_conv_init_respects_mask():
    spec = [(2, 3, 1), (2, 3, 3), (2, 3, 5)]
    params = init_os_conv_params(jax.random.PRNGKey(0), spec)
    mask = build_os_mask(spec)
    # weights outside mask band are zero at init
    np.testing.assert_array_equal(np.asarray(params["weight"]) * (1 - mask), 0.0)


def test_pallas_conv_interpret_matches_xla(monkeypatch):
    monkeypatch.setenv("FLSTTSC_PALLAS_INTERPRET", "1")
    x_pad = jax.random.normal(jax.random.PRNGKey(0), (2, 40, 8))
    w = jax.random.normal(jax.random.PRNGKey(1), (5, 8, 16)) * 0.1
    got = _conv_pallas(x_pad, w)
    want = _conv_xla(x_pad, w)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_gate_matches_reference_math():
    n = 6
    a = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 2 * n))
    b = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 2 * n))
    got = fused_add_tanh_sigmoid_multiply(a, b, n)
    x = a + b
    want = jnp.tanh(x[..., :n]) * jax.nn.sigmoid(x[..., n:])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_gate_pallas_interpret(monkeypatch):
    monkeypatch.setenv("FLSTTSC_USE_PALLAS", "1")
    monkeypatch.setenv("FLSTTSC_PALLAS_INTERPRET", "1")
    n = 4
    a = jax.random.normal(jax.random.PRNGKey(0), (3, 7, 2 * n))
    b = jax.random.normal(jax.random.PRNGKey(1), (3, 7, 2 * n))
    got = fused_add_tanh_sigmoid_multiply(a, b, n)
    x = a + b
    want = jnp.tanh(x[..., :n]) * jax.nn.sigmoid(x[..., n:])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_batch_norm_torch_semantics():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 10, 3)) * 2 + 1
    scale, bias = jnp.ones((3,)), jnp.zeros((3,))
    stats = init_bn_stats(3)
    y, new_stats = batch_norm(x, scale, bias, stats, training=True)
    # normalized output has ~zero mean/unit var per channel
    np.testing.assert_allclose(np.asarray(jnp.mean(y, axis=(0, 1))), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.std(y, axis=(0, 1))), 1.0, atol=1e-3)
    # running stats updated with momentum 0.1 toward batch stats (unbiased var)
    n = 40
    bm = jnp.mean(x, axis=(0, 1))
    bv = jnp.var(x, axis=(0, 1)) * n / (n - 1)
    np.testing.assert_allclose(new_stats.mean, 0.9 * 0 + 0.1 * bm, atol=1e-5)
    np.testing.assert_allclose(new_stats.var, 0.9 * 1 + 0.1 * bv, atol=1e-5)
    # eval mode uses running stats and leaves them unchanged
    y2, same = batch_norm(x, scale, bias, new_stats, training=False)
    assert np.all(np.asarray(same.mean) == np.asarray(new_stats.mean))


def test_grl_flips_gradient():
    def f(x):
        return jnp.sum(gradient_reversal(x, jnp.float32(2.5)) ** 2)

    x = jnp.array([1.0, -2.0])
    g = jax.grad(f)(x)
    np.testing.assert_allclose(g, -2.5 * 2 * x, atol=1e-6)


def test_grl_coeff_schedule():
    # parity with calc_coeff: iter=0 -> 0; iter=max_iter -> ~1 (alpha=100)
    assert float(grl_coeff(0)) == pytest.approx(0.0, abs=1e-6)
    assert float(grl_coeff(50, alpha=100.0, max_iter=50.0)) == pytest.approx(1.0, abs=1e-6)
    # clamping beyond max_iter
    assert float(grl_coeff(500, max_iter=20.0)) == float(grl_coeff(20, max_iter=20.0))
    # reference formula value at mid-anneal
    it, alpha, max_iter = 5, 100.0, 20.0
    want = 2.0 / (1.0 + np.exp(-alpha * it / max_iter)) - 1.0
    assert float(grl_coeff(it, alpha=alpha, max_iter=max_iter)) == pytest.approx(want, rel=1e-5)


def test_fused_infer_layer_matches_unfused(monkeypatch):
    """Eval-mode fused conv+foldedBN+ReLU epilogue == conv -> batch_norm ->
    relu, on both the XLA fallback and the (interpreted) Pallas kernel."""
    from feature_level_style_transfer_for_tsc_tpu.models.os_cnn import (
        os_layer_apply,
        os_layer_init,
    )

    spec = [(3, 4, 1), (3, 4, 3), (3, 4, 5)]
    params, state = os_layer_init(jax.random.PRNGKey(0), spec)
    # non-trivial running stats + affine
    state = {
        "bn": init_bn_stats(12)._replace(
            mean=jnp.linspace(-0.5, 0.5, 12), var=jnp.linspace(0.5, 2.0, 12)
        )
    }
    params = dict(params, bn_scale=jnp.linspace(0.5, 1.5, 12),
                  bn_bias=jnp.linspace(-0.2, 0.2, 12))
    mask = jnp.asarray(build_os_mask(spec))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 3))

    want, st0 = os_layer_apply(params, state, mask, x, False, True)
    for pallas in ("0", "1"):
        monkeypatch.setenv("FLSTTSC_USE_PALLAS", pallas)
        monkeypatch.setenv("FLSTTSC_PALLAS_INTERPRET", "1")
        got, st1 = os_layer_apply(
            params, state, mask, x, False, True, fused_infer=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
        # eval mode: stats unchanged
        np.testing.assert_array_equal(np.asarray(st1["bn"].mean), np.asarray(st0["bn"].mean))
