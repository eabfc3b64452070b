"""Gradient correctness of the custom-VJP ops (pallas paths in interpret)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_gate_grad_matches_xla(monkeypatch):
    monkeypatch.setenv("FLSTTSC_USE_PALLAS", "1")
    monkeypatch.setenv("FLSTTSC_PALLAS_INTERPRET", "1")
    from feature_level_style_transfer_for_tsc_tpu.ops.gate import (
        _gate_xla,
        fused_add_tanh_sigmoid_multiply,
    )

    n = 5
    a = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 2 * n))
    b = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 2 * n))

    def f(a, b):
        return jnp.sum(fused_add_tanh_sigmoid_multiply(a, b, n) ** 2)

    def f_ref(a, b):
        return jnp.sum(_gate_xla(a, b, n) ** 2)

    ga, gb = jax.grad(f, argnums=(0, 1))(a, b)
    ra, rb = jax.grad(f_ref, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), atol=1e-5)


def test_conv_grad_matches_xla(monkeypatch):
    monkeypatch.setenv("FLSTTSC_USE_PALLAS", "1")
    monkeypatch.setenv("FLSTTSC_PALLAS_INTERPRET", "1")
    from feature_level_style_transfer_for_tsc_tpu.ops.osconv import (
        _conv_core,
        _conv_xla,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 4))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 8)) * 0.2

    def f(x, w):
        return jnp.sum(_conv_core(x, w) ** 2)

    def f_ref(x, w):
        return jnp.sum(_conv_xla(x, w) ** 2)

    gx, gw = jax.grad(f, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(f_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-4)
