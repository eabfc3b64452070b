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


def test_im2col_conv_matches_conv_primitive(monkeypatch):
    """The two conv_impl() formulations (ops/osconv.py) agree in value and
    grad — valid conv, dilated 'same' conv, and under vmap with per-run
    weights (the train/multirun.py regime the im2col path exists for)."""
    from feature_level_style_transfer_for_tsc_tpu.models.flow import _dilated_conv_same
    from feature_level_style_transfer_for_tsc_tpu.ops.osconv import _conv_im2col

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 30, 5))
    w = jax.random.normal(jax.random.PRNGKey(1), (7, 5, 11))
    monkeypatch.setenv("FLSTTSC_CONV_IMPL", "conv")
    np.testing.assert_allclose(
        _conv_im2col(x, w), _conv_xla(x, w), rtol=1e-5, atol=1e-5
    )

    def loss(impl, fn, *args):
        monkeypatch.setenv("FLSTTSC_CONV_IMPL", impl)
        return jax.grad(lambda *a: jnp.sum(jnp.sin(fn(*a))), argnums=(0, 1))(*args)

    for ga, gb in zip(loss("conv", _conv_xla, x, w), loss("im2col", _conv_xla, x, w)):
        np.testing.assert_allclose(ga, gb, rtol=1e-4, atol=1e-4)

    xd = jax.random.normal(key, (4, 30, 6))
    wd = jax.random.normal(key, (3, 6, 12))
    b0 = jnp.zeros((12,))
    for dil in (1, 2, 8):
        monkeypatch.setenv("FLSTTSC_CONV_IMPL", "conv")
        want = _dilated_conv_same(xd, wd, b0, dil)
        monkeypatch.setenv("FLSTTSC_CONV_IMPL", "im2col")
        np.testing.assert_allclose(
            _dilated_conv_same(xd, wd, b0, dil), want, rtol=1e-5, atol=1e-5
        )

    # vmapped with per-run weights: one batched dot_general, same numbers
    xv = jnp.stack([x, x + 0.5])
    wv = jnp.stack([w, w * 0.5])
    got = jax.vmap(_conv_im2col)(xv, wv)
    monkeypatch.setenv("FLSTTSC_CONV_IMPL", "conv")
    want = jax.vmap(_conv_xla)(xv, wv)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pallas", [False, True])
def test_tap_conv_matches_xla(monkeypatch, pallas):
    """ops.osconv.tap_conv (collapsed-batch rolled-matmul dilated conv with
    hand-written VJP) matches the XLA dilated conv in value and both grads,
    per dilation and under vmap with per-run weights."""
    from feature_level_style_transfer_for_tsc_tpu.ops.osconv import (
        _tap_conv_xla,
        tap_conv,
    )

    if pallas:
        monkeypatch.setenv("FLSTTSC_USE_PALLAS", "1")
        monkeypatch.setenv("FLSTTSC_PALLAS_INTERPRET", "1")
    else:
        monkeypatch.setenv("FLSTTSC_USE_PALLAS", "0")

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (5, 150, 12))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 12, 24))
    for d in (1, 4, 128):
        xp = jnp.pad(x, ((0, 0), (d, d), (0, 0)))
        want = _tap_conv_xla(xp, w, d)
        np.testing.assert_allclose(tap_conv(xp, w, d), want, rtol=1e-4, atol=1e-4)
        gx, gw = jax.grad(
            lambda a, b: jnp.sum(jnp.sin(tap_conv(a, b, d))), argnums=(0, 1)
        )(xp, w)
        hx, hw = jax.grad(
            lambda a, b: jnp.sum(jnp.sin(_tap_conv_xla(a, b, d))), argnums=(0, 1)
        )(xp, w)
        np.testing.assert_allclose(gx, hx, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(gw, hw, rtol=1e-4, atol=1e-4)

    # vmap with per-run weights (the train/multirun.py regime)
    d = 4
    xv = jnp.pad(jnp.stack([x, x + 0.5]), ((0, 0), (0, 0), (d, d), (0, 0)))
    wv = jnp.stack([w, w * 0.5])
    got = jax.vmap(lambda a, b: tap_conv(a, b, d))(xv, wv)
    want = jax.vmap(lambda a, b: _tap_conv_xla(a, b, d))(xv, wv)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    gv = jax.grad(
        lambda a, b: jnp.sum(jnp.sin(jax.vmap(lambda q, r: tap_conv(q, r, d))(a, b))),
        argnums=(0, 1),
    )(xv, wv)
    hv = jax.grad(
        lambda a, b: jnp.sum(
            jnp.sin(jax.vmap(lambda q, r: _tap_conv_xla(q, r, d))(a, b))
        ),
        argnums=(0, 1),
    )(xv, wv)
    for a, b in zip(gv, hv):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_flow_conv_impl_pallas_matches(monkeypatch):
    """flow._dilated_conv_same under FLSTTSC_CONV_IMPL=pallas equals the conv
    primitive path (XLA fallback on CPU; the kernel itself is covered by
    test_tap_conv_matches_xla in interpret mode)."""
    from feature_level_style_transfer_for_tsc_tpu.models.flow import _dilated_conv_same

    key = jax.random.PRNGKey(0)
    xd = jax.random.normal(key, (4, 30, 6))
    wd = jax.random.normal(key, (3, 6, 12))
    b0 = jnp.ones((12,)) * 0.3
    for dil in (1, 2, 8):
        monkeypatch.setenv("FLSTTSC_CONV_IMPL", "conv")
        want = _dilated_conv_same(xd, wd, b0, dil)
        monkeypatch.setenv("FLSTTSC_CONV_IMPL", "pallas")
        np.testing.assert_allclose(
            _dilated_conv_same(xd, wd, b0, dil), want, rtol=1e-5, atol=1e-5
        )


@pytest.mark.slow  # interpret-mode Pallas on CPU: ~1-2 min each
@pytest.mark.parametrize("shape", [(4, 150, 65), (2, 96, 33), (3, 40, 8)])
def test_wn_fused_matches_wn_apply(monkeypatch, shape):
    """ops/wn_fused.py (single-kernel coupling net, hand-written VJP) matches
    models.flow.wn_apply in value, input grad, and every param grad —
    interpret mode, incl. non-sublane-aligned T and vmapped per-run params."""
    from feature_level_style_transfer_for_tsc_tpu.models import flow as F
    from feature_level_style_transfer_for_tsc_tpu.models.common import (
        weight_norm_weight,
    )
    from feature_level_style_transfer_for_tsc_tpu.ops.wn_fused import wn_apply_fused

    monkeypatch.setenv("FLSTTSC_USE_PALLAS", "0")  # reference path = pure XLA
    monkeypatch.setenv("FLSTTSC_PALLAS_INTERPRET", "1")
    b, t, n_half = shape
    c = 48
    params = F.wn_init(jax.random.PRNGKey(0), n_half, 8, c)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, n_half))

    want = F.wn_apply(params, x, c)
    got = wn_apply_fused(params, x, c, weight_norm_weight)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

    gr = jax.grad(lambda p, xx: jnp.sum(jnp.sin(F.wn_apply(p, xx, c))), argnums=(0, 1))(
        params, x
    )
    gf = jax.grad(
        lambda p, xx: jnp.sum(jnp.sin(wn_apply_fused(p, xx, c, weight_norm_weight))),
        argnums=(0, 1),
    )(params, x)
    np.testing.assert_allclose(gf[1], gr[1], rtol=5e-4, atol=5e-4)
    for (pa, va), (pb, vb) in zip(
        jax.tree_util.tree_flatten_with_path(gr[0])[0],
        jax.tree_util.tree_flatten_with_path(gf[0])[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(vb, va, rtol=5e-4, atol=5e-4, err_msg=str(pa))


@pytest.mark.slow  # interpret-mode Pallas on CPU: ~1-2 min each
def test_wn_fused_vmap_per_run_params(monkeypatch):
    """Vmapped wn_apply_fused with stacked per-run params (the
    train/multirun.py regime) equals per-run sequential application."""
    from feature_level_style_transfer_for_tsc_tpu.models import flow as F
    from feature_level_style_transfer_for_tsc_tpu.models.common import (
        weight_norm_weight,
    )
    from feature_level_style_transfer_for_tsc_tpu.ops.wn_fused import wn_apply_fused

    monkeypatch.setenv("FLSTTSC_USE_PALLAS", "0")
    monkeypatch.setenv("FLSTTSC_PALLAS_INTERPRET", "1")
    n_half, c, k = 17, 32, 3
    ps = [F.wn_init(jax.random.PRNGKey(i), n_half, 8, c) for i in range(k)]
    pk = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *ps)
    xs = jax.random.normal(jax.random.PRNGKey(9), (k, 2, 50, n_half))

    got = jax.vmap(lambda p, x: wn_apply_fused(p, x, c, weight_norm_weight))(pk, xs)
    for i in range(k):
        want = F.wn_apply(ps[i], xs[i], c)
        np.testing.assert_allclose(got[i], want, rtol=3e-4, atol=3e-4)

    # grads flow through the vmapped custom VJP
    def loss(p, x):
        y = jax.vmap(lambda pp, xx: wn_apply_fused(pp, xx, c, weight_norm_weight))(p, x)
        return jnp.sum(jnp.sin(y))

    def loss_ref(p, x):
        y = jax.vmap(lambda pp, xx: F.wn_apply(pp, xx, c))(p, x)
        return jnp.sum(jnp.sin(y))

    gf = jax.grad(loss)(pk, xs)
    gr = jax.grad(loss_ref)(pk, xs)
    for (pa, va), (pb, vb) in zip(
        jax.tree_util.tree_flatten_with_path(gr)[0],
        jax.tree_util.tree_flatten_with_path(gf)[0],
    ):
        np.testing.assert_allclose(vb, va, rtol=5e-4, atol=5e-4, err_msg=str(pa))


@pytest.mark.slow  # interpret-mode Pallas on CPU: ~1-2 min each
def test_wn_fused_xgrad_only(monkeypatch):
    """xgrad_only=True (GradNorm trunk-pullback contract): identical primal,
    d/dx equal to the full core's d/dx, and every weight/bias cotangent an
    exact zero — so a pullback that only consumes feature grads (pipeline
    `pull(i)` for the nf losses) skips the weight-grad gemms entirely."""
    from feature_level_style_transfer_for_tsc_tpu.models import flow as F
    from feature_level_style_transfer_for_tsc_tpu.models.common import (
        weight_norm_weight,
    )
    from feature_level_style_transfer_for_tsc_tpu.ops.wn_fused import wn_apply_fused

    monkeypatch.setenv("FLSTTSC_PALLAS_INTERPRET", "1")
    b, t, n_half, c = 3, 50, 17, 32  # non-sublane-aligned T
    params = F.wn_init(jax.random.PRNGKey(0), n_half, 8, c)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, n_half))

    np.testing.assert_allclose(
        wn_apply_fused(params, x, c, weight_norm_weight, xgrad_only=True),
        wn_apply_fused(params, x, c, weight_norm_weight),
        rtol=0, atol=0,
    )

    def loss(p, xx, xonly):
        return jnp.sum(
            jnp.sin(wn_apply_fused(p, xx, c, weight_norm_weight, xgrad_only=xonly))
        )

    gp_full, gx_full = jax.grad(loss, argnums=(0, 1))(params, x, False)
    gp_x, gx_x = jax.grad(loss, argnums=(0, 1))(params, x, True)
    np.testing.assert_allclose(gx_x, gx_full, rtol=1e-5, atol=1e-6)
    # weight cotangents are declared-zero, not merely small
    for path, leaf in jax.tree_util.tree_flatten_with_path(gp_x)[0]:
        assert float(jnp.max(jnp.abs(leaf))) == 0.0, str(path)
    # and the full path's weight grads are nonzero (the contrast is real)
    assert any(
        float(jnp.max(jnp.abs(l))) > 0
        for l in jax.tree_util.tree_leaves(gp_full)
    )

    # the flag also composes with vmapped per-run params (multirun regime)
    pk = jax.tree_util.tree_map(lambda l: jnp.stack([l, l]), params)
    xk = jnp.stack([x, x])
    gxk = jax.grad(
        lambda xs: jnp.sum(
            jnp.sin(
                jax.vmap(
                    lambda pp, xx: wn_apply_fused(
                        pp, xx, c, weight_norm_weight, xgrad_only=True
                    )
                )(pk, xs)
            )
        )
    )(xk)
    np.testing.assert_allclose(gxk[0], gx_full, rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # interpret-mode Pallas on CPU: ~1-2 min each
def test_wn_fused_bf16_mxu_path(monkeypatch):
    """FLSTTSC_WN_MXU=bf16 feeds the kernel's matmuls bf16 operands with f32
    accumulation — values/grads must track the f32 path to mixed-precision
    tolerance (the path exists to lift vmapped multi-run throughput, see
    docs/DESIGN.md; default stays f32 for reference parity)."""
    from feature_level_style_transfer_for_tsc_tpu.models import flow as F
    from feature_level_style_transfer_for_tsc_tpu.models.common import (
        weight_norm_weight,
    )
    from feature_level_style_transfer_for_tsc_tpu.ops.wn_fused import wn_apply_fused

    monkeypatch.setenv("FLSTTSC_PALLAS_INTERPRET", "1")
    b, t, n_half, c = 4, 150, 65, 48
    params = F.wn_init(jax.random.PRNGKey(0), n_half, 8, c)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, n_half))

    def loss(p, xx):
        return jnp.sum(jnp.sin(wn_apply_fused(p, xx, c, weight_norm_weight)))

    monkeypatch.setenv("FLSTTSC_WN_MXU", "f32")
    v32, g32 = jax.value_and_grad(loss)(params, x)
    monkeypatch.setenv("FLSTTSC_WN_MXU", "bf16")
    v16, g16 = jax.value_and_grad(loss)(params, x)

    np.testing.assert_allclose(v16, v32, rtol=2e-2)
    from jax.flatten_util import ravel_pytree

    f32 = ravel_pytree(g32)[0]
    f16 = ravel_pytree(g16)[0]
    scale = float(jnp.max(jnp.abs(f32)))
    assert float(jnp.max(jnp.abs(f16 - f32))) < 3e-2 * scale
    # and it must actually differ from f32 (the flag engaged)
    assert float(jnp.max(jnp.abs(f16 - f32))) > 0.0
