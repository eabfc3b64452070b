"""Fused WaveNet gate: ``tanh(x[...,:n]) * sigmoid(x[...,n:])`` on ``x=a+b``.

This is the one op the reference explicitly fuses (a `@torch.jit.script`
kernel, Simplified_NF_WaveGlow.py:44-54).  Here it is a Pallas TPU kernel
(VPU elementwise, one pass over VMEM) with an XLA fallback that the compiler
fuses equally well; both paths are numerically identical.

Layout is channel-last: a, b are (..., 2*n) and the result is (..., n).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_interpret, use_pallas


def _gate_xla(a: jax.Array, b: jax.Array, n: int) -> jax.Array:
    x = a + b
    return jnp.tanh(x[..., :n]) * jax.nn.sigmoid(x[..., n:])


def _gate_kernel(a_ref, b_ref, out_ref, *, n: int):
    x = a_ref[:] + b_ref[:]
    out_ref[:] = jnp.tanh(x[:, :n]) * jax.nn.sigmoid(x[:, n:])


@functools.partial(jax.jit, static_argnames=("n", "row_tile"))
def _gate_pallas(a: jax.Array, b: jax.Array, n: int, row_tile: int = 256) -> jax.Array:
    lead = a.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    a2 = a.reshape(m, 2 * n)
    b2 = b.reshape(m, 2 * n)
    grid = (pl.cdiv(m, row_tile),)
    out = pl.pallas_call(
        functools.partial(_gate_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((m, n), a.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, 2 * n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, 2 * n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=pallas_interpret(),
    )(a2, b2)
    return out.reshape(*lead, n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gate(a: jax.Array, b: jax.Array, n: int) -> jax.Array:
    if use_pallas():
        return _gate_pallas(a, b, n)
    return _gate_xla(a, b, n)


def _gate_fwd(a, b, n):
    x = a + b
    return _gate(a, b, n), x


def _gate_bwd(n, x, g):
    # y = tanh(t) * sigmoid(s) with t = x[..., :n], s = x[..., n:]
    t = jnp.tanh(x[..., :n])
    s = jax.nn.sigmoid(x[..., n:])
    dt = g * (1.0 - t * t) * s
    ds = g * t * s * (1.0 - s)
    dx = jnp.concatenate([dt, ds], axis=-1)
    return dx, dx


_gate.defvjp(_gate_fwd, _gate_bwd)


def fused_add_tanh_sigmoid_multiply(a: jax.Array, b: jax.Array, n: int) -> jax.Array:
    """Gate of the WN coupling network (reference fused op parity)."""
    if a.shape != b.shape or a.shape[-1] != 2 * n:
        raise ValueError(f"expected (..., {2*n}) inputs, got {a.shape} and {b.shape}")
    return _gate(a, b, n)
