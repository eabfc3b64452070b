"""Sequence parallelism: time-axis sharding for very long series.

The reference has no long-context handling beyond capping the receptive
field at min(T/4, 89) (SURVEY §5).  For series too long for one chip's
VMEM/HBM, the TPU-native option is to shard the TIME axis across a mesh
axis and exchange conv halos between neighboring shards with
`jax.lax.ppermute` — the 1-D analogue of ring/halo attention.

`time_sharded_os_conv` is the working primitive: a masked omni-scale "same"
conv whose input (B, T, C) is sharded along T.  Each shard:

1. sends its last ``pad_l`` rows to its right neighbor and its first
   ``pad_r`` rows to its left neighbor (two ppermutes over ICI);
2. boundary shards substitute zeros — exactly the reference's asymmetric
   zero padding ((K-1)//2, K//2), so the result is bit-comparable to the
   unsharded op;
3. runs the local VALID conv on [left_halo | local | right_halo].

Verified equal to the unsharded `masked_os_conv` on the test mesh; the flow
(1x1 convs + pointwise couplings + dilated convs) shards the same way, with
dilated halo sizes ``dilation * (k-1)//2``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.osconv import _conv_xla


def time_sharded_os_conv(
    mesh: Mesh,
    x: jax.Array,  # (B, T, C_in), T divisible by the axis size
    weight: jax.Array,  # (K, C_in, C_out)
    bias: jax.Array,
    mask: jax.Array,
    axis: str = "data",
) -> jax.Array:
    k = weight.shape[0]
    pad_l, pad_r = (k - 1) // 2, k // 2
    w = weight * mask
    n_shards = mesh.shape[axis]

    def shard_fn(x_local, w, bias):
        idx = jax.lax.axis_index(axis)
        # halo from the LEFT neighbor: its trailing pad_l rows
        send_right = x_local[:, -pad_l:, :] if pad_l else jnp.zeros(
            (x_local.shape[0], 0, x_local.shape[2]), x_local.dtype
        )
        left_halo = jax.lax.ppermute(
            send_right, axis, [(i, (i + 1) % n_shards) for i in range(n_shards)]
        )
        # halo from the RIGHT neighbor: its leading pad_r rows
        send_left = x_local[:, :pad_r, :] if pad_r else jnp.zeros(
            (x_local.shape[0], 0, x_local.shape[2]), x_local.dtype
        )
        right_halo = jax.lax.ppermute(
            send_left, axis, [(i, (i - 1) % n_shards) for i in range(n_shards)]
        )
        # boundary shards use zero padding (reference "same" conv semantics)
        left_halo = jnp.where(idx == 0, jnp.zeros_like(left_halo), left_halo)
        right_halo = jnp.where(
            idx == n_shards - 1, jnp.zeros_like(right_halo), right_halo
        )
        x_ext = jnp.concatenate([left_halo, x_local, right_halo], axis=1)
        return _conv_xla(x_ext, w) + bias

    shard = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(), P()),
        out_specs=P(None, axis, None),
    )
    x = jax.device_put(x, NamedSharding(mesh, P(None, axis, None)))
    return shard(x, w, bias)
