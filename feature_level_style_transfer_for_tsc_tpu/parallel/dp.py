"""Data parallelism via GSPMD sharding annotations.

No shard_map or manual collectives are needed for DP: the pipeline's jitted
epoch functions are pure, so placing the per-batch axis of the stacked epoch
arrays on the "data" mesh axis and replicating the train state lets XLA's
SPMD partitioner insert the `psum`s — gradients (summed via the chain rule
through the batch-mean losses) and BatchNorm batch statistics are reduced
across devices automatically, keeping the math identical to single-device
execution (verified in tests/test_parallel.py).

If the partitioner's choices ever regress on a new shape, the hand-written
collective path in `parallel/dp_explicit.py` (shard_map: psum'd grads,
psum'd BatchNorm moments, all_gather'd InfoNCE negatives) is the fallback;
it is held equal to the single-device epoch by tests/test_dp_explicit.py.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import replicated


def shard_epoch_batches(mesh: Mesh, xb, yb):
    """Place (nb, B, ...) stacked epoch batches with B sharded over "data"."""
    xsh = NamedSharding(mesh, P(None, "data"))
    ysh = NamedSharding(mesh, P(None, "data"))
    return jax.device_put(xb, xsh), jax.device_put(yb, ysh)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (train state) across the mesh."""
    sh = replicated(mesh)
    return jax.device_put(tree, sh)
