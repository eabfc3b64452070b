"""Device mesh setup for the framework's two parallel axes.

The reference is single-GPU with no distributed backend (SURVEY §2.6); the
TPU-native design introduces:

* ``"data"``   — batch (data) parallelism: per-batch shards, gradients and
  BatchNorm batch statistics reduced over ICI by XLA-inserted collectives;
* ``"domain"`` — source-domain parallelism: the K independent source->target
  adaptation models (identical target-shaped stacks) live stacked along a
  leading axis sharded over this axis; ensemble voting reduces across it
  with one `psum` instead of the reference's sequential host loop
  (multi_source_voting.py:405-424).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    domain: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh with axes ("data", "domain").  Defaults: all devices on data."""
    devs = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devs) // domain
    assert data * domain <= len(devs), (
        f"need {data * domain} devices, have {len(devs)}"
    )
    grid = np.asarray(devs[: data * domain]).reshape(data, domain)
    return Mesh(grid, ("data", "domain"))


def data_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Shard an array's batch axis over "data"."""
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def domain_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a stacked-models leading axis over "domain"."""
    return NamedSharding(mesh, P("domain"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
