"""Concurrent training of heterogeneous multi-source pipelines.

The K source->target adaptation runs are independent programs with
DIFFERENT shapes (each source has its own (C_s, T_s) and hence its own
compiled pipeline), so they cannot be vmapped/stacked like the voting
ensemble.  They are, however, embarrassingly parallel: this module
round-robins them across the mesh's devices, one Python thread per member.
JAX dispatch is async and compilation releases the GIL, so compiles and
device execution overlap across members; each thread pins its work with
``jax.default_device``.

On the single-chip environment this degrades gracefully to sequential
execution on one device; on a pod slice each member owns a chip.  The
reference has no equivalent — multi-source is K sequential full runs
(SURVEY §2.6).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, List, Optional, Sequence

import jax


def train_members_parallel(
    member_fns: Sequence[Callable[[], object]],
    devices: Optional[Sequence] = None,
) -> List[object]:
    """Run each ``member_fns[i]()`` with a device pinned round-robin.

    Each callable should build + train one member pipeline and return its
    result (e.g. a {'params','mstate'} dict).  Returns results in order.
    """
    devs = list(devices if devices is not None else jax.devices())

    def run(i_fn):
        i, fn = i_fn
        with jax.default_device(devs[i % len(devs)]):
            return fn()

    if len(devs) == 1 or len(member_fns) == 1:
        return [run((i, fn)) for i, fn in enumerate(member_fns)]
    with ThreadPoolExecutor(max_workers=min(len(member_fns), len(devs))) as ex:
        return list(ex.map(run, enumerate(member_fns)))
