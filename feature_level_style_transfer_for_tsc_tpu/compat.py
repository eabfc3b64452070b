"""Reference-API compatibility layer.

Users of the reference call (``/root/reference/train_and_test.py:22``):

    train(target_train_dataset, target_test_dataset,
          source_train_dataset, source_test_dataset,
          with_nvidia=False, epoch_num=720)

with datasets built as ``TrainData(root, relpath, label_dict)``
(``DataSource.py``).  This module exposes the same call shape on top of the
TPU pipeline: `TrainData`/`TestData` re-export the native loaders, and
`train` runs the full five-phase curriculum.  ``with_nvidia`` is accepted
and ignored — device placement is JAX's job (the argument only ever meant
"call .cuda()" in the reference).
"""

from __future__ import annotations

from typing import Optional

from .config import PipelineConfig
from .data import TestData, TrainData  # noqa: F401  (re-export)
from .train.pipeline import StyleTransferPipeline


def train(
    target_train_dataset,
    target_test_dataset,
    source_train_dataset,
    source_test_dataset,
    with_nvidia: bool = False,
    epoch_num: int = 720,
    config: Optional[PipelineConfig] = None,
    **run_kwargs,
):
    """Reference-signature entry point; returns (state, history)."""
    del with_nvidia  # JAX owns device placement
    cfg = config or PipelineConfig(joint_epochs=epoch_num)
    pipe = StyleTransferPipeline(
        target_train_dataset.in_channel,
        target_train_dataset.time_length,
        target_train_dataset.num_class,
        source_train_dataset.in_channel,
        source_train_dataset.time_length,
        source_train_dataset.num_class,
        cfg,
    )
    return pipe.run(
        target_train_dataset,
        target_test_dataset,
        source_train_dataset,
        source_test_dataset,
        **run_kwargs,
    )
