"""Analysis artifacts: intermediate-feature dumps and prediction strips.

Parity with the reference's outputs: per-epoch .npy dumps of six
intermediate feature sets for t-SNE (train_and_test.py:792-797) and the
paletted correct/incorrect PNG strips of `visualization.py:443-521`.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def save_feature_dumps(out_dir: str, epoch: int, feats: Dict[str, np.ndarray]) -> None:
    """Save the six feature sets the reference dumps every 2 epochs.

    feats maps {'t_feat','s2t_feat','s_feat','s_pool','t2s_pool','s2t2s_pool'}
    to arrays whose leading axes are (num_batches, batch, ...) — flattened to
    (N, ...) like the reference's concatenated batches.
    """
    t_dir = os.path.join(out_dir, "feature_of_target_s2t")
    s_dir = os.path.join(out_dir, "feature_of_source_t2s")
    os.makedirs(t_dir, exist_ok=True)
    os.makedirs(s_dir, exist_ok=True)

    def flat(a):
        a = np.asarray(a)
        return a.reshape(-1, *a.shape[2:])

    np.save(os.path.join(t_dir, f"epoch_{epoch}target_feature.npy"), flat(feats["t_feat"]))
    np.save(os.path.join(t_dir, f"epoch_{epoch}s2t_feature.npy"), flat(feats["s2t_feat"]))
    np.save(os.path.join(t_dir, f"epoch_{epoch}source_feature.npy"), flat(feats["s_feat"]))
    np.save(os.path.join(s_dir, f"epoch_{epoch}source_feature.npy"), flat(feats["s_pool"]))
    np.save(os.path.join(s_dir, f"epoch_{epoch}target_feature.npy"), flat(feats["t2s_pool"]))
    np.save(os.path.join(s_dir, f"epoch_{epoch}s2t2s_feature.npy"), flat(feats["s2t2s_pool"]))


def save_prediction_strip(
    path: str,
    predictions: np.ndarray,
    labels: np.ndarray,
    cell: int = 10,
    per_row: int = 40,
) -> None:
    """Render per-sample correct (green) / incorrect (red) cells as a PNG.

    Equivalent of visualization.py:443-521's paletted strips.
    """
    from PIL import Image

    correct = (np.asarray(predictions) == np.asarray(labels)).astype(np.uint8)
    n = len(correct)
    rows = -(-n // per_row)
    img = np.full((rows * cell, per_row * cell, 3), 255, np.uint8)
    for i, ok in enumerate(correct):
        r, c = divmod(i, per_row)
        color = (60, 180, 75) if ok else (230, 25, 75)
        img[r * cell : (r + 1) * cell - 1, c * cell : (c + 1) * cell - 1] = color
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(img).save(path)
