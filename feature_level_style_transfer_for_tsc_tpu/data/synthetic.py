"""Synthetic time-series classification datasets for tests and benchmarks.

The UCR/UEA archives are not shipped with the repo, so tests and the
benchmark generate class-separable synthetic series (distinct frequencies /
phases per class + noise, z-normalized per channel like the archive data).
A `.ts` writer round-trips through the native parser so the full data path
is exercised end-to-end.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .dataset import TsClassificationData


def make_arrays(
    n: int,
    channels: int,
    length: int,
    num_class: int,
    seed: int = 0,
    noise: float = 0.3,
) -> tuple:
    """(X[N, C, T] float32, y[N] str) with per-class frequency signatures."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, num_class, size=n)
    t = np.arange(length, dtype=np.float32)[None, None, :]  # (1,1,T)
    freqs = 1.0 + np.arange(num_class, dtype=np.float32) * 0.7
    phase = rng.uniform(0, 2 * np.pi, size=(n, channels, 1)).astype(np.float32)
    chan_scale = 1.0 + 0.3 * np.arange(channels, dtype=np.float32)[None, :, None]
    f = freqs[y][:, None, None]
    x = np.sin(2 * np.pi * f * t / length * 4 + phase) * chan_scale
    x += noise * rng.standard_normal((n, channels, length)).astype(np.float32)
    # per-series per-channel z-normalization, like the UCR archive
    x = (x - x.mean(axis=-1, keepdims=True)) / (x.std(axis=-1, keepdims=True) + 1e-8)
    labels = np.asarray([f"cls_{int(v)}" for v in y])
    return x.astype(np.float32), labels


def make_dataset(
    n: int,
    channels: int,
    length: int,
    num_class: int,
    seed: int = 0,
    label_dict: Optional[dict] = None,
    is_train: bool = True,
) -> TsClassificationData:
    arrays = make_arrays(n, channels, length, num_class, seed)
    if label_dict is None:
        label_dict = {}
    return TsClassificationData(label_dict=label_dict, is_train=is_train, arrays=arrays)


def write_ts_file(path: str, x: np.ndarray, y: np.ndarray, problem: str = "Synthetic"):
    """Write (X[N,C,T], y[N]) in sktime .ts format."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    n, c, t = x.shape
    classes = sorted(set(y.tolist()))
    with open(path, "w", encoding="utf-8") as f:
        f.write(f"@problemName {problem}\n")
        f.write("@timeStamps false\n")
        f.write(f"@univariate {'true' if c == 1 else 'false'}\n")
        if c > 1:
            f.write(f"@dimensions {c}\n")
        f.write("@equalLength true\n")
        f.write(f"@seriesLength {t}\n")
        f.write(f"@classLabel true {' '.join(classes)}\n")
        f.write("@data\n")
        for i in range(n):
            dims = [",".join(f"{v:.6f}" for v in x[i, j]) for j in range(c)]
            f.write(":".join(dims) + ":" + str(y[i]) + "\n")
