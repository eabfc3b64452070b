"""Native `.ts` (UCR/UEA sktime format) parser.

The reference loads datasets with `sktime.datasets.load_from_tsfile`
(`/root/reference/DataSource.py:3,12-14`) returning a numpy3d ``[N, C, T]``
float array plus string labels.  This is a dependency-free replacement that
parses the standard `.ts` layout:

* ``#`` comment lines;
* ``@problemName/@univariate/@dimensions/@seriesLength/...`` header tags;
* ``@classLabel true <labels...>``;
* ``@data`` followed by one case per line, dimensions separated by ``:``,
  values comma-separated, the final field being the class label;
* ``?`` marks a missing value (mapped to NaN).

Unequal-length datasets are right-padded with NaN to the maximum length
(sktime's numpy3d would refuse them; padding is the TPU-friendly choice —
static shapes — and the z-normalized UCR archive is equal-length anyway).
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np


def load_from_tsfile(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse a .ts file -> (X[N, C, T] float32, y[N] of strings).

    Uses the native C++ parser (native/ts_parser.cpp via ctypes) when the
    toolchain is available; otherwise the pure-python path below.
    """
    from .native import load_from_tsfile_native, native_available

    if not os.path.exists(path):
        raise FileNotFoundError(f"no such .ts file: {path}")
    if native_available():
        return load_from_tsfile_native(path)
    return _load_from_tsfile_py(path)


def _load_from_tsfile_py(path: str) -> Tuple[np.ndarray, np.ndarray]:
    with open(path, "r", encoding="utf-8") as f:
        lines = f.readlines()

    data_started = False
    has_class_labels = False
    cases: List[List[np.ndarray]] = []
    labels: List[str] = []

    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if not data_started:
            low = line.lower()
            if low.startswith("@classlabel"):
                parts = line.split()
                has_class_labels = len(parts) > 1 and parts[1].lower() == "true"
            elif low.startswith("@targetlabel"):
                parts = line.split()
                has_class_labels = len(parts) > 1 and parts[1].lower() == "true"
            elif low.startswith("@data"):
                data_started = True
            continue

        # data line
        if has_class_labels:
            body, _, label = line.rpartition(":")
            labels.append(label.strip())
        else:
            body = line
        dims = body.split(":")
        case = []
        for dim in dims:
            vals = [
                np.nan if v.strip() in ("?", "") else float(v)
                for v in dim.split(",")
            ] if dim else []
            case.append(np.asarray(vals, np.float32))
        cases.append(case)

    if not cases:
        raise ValueError(f"no data lines found in {path}")

    n = len(cases)
    c = max(len(case) for case in cases)
    t = max(len(d) for case in cases for d in case)
    x = np.full((n, c, t), np.nan, np.float32)
    for i, case in enumerate(cases):
        for j, dim in enumerate(case):
            x[i, j, : len(dim)] = dim
    y = np.asarray(labels if has_class_labels else [""] * n)
    return x, y


def load_dataset_split(root: str, relpath: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load ``os.path.join(root, relpath)`` like the reference's
    ``TrainData(file_path_begin, file_path_end)`` (DataSource.py:12-14)."""
    return load_from_tsfile(os.path.join(root, relpath))
