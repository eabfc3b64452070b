"""Append-to-file training logs.

Parity with the reference's ad-hoc log files (`train_log/log.txt`,
train_and_test.py:642-644; `numpy_saved_with_accuracy/the_log.txt`,
utils.py:49-51) — but fed from per-epoch jitted metrics instead of
per-batch host syncs.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class FileLogger:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, record: Dict) -> None:
        rec = {"ts": time.time(), **record}
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps(rec, default=str) + "\n")
