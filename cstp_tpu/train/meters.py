"""Meters and CSV logging — parity with reference ``utils.py:7-48``."""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, List


class AverageMeter:
    """Running value/average (reference utils.py:7-23)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class Logger:
    """Tab-separated CSV logger with overlay (fresh) vs append (resume) mode
    (reference utils.py:26-48)."""

    def __init__(self, path: str, header: List[str], overlay: bool = True):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if overlay:
            self.log_file = open(path, "w")
            self.logger = csv.writer(self.log_file, delimiter="\t")
            self.logger.writerow(header)
        else:
            self.log_file = open(path, "a")
            self.logger = csv.writer(self.log_file, delimiter="\t")
        self.header = header

    def log(self, values: Dict):
        row = []
        for col in self.header:
            assert col in values, col
            row.append(values[col])
        self.logger.writerow(row)
        self.log_file.flush()

    def close(self):
        self.log_file.close()


class StepTimer:
    """batch_time / data_time meters in the reference's print format
    (main_byol.py:29-32,93-117), plus steps/sec."""

    def __init__(self):
        self.batch_time = AverageMeter()
        self.data_time = AverageMeter()
        self._end = time.time()

    def data_tick(self):
        self.data_time.update(time.time() - self._end)

    def batch_tick(self):
        now = time.time()
        self.batch_time.update(now - self._end)
        self._end = now


def calculate_accuracy(logits, targets) -> float:
    """Top-1 accuracy (reference utils.py:58-66)."""
    import numpy as np

    pred = np.asarray(logits).argmax(axis=-1)
    return float((pred == np.asarray(targets)).mean())
