"""Scalar meters and the tab-separated epoch-log writer.

The ON-DISK format is byte-compatible with the reference's csv.writer-based
epoch logs (``utils.py:26-48``: tab delimiter, CRLF line endings, header row
only on fresh runs) so downstream log-parsing tooling works across both
frameworks — the *implementation* here is this repo's own (dataclass meters,
explicit formatting, context-manager file handling).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Dict, Mapping, Sequence

# csv.writer's default lineterminator, kept for byte-compatibility with
# reference-produced logs.
_EOL = "\r\n"


@dataclass
class AverageMeter:
    """Streaming mean over weighted scalar updates."""

    val: float = 0.0
    sum: float = 0.0
    count: int = 0

    @property
    def avg(self) -> float:
        return self.sum / self.count if self.count else 0.0

    def reset(self) -> None:
        self.val, self.sum, self.count = 0.0, 0.0, 0

    def update(self, value: float, n: int = 1) -> None:
        self.val = value
        self.sum += value * n
        self.count += n


def _render_row(cells: Sequence) -> str:
    # csv.writer renders None as the empty string (the reference logs
    # acc=None every pretrain epoch, main_byol.py:127) — match that.
    return "\t".join("" if c is None else str(c) for c in cells) + _EOL


class Logger:
    """Tab-separated epoch log.

    ``overlay=True`` truncates and writes the header (fresh run);
    ``overlay=False`` appends without a header (resume — the mode switch the
    reference drives from its resume task, utils.py:33-35).
    """

    def __init__(self, path: str, header: Sequence[str], overlay: bool = True):
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        self.header = tuple(header)
        # newline='' so _EOL passes through untranslated on every platform
        self._fh = open(path, "w" if overlay else "a", newline="")
        if overlay:
            self._fh.write(_render_row(self.header))

    def log(self, values: Mapping) -> None:
        missing = [c for c in self.header if c not in values]
        if missing:
            raise KeyError(f"log row missing columns {missing}")
        self._fh.write(_render_row([values[c] for c in self.header]))
        self._fh.flush()

    def close(self) -> None:
        self._fh.close()

    def __enter__(self) -> "Logger":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


@dataclass
class StepTimer:
    """Tracks per-step wall time split into data-wait and total-step parts,
    surfaced in the reference's ``Time x.xxx (avg)  Data x.xxx (avg)`` print
    format (main_byol.py:29-32,93-117)."""

    batch_time: AverageMeter = field(default_factory=AverageMeter)
    data_time: AverageMeter = field(default_factory=AverageMeter)
    _mark: float = field(default_factory=time.time)

    def data_tick(self) -> None:
        self.data_time.update(time.time() - self._mark)

    def batch_tick(self) -> None:
        now = time.time()
        self.batch_time.update(now - self._mark)
        self._mark = now


def calculate_accuracy(logits, targets) -> float:
    """Batch top-1 accuracy from logits + integer targets."""
    import numpy as np

    pred = np.asarray(logits).argmax(axis=-1)
    return float((pred == np.asarray(targets)).mean())
