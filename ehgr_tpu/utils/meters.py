"""Host-side metering/logging utilities (ref ``utils.py:54-92``)."""

from __future__ import annotations

import csv
import time
from typing import Dict, List


class AverageMeter:
    """Running value/avg meter with the reference's ``.val``/``.avg``
    semantics (``utils.py:54-71``)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class CsvLogger:
    """Append-mode CSV logger keyed by header names (ref ``utils.py:74-92``)."""

    def __init__(self, path: str, header: List[str], resume: bool = False):
        self.path = path
        self.header = header
        mode = "a" if resume else "w"
        self._fh = open(path, mode, newline="")
        self._writer = csv.writer(self._fh)
        if not resume:
            self._writer.writerow(header)
            self._fh.flush()

    def log(self, row: Dict[str, object]):
        self._writer.writerow([row.get(k, "") for k in self.header])
        self._fh.flush()

    def close(self):
        self._fh.close()


class StepTimer:
    """data_time / batch_time measurement matching the reference hot-loop
    instrumentation (``train_mtmm.py:194-261``)."""

    def __init__(self):
        self.data_time = AverageMeter()
        self.batch_time = AverageMeter()
        self._end = time.time()

    def data_ready(self):
        self.data_time.update(time.time() - self._end)

    def step_done(self):
        self.batch_time.update(time.time() - self._end)
        self._end = time.time()
