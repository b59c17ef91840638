"""Structured metrics logging.

The reference logs with bare ``print`` every N steps (trainer.py:439-441,
pretrain_DAMSM.py:199-215) and imports-but-never-uses tensorboardX.  Here a
single writer emits (a) an append-only ``metrics.jsonl`` for machines and
(b) periodic console lines for humans, with wall-clock step timing built in
(SURVEY §5: profiling from day one).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, log_dir: str, print_every: int = 50,
                 console: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a", buffering=1)
        self.print_every = print_every
        self.console = console
        self._last_time: Optional[float] = None
        self._last_step: Optional[int] = None

    def log(self, step: int, metrics: Dict, prefix: str = "train"):
        now = time.time()
        record = {"step": int(step), "time": now, "prefix": prefix}
        for k, v in metrics.items():
            try:
                record[k] = float(v)
            except (TypeError, ValueError):
                continue
        if self._last_time is not None and step != self._last_step:
            record["sec_per_step"] = ((now - self._last_time) /
                                      max(1, step - (self._last_step or 0)))
        self._f.write(json.dumps(record) + "\n")
        if self.console and step % self.print_every == 0:
            parts = " ".join(f"{k}: {record[k]:.4f}" for k in record
                             if isinstance(record[k], float)
                             and k not in ("time",))
            print(f"[{prefix} step {step}] {parts}")
        self._last_time, self._last_step = now, step

    def close(self):
        self._f.close()


class StepTimer:
    """Rolling images/sec + ms/step meter (replaces the reference's manual
    elapsed-time prints, pretrain_DAMSM.py:208-215)."""

    def __init__(self, batch_size: int, window: int = 20):
        self.batch_size = batch_size
        self.window = window
        self.times = []

    def tick(self):
        self.times.append(time.time())
        if len(self.times) > self.window + 1:
            self.times.pop(0)

    @property
    def ms_per_step(self) -> float:
        if len(self.times) < 2:
            return float("nan")
        return 1000.0 * (self.times[-1] - self.times[0]) / (len(self.times) - 1)

    @property
    def images_per_sec(self) -> float:
        ms = self.ms_per_step
        return self.batch_size / (ms / 1000.0) if ms == ms and ms > 0 else float("nan")
