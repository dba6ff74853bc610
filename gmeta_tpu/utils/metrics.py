"""Structured metric stream: jsonl + stdout.

The reference's only observability is print statements
(G-Meta/train.py:110-111,124,137,146-148; SURVEY.md §5.5). Here every metric
event is a typed jsonl record (step, wall time, payload) so throughput
(tasks/s), accuracy curves, NaN skips, and memory are machine-readable,
while keeping the human-readable per-step line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional

try:
    import psutil
except ImportError:  # psutil is baked into the image, but stay safe
    psutil = None


def rss_gb() -> float:
    if psutil is None:
        return 0.0
    return float(psutil.virtual_memory().used / (1024 ** 3))


class MetricLogger:
    def __init__(self, path: str = "", echo: bool = True):
        self.path = path
        self.echo = echo
        self._f = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a", buffering=1)
        self.t0 = time.time()

    def log(self, kind: str, **payload):
        rec = {"kind": kind, "t": round(time.time() - self.t0, 4), **payload}
        if self._f is not None:
            self._f.write(json.dumps(rec, default=float) + "\n")
        return rec

    def echo_line(self, msg: str):
        if self.echo:
            print(msg, flush=True)

    def close(self):
        if self._f is not None:
            self._f.close()
            self._f = None


class StepTimer:
    """Splits wall time into data-loading vs compute, like the reference's
    per-step telemetry (train.py:99-111)."""

    def __init__(self):
        self.last = time.time()

    def split(self) -> float:
        now = time.time()
        dt = now - self.last
        self.last = now
        return dt
