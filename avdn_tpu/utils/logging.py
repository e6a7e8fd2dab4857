"""Logging + observability.

Covers the reference's logger utilities (src/utils/logger.py: record files,
ETA printer, cumulative Timer, progress bar) and upgrades them: ``PhaseTimer``
is actually wired into the training loop (the reference's Timer is dead
code), and ``MetricWriter`` emits both plain-text record lines and structured
JSONL (plus TensorBoard if available).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from collections import defaultdict
from typing import Dict, Optional


def write_to_record_file(data: str, file_path: Optional[str], verbose: bool = True):
    if verbose:
        print(data)
    if file_path:
        with open(file_path, "a") as f:
            f.write(data + "\n")


def _as_minutes(s: float) -> str:
    m = math.floor(s / 60)
    return f"{m}m {int(s - m * 60)}s"


def time_since(since: float, fraction: float) -> str:
    """Elapsed / ETA string given progress fraction (logger.py:19-25)."""
    now = time.time()
    s = now - since
    es = s / fraction if fraction > 0 else float("inf")
    return f"{_as_minutes(s)} (- {_as_minutes(max(es - s, 0.0))})"


def print_progress(iteration, total, prefix="", suffix="", decimals=1, bar_length=50):
    fmt = "{0:." + str(decimals) + "f}"
    pct = fmt.format(100 * (iteration / float(total)))
    filled = int(round(bar_length * iteration / float(total)))
    bar = "█" * filled + "-" * (bar_length - filled)
    sys.stdout.write(f"\r{prefix} |{bar}| {pct}% {suffix}")
    if iteration == total:
        sys.stdout.write("\n")
    sys.stdout.flush()


class PhaseTimer:
    """Cumulative per-phase wall timers: ``with timer("render"): ...``;
    ``timer.summary()`` reports totals and shares."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._start: Dict[str, float] = {}

    class _Ctx:
        def __init__(self, timer, name):
            self.timer, self.name = timer, name

        def __enter__(self):
            self.t0 = time.perf_counter()

        def __exit__(self, *exc):
            dt = time.perf_counter() - self.t0
            self.timer.totals[self.name] += dt
            self.timer.counts[self.name] += 1

    def __call__(self, name: str) -> "PhaseTimer._Ctx":
        return PhaseTimer._Ctx(self, name)

    def summary(self) -> str:
        total = sum(self.totals.values()) or 1.0
        parts = [
            f"{k}: {v:.2f}s ({100 * v / total:.0f}%, n={self.counts[k]})"
            for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])
        ]
        return "; ".join(parts)


class MetricWriter:
    """Record-file + JSONL + (optional) TensorBoard scalar writer."""

    def __init__(self, log_dir: str, record_name: str = "train.txt"):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self.record_path = os.path.join(log_dir, record_name)
        self.jsonl_path = os.path.join(log_dir, "metrics.jsonl")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            pass

    def scalars(self, step: int, values: Dict[str, float]):
        rec = {"step": step, **{k: float(v) for k, v in values.items()}}
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(k, float(v), step)

    def text(self, line: str):
        write_to_record_file(line, self.record_path)

    def close(self):
        if self._tb is not None:
            self._tb.close()
