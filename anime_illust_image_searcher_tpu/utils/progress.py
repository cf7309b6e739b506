"""Throughput telemetry.

The reference prints elapsed seconds + sec/file every PROGRESS_INTERVAL files
(tagging.py:342-351, gen_cfeatures.py:428-437). This keeps that surface and adds
images/sec (the benchmark metric) and an optional JSON line for machine consumption.
"""

from __future__ import annotations

import json
import time
from typing import Optional


class ProgressMeter:
    def __init__(self, interval: int, label: str = "files", emit_json: bool = False) -> None:
        self.interval = interval
        self.label = label
        self.emit_json = emit_json
        self.start = time.perf_counter()
        self.count = 0
        self._last_reported = 0

    def add(self, n: int = 1) -> None:
        self.count += n
        if self.count - self._last_reported >= self.interval:
            self.report()
            self._last_reported = self.count

    def elapsed(self) -> float:
        return time.perf_counter() - self.start

    def rate(self) -> float:
        el = self.elapsed()
        return self.count / el if el > 0 else 0.0

    def report(self, final: bool = False) -> None:
        diff = self.elapsed()
        print(f"{self.count} {self.label} processed")
        print("{:.2f} seconds elapsed".format(diff))
        if self.count > 0:
            print("{:.4f} seconds per file".format(diff / self.count))
        if self.emit_json:
            print(json.dumps({
                "count": self.count,
                "elapsed_s": round(diff, 3),
                "rate_per_s": round(self.rate(), 3),
                "final": final,
            }))
        print("", flush=True)


class Timer:
    """Context-manager wall-clock timer for benches/tests."""

    def __init__(self) -> None:
        self.seconds: Optional[float] = None

    def __enter__(self) -> "Timer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.seconds = time.perf_counter() - self._t0
