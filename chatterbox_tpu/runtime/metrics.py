"""Lightweight serving metrics.

The reference's observability is timestamped logs only (SURVEY.md §5.1/§5.5);
here the engine additionally feeds an in-process metrics registry surfaced
via /system-status: request counts, time-to-first-audio percentiles, decode
throughput, synthesized audio seconds. Zero external dependencies.
"""
from __future__ import annotations

import threading
import time
from collections import deque
from typing import Deque, Dict


class _Percentiles:
    def __init__(self, maxlen: int = 512):
        self._values: Deque[float] = deque(maxlen=maxlen)

    def add(self, v: float) -> None:
        self._values.append(v)

    def snapshot(self) -> Dict[str, float]:
        if not self._values:
            return {}
        vals = sorted(self._values)

        def pct(p: float) -> float:
            i = min(len(vals) - 1, int(p * len(vals)))
            return round(vals[i], 4)

        return {"p50": pct(0.50), "p90": pct(0.90), "p99": pct(0.99), "count": len(vals)}


class Metrics:
    def __init__(self):
        self._lock = threading.Lock()
        self.started_at = time.time()
        self.requests_total = 0
        self.requests_failed = 0
        self.requests_cancelled = 0
        self.tokens_generated = 0
        self.audio_seconds = 0.0
        self.ttfa = _Percentiles()
        self.request_wall = _Percentiles()
        # pipeline-stage accounting (host-vs-device breakdown for serve_bench;
        # VERDICT r2 item 1): name → (accumulated seconds, call count, items)
        self.stage_time: Dict[str, float] = {}
        self.stage_count: Dict[str, int] = {}
        self.stage_items: Dict[str, int] = {}

    def record_request(self, ttfa_s: float | None, wall_s: float, failed: bool, cancelled: bool) -> None:
        with self._lock:
            self.requests_total += 1
            if failed:
                self.requests_failed += 1
            if cancelled:
                self.requests_cancelled += 1
            if ttfa_s is not None:
                self.ttfa.add(ttfa_s)
            self.request_wall.add(wall_s)

    def record_tokens(self, n: int) -> None:
        with self._lock:
            self.tokens_generated += n
            self.audio_seconds += n / 25.0

    def record_stage(self, name: str, dt_s: float, items: int = 1) -> None:
        """Accumulate wall time spent in a pipeline stage. Device stages
        ("*_device") time the blocking dispatch+fetch (device compute +
        tunnel); host stages time numpy/stitch/PCM work."""
        with self._lock:
            self.stage_time[name] = self.stage_time.get(name, 0.0) + dt_s
            self.stage_count[name] = self.stage_count.get(name, 0) + 1
            self.stage_items[name] = self.stage_items.get(name, 0) + items

    def snapshot(self) -> Dict:
        with self._lock:
            return {
                "uptime_s": round(time.time() - self.started_at, 1),
                "requests": {
                    "total": self.requests_total,
                    "failed": self.requests_failed,
                    "cancelled": self.requests_cancelled,
                },
                "tokens_generated": self.tokens_generated,
                "audio_seconds": round(self.audio_seconds, 2),
                "ttfa_s": self.ttfa.snapshot(),
                "request_wall_s": self.request_wall.snapshot(),
                "stages": {
                    name: {
                        "time_s": round(self.stage_time[name], 3),
                        "count": self.stage_count.get(name, 0),
                        "items": self.stage_items.get(name, 0),
                    }
                    for name in sorted(self.stage_time)
                },
            }


metrics = Metrics()
