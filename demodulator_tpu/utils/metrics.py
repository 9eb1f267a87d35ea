"""Throughput metrics + structured logging.

The reference's only observability is compile-gated stderr design dumps
(IS_VERBOSE, src/filter.c:160-204) and external `time` runs (test.sh:57-59);
SURVEY.md §5 calls for per-block samples/s counters and structured logs in
the new framework.  ``StreamMetrics`` tracks block counts / bytes / wall
time and periodically emits one JSON object per line on stderr, matching
bench.py's machine-readable style.
"""
from __future__ import annotations

import json
import sys
import time

__all__ = ["StreamMetrics"]


class StreamMetrics:
    def __init__(self, bytes_per_block: int, complex_per_block: int,
                 report_every_s: float = 5.0, emit=None):
        self.bytes_per_block = bytes_per_block
        self.complex_per_block = complex_per_block
        self.report_every_s = report_every_s
        self.emit = emit if emit is not None else (
            lambda line: print(line, file=sys.stderr, flush=True))
        self.t0 = time.perf_counter()
        self.last_report = self.t0
        self.blocks = 0

    def block_done(self, n: int = 1) -> None:
        self.blocks += n
        now = time.perf_counter()
        if self.report_every_s > 0 and \
                now - self.last_report >= self.report_every_s:
            self.last_report = now
            self.emit(json.dumps(self.snapshot()))

    def snapshot(self) -> dict:
        dt = max(time.perf_counter() - self.t0, 1e-9)
        return {
            "event": "stream_progress",
            "blocks": self.blocks,
            "bytes": self.blocks * self.bytes_per_block,
            "wall_s": round(dt, 3),
            "msps_complex": round(
                self.blocks * self.complex_per_block / dt / 1e6, 3),
        }

    def final(self) -> dict:
        snap = self.snapshot()
        snap["event"] = "stream_done"
        return snap
