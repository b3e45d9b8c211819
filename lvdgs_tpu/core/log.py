"""Tagged console logging (reference utils/logging_utils.py parity).

Uses rich when available; falls back to plain prints. Default tag matches
our framework name instead of the reference's "S3PO-GS".
"""
from __future__ import annotations

import os
import sys
import time

_VERBOSE = os.environ.get("LVDGS_LOG", "1") != "0"

try:  # rich is optional
    from rich.console import Console

    _console = Console()

    def Log(*args, tag: str = "LVD-GS-TPU") -> None:
        if not _VERBOSE:
            return
        style_map = {
            "LVD-GS-TPU": "bold green",
            "GUI": "bold magenta",
            "Eval": "bold red",
            "Bench": "bold cyan",
        }
        style = style_map.get(tag, "bold blue")
        _console.print(f"[{style}]\\[{tag}][/{style}]", *args)

except Exception:  # pragma: no cover

    def Log(*args, tag: str = "LVD-GS-TPU") -> None:
        if _VERBOSE:
            print(f"[{tag}]", *args, file=sys.stderr)


class PhaseTimer:
    """Lightweight per-phase wall timers (replaces the reference's
    torch.cuda.Event pacing timers, utils/slam_frontend.py:1751-1752)."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}
        self._start: dict[str, float] = {}

    def tic(self, name: str) -> None:
        self._start[name] = time.perf_counter()

    def toc(self, name: str) -> float:
        dt = time.perf_counter() - self._start.pop(name)
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return dt

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            k: {"total_s": v, "count": self.counts[k], "mean_ms": 1e3 * v / max(1, self.counts[k])}
            for k, v in self.totals.items()
        }
