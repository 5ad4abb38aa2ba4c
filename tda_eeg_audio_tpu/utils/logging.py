"""Structured logging (SURVEY §5 metrics/logging subsystem).

The reference narrates with bare prints (e.g. reference
scripts/tda_eeg_audio_comparison.py:127-137); here pipeline events are
emitted as JSON lines — machine-parseable, with wall-clock timestamps and
stable field names — to stderr and optionally to a file set via the
TDA_TPU_LOG env var or `configure(path)`.  Human-readable prints remain for
interactive runs; this channel is for dashboards/CI.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

__all__ = ["StructuredLogger", "LOGGER", "configure"]


class StructuredLogger:
    """JSON-lines event logger with bound context fields."""

    def __init__(self, stream=None, path: str | None = None, **context):
        self._stream = stream
        self._path = path
        self._ctx = context

    def bind(self, **context) -> "StructuredLogger":
        """Child logger with extra context attached to every event."""
        return StructuredLogger(self._stream, self._path,
                                **{**self._ctx, **context})

    def event(self, event: str, **fields) -> None:
        rec = {"ts": round(time.time(), 3), "event": event,
               **self._ctx, **fields}
        line = json.dumps(rec, default=str)
        if self._stream is not None:
            print(line, file=self._stream, flush=True)
        if self._path:
            with open(self._path, "a") as f:
                f.write(line + "\n")

    def stage(self, name: str, seconds: float, items: int = 0, **fields):
        if items:
            fields["items"] = items
            fields["items_per_sec"] = round(items / max(seconds, 1e-9), 1)
        self.event("stage", stage=name, seconds=round(seconds, 3), **fields)


def _default() -> StructuredLogger:
    path = os.environ.get("TDA_TPU_LOG")
    if path:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
    stream = sys.stderr if os.environ.get("TDA_TPU_LOG_STDERR") == "1" else None
    return StructuredLogger(stream, path)


LOGGER = _default()


def configure(path: str | None = None, stderr: bool = False) -> None:
    """Point the global logger at a file and/or stderr."""
    global LOGGER
    if path:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
    LOGGER = StructuredLogger(sys.stderr if stderr else None, path)
