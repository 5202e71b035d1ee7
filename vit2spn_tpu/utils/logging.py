"""Structured metric logging.

The reference's observability is print() + matplotlib artifacts
(SURVEY.md section 5). Here every metric goes through one JSONL logger
(append-only, one JSON object per event) that the plotting utilities and
benchmarks read back; stdout mirroring keeps the reference's console UX.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional


class MetricLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a", buffering=1)

    def log(self, event: str, **fields) -> dict:
        record = {"event": event, "time": time.time(), **fields}
        if self._fh:
            self._fh.write(json.dumps(record, default=float) + "\n")
        if self.echo:
            shown = ", ".join(
                f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in fields.items()
            )
            print(f"[{event}] {shown}", file=sys.stderr)
        return record

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
