"""Structured JSON-lines run logs (SURVEY.md S7; reference ``src/log.ts``).

The reference writes one JSON object per request/scrape with ``level``,
``start``, ``action``, ``elapsed`` and free-form fields
(``src/log.ts:3-18,40-49``; scrape log ``src/api.ts:105-112``). The batch
analog is one record per (wave, event) appended to ``run.log.jsonl``
next to the output shards — greppable lineage/metrics without parsing
the manifest.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

__all__ = ["JsonlLogger"]

_LEVELS = ("debug", "info", "warn", "error")


class JsonlLogger:
    """Append-only JSONL log; ``start``/``elapsed`` in ms like the
    reference's records."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        self.path = path

    def write(self, action: str, level: str = "info", start: float | None = None,
              **fields: Any) -> dict:
        if level not in _LEVELS:
            raise ValueError(f"level must be one of {_LEVELS}")
        record: dict[str, Any] = {
            "level": level,
            "action": action,
            "start": int((start if start is not None else time.time()) * 1000),
        }
        if start is not None:
            record["elapsed"] = int((time.time() - start) * 1000)
        record.update(fields)
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=str) + "\n")
        return record
