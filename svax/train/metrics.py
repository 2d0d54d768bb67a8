"""Structured JSONL metrics logging (SURVEY.md §6 metrics row).

The reference logged scalars through ``tf.summary``/TensorBoard; here the
canonical sink is line-delimited JSON (one dict per step/eval), which the
benchmark harness and plotting utilities consume directly.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import IO, Any


class JsonlLogger:
    """Append-only JSONL metrics writer with wall-clock stamping."""

    def __init__(self, path: str | Path | None = None, echo: bool = True):
        self._fh: IO[str] | None = None
        if path:
            p = Path(path)
            p.parent.mkdir(parents=True, exist_ok=True)
            self._fh = open(p, "a")
        self._echo = echo
        self._t0 = time.perf_counter()

    def log(self, step: int, **values: Any) -> dict:
        row = {"step": int(step), "wall_s": round(time.perf_counter() - self._t0, 3)}
        for k, v in values.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = v
        line = json.dumps(row)
        if self._echo:
            print(line)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        return row

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_jsonl(path: str | Path) -> list[dict]:
    return [json.loads(line) for line in Path(path).read_text().splitlines() if line.strip()]
