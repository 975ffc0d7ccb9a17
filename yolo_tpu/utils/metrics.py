"""Structured per-step metrics logging (SURVEY.md §5.5): JSONL + stdout,
no TensorBoard dependency (offline box). Logs each loss term separately
(coord/obj/noobj/class) — essential for debugging YOLO training."""

from __future__ import annotations

import json
import sys
import time
from typing import IO, Dict, Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, stdout: bool = True,
                 every: int = 1):
        self._file: Optional[IO] = open(path, "a") if path else None
        self._stdout = stdout
        self._every = max(every, 1)
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict, force: bool = False,
            **extra) -> None:
        """force=True bypasses the --log-every sampling (for sparse,
        expensive records like validation mAP)."""
        if step % self._every and not force:
            return
        # fetch all device scalars in ONE transfer — per-metric
        # float(v) cost one relay round trip each (code-review
        # finding; same class as the serve/eval fixes)
        try:
            import jax

            metrics = jax.device_get(metrics)
        except Exception:
            pass  # plain host values (or no jax): log as-is
        rec = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        for k, v in {**metrics, **extra}.items():
            try:
                rec[k] = round(float(v), 6)
            except (TypeError, ValueError):
                rec[k] = v
        line = json.dumps(rec)
        if self._file:
            self._file.write(line + "\n")
            self._file.flush()
        if self._stdout:
            print(line, file=sys.stderr)

    def close(self) -> None:
        if self._file:
            self._file.close()
            self._file = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
