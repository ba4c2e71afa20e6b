"""Structured logging + metrics history.

The reference logs via print/tqdm only (SURVEY.md section 5); the Unity side
has an in-game console (collector/Assets/src/DebugConsole.cs). Here: one
stdlib-logging setup with a severity-colored console handler and an optional
JSONL metrics sink that training writes per epoch (easy to plot / diff runs).
"""

from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path
from typing import Dict, Optional

_COLORS = {
    logging.DEBUG: "\x1b[36m",
    logging.INFO: "\x1b[0m",
    logging.WARNING: "\x1b[33m",
    logging.ERROR: "\x1b[31m",
}
_RESET = "\x1b[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        color = _COLORS.get(record.levelno, "") if sys.stderr.isatty() else ""
        reset = _RESET if color else ""
        base = super().format(record)
        return f"{color}{base}{reset}"


def get_logger(name: str = "room_slam_tpu",
               level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(_ColorFormatter(
            "%(asctime)s %(levelname).1s %(name)s: %(message)s",
            datefmt="%H:%M:%S"))
        logger.addHandler(h)
        logger.setLevel(level)
        logger.propagate = False
    return logger


class MetricsLogger:
    """Append-only JSONL metrics sink (one line per epoch/step)."""

    def __init__(self, path: Optional[str | Path] = None):
        self.path = Path(path) if path else None
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)
        self._t0 = time.time()

    def log(self, **metrics: float) -> None:
        if not self.path:
            return
        rec: Dict = {"wall_s": round(time.time() - self._t0, 3)}
        rec.update({
            k: (float(v) if hasattr(v, "__float__") else v)
            for k, v in metrics.items()
        })
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
