"""Logging & metric buffering.

TPU-side equivalents of the reference's observability pieces: ``LogBuffer``
windowed averaging (``diffusion/utils/logger.py:160``), file+stdout root
logger (:32), throughput/ETA (flame ``LogCallback``), and an optional wandb
sink (all four reference harnesses log to wandb; here it is gated on the
package being importable and ``enable=True``).
"""

from __future__ import annotations

import logging
import sys
import time
from collections import defaultdict, deque
from pathlib import Path
from typing import Any, Dict, Optional


def get_root_logger(
    log_file: Optional[str] = None, level: int = logging.INFO, name: str = "mhla_tpu"
) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(level)
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        Path(log_file).parent.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


class LogBuffer:
    """Windowed running averages of scalar metrics."""

    def __init__(self, window: int = 50):
        self.window = window
        self._vals: Dict[str, deque] = defaultdict(lambda: deque(maxlen=window))

    def update(self, **metrics: float) -> None:
        for k, v in metrics.items():
            self._vals[k].append(float(v))

    def average(self) -> Dict[str, float]:
        return {k: sum(v) / len(v) for k, v in self._vals.items() if v}

    def clear(self) -> None:
        self._vals.clear()


class Throughput:
    """Tokens/samples-per-second + ETA tracker (flame LogCallback analogue)."""

    def __init__(self, total_steps: int):
        self.total_steps = total_steps
        self.start = time.perf_counter()
        self.last = self.start
        self.last_step = 0

    def step(self, step: int, items: int) -> Dict[str, float]:
        now = time.perf_counter()
        dt = max(now - self.last, 1e-9)
        d_steps = max(step - self.last_step, 1)
        out = {
            "steps_per_sec": d_steps / dt,
            "items_per_sec": items * d_steps / dt,
            "eta_hours": (self.total_steps - step) / (d_steps / dt) / 3600,
        }
        self.last, self.last_step = now, step
        return out


class WandbSink:
    """Optional wandb logging; silently no-ops when unavailable."""

    def __init__(self, enable: bool, project: str, name: str, config: Any = None):
        self.run = None
        if not enable:
            return
        try:
            import wandb

            self.run = wandb.init(project=project, name=name, config=config)
        except Exception:
            self.run = None

    def log(self, metrics: Dict[str, float], step: int) -> None:
        if self.run is not None:
            self.run.log(metrics, step=step)

    def finish(self) -> None:
        if self.run is not None:
            self.run.finish()
