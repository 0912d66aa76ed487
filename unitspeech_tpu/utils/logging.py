"""Training observability: TensorBoard scalars + append-only train.log.

Parity with the reference's per-iteration SummaryWriter scalars and per-epoch
train.log lines (/root/reference/train_STEP1.py:77,250-261,275-277), plus a
step timer the reference lacks (SURVEY.md §5 tracing: "none").
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional


class MetricsWriter:
    def __init__(self, log_dir: str, enable_tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        if enable_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None
        self._log_path = os.path.join(log_dir, "train.log")
        self._t0 = time.perf_counter()

    def scalars(self, metrics: Dict[str, float], step: int, prefix: str = "training"):
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(f"{prefix}/{k}", float(v), step)

    def log_line(self, msg: str):
        with open(self._log_path, "a", encoding="utf-8") as f:
            f.write(msg + "\n")

    def epoch_summary(self, epoch: int, means: Dict[str, float]):
        parts = " | ".join(f"{k}: {v:.6f}" for k, v in means.items())
        self.log_line(f"Epoch {epoch}: {parts}")

    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    def close(self):
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """Lightweight steps/sec EMA (no reference equivalent)."""

    def __init__(self, alpha: float = 0.05):
        self._last: Optional[float] = None
        self._ema: Optional[float] = None
        self.alpha = alpha

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self._ema = dt if self._ema is None else (
                self.alpha * dt + (1 - self.alpha) * self._ema
            )
        self._last = now
        return self._ema


def get_logger(name: str = "unitspeech_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    return logger
