"""Run logging: timestamped stdout + optional TensorBoard (tensorboardX).

Mirrors the reference's observability (SURVEY.md §5): `safe_state` timestamping
(`/root/reference/utils/general_utils.py:112-128`), tensorboard scalars
(`train.py:166-202`), EMA loss progress. No stdout monkey-patching — a logger object.
"""

from __future__ import annotations

import sys
import time
from datetime import datetime


class RunLogger:
    def __init__(self, log_dir: str | None = None, quiet: bool = False,
                 ema_decay: float = 0.6):
        self.quiet = quiet
        self.ema_decay = ema_decay
        self.ema_loss: float | None = None
        self.writer = None
        if log_dir:
            try:
                from tensorboardX import SummaryWriter
                self.writer = SummaryWriter(log_dir)
            except Exception:
                self.log("tensorboardX unavailable: not logging progress")

    def log(self, msg: str) -> None:
        if not self.quiet:
            stamp = datetime.now().strftime("%d/%m %H:%M:%S")
            print(f"{msg} [{stamp}]", flush=True)

    def scalar(self, tag: str, value, step: int) -> None:
        if self.writer is not None:
            self.writer.add_scalar(tag, float(value), step)

    def progress(self, iteration: int, loss: float, every: int = 10,
                 extra: str = "") -> None:
        self.ema_loss = (loss if self.ema_loss is None
                         else (1 - self.ema_decay) * loss
                         + self.ema_decay * self.ema_loss)
        if iteration % every == 0:
            self.log(f"iter {iteration}: ema_loss={self.ema_loss:.7f}{extra}")

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()


class Timer:
    """Per-step wall timing via block_until_ready deltas (the TPU analog of the
    reference's paired cuda events, train.py:53-54)."""

    def __init__(self):
        self.t0 = None
        self.elapsed_ms = 0.0

    def start(self):
        self.t0 = time.perf_counter()

    def stop(self, *arrays):
        import jax
        if arrays:
            jax.block_until_ready(arrays)
        self.elapsed_ms = (time.perf_counter() - self.t0) * 1e3
        return self.elapsed_ms
