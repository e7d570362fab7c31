"""Metrics / observability: EventStorage-equivalent writers + profiling.

Re-design of the reference's logging stack (detectron2 EventStorage +
default_writers: console, metrics.json, TensorBoard — SURVEY.md §5
"metrics/logging"): a JSONL metrics file, a rolling console line with
smoothed losses, optional TensorBoard scalars (via tf.summary when
TensorFlow is present), and a `jax.profiler` trace window (the reference
had no profiler integration; on TPU this is the tool that matters).
"""
from __future__ import annotations

import json
import logging
import time
from collections import defaultdict, deque
from pathlib import Path

logger = logging.getLogger(__name__)


class MetricsWriter:
    """Collects per-step scalars; flushes every `period` steps."""

    def __init__(self, output_dir: str | Path, period: int = 20,
                 use_tensorboard: bool = False, smoothing: int = 20):
        self.dir = Path(output_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.period = period
        self.jsonl = open(self.dir / "metrics.jsonl", "a")
        self.history: dict[str, deque] = defaultdict(
            lambda: deque(maxlen=smoothing)
        )
        self.tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf

                self.tb = tf.summary.create_file_writer(
                    str(self.dir / "tb")
                )
            except Exception as e:  # pragma: no cover
                logger.warning("tensorboard writer unavailable: %s", e)
        self._last_flush = time.time()

    def __call__(self, step: int, state, metrics: dict):
        scalars = {}
        for k, v in metrics.items():
            try:
                scalars[k] = float(v)
            except (TypeError, ValueError):
                continue
            self.history[k].append(scalars[k])
        if step % self.period != 0:
            return
        now = time.time()
        rate = self.period / max(now - self._last_flush, 1e-9)
        self._last_flush = now
        record = {"step": step, "it_per_s": round(rate, 3), **scalars}
        self.jsonl.write(json.dumps(record) + "\n")
        self.jsonl.flush()
        smoothed = {
            k: sum(v) / len(v) for k, v in self.history.items() if v
        }
        headline = ", ".join(
            f"{k}={v:.4f}" for k, v in sorted(smoothed.items())
            if k in ("total_loss", "skipped")
        )
        logger.info("iter %d (%.2f it/s) %s", step, rate, headline)
        if self.tb is not None:
            import tensorflow as tf

            with self.tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(k, v, step=step)
                self.tb.flush()

    def close(self):
        self.jsonl.close()


class ProfilerHook:
    """Captures a jax.profiler trace for steps [start, start+count)."""

    def __init__(self, output_dir: str | Path, start: int = 10,
                 count: int = 5):
        self.dir = str(Path(output_dir) / "profile")
        self.start = start
        self.stop = start + count
        self._active = False

    def __call__(self, step: int, state, metrics: dict):
        import jax

        if step == self.start and not self._active:
            jax.profiler.start_trace(self.dir)
            self._active = True
            logger.info("profiler trace started -> %s", self.dir)
        elif step >= self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False
            logger.info("profiler trace written -> %s", self.dir)
