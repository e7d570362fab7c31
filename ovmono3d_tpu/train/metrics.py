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
            # Pure-Python event-file writer (train/tb_writer.py) — the
            # reference's default_writers TB sink (train_net.py:153)
            # without a tensorflow dependency.
            from ovmono3d_tpu.train.tb_writer import TBEventWriter

            self.tb = TBEventWriter(self.dir / "tb")
        self._last_flush = time.time()
        self._buffer: list[tuple[int, dict]] = []

    def __call__(self, step: int, state, metrics: dict, **_):
        # Buffer the device scalars WITHOUT materializing them — float()
        # per step would block on the step's result and defeat JAX async
        # dispatch (multi-ms exposed dispatch latency on the tunneled TPU).
        self._buffer.append((step, metrics))
        if step % self.period != 0:
            return
        self._flush(step)

    def _flush(self, step: int):
        scalars = {}
        for s, m in self._buffer:
            vals = {}
            for k, v in m.items():
                try:
                    vals[k] = float(v)  # ready by now: K steps behind
                except (TypeError, ValueError):
                    continue
                self.history[k].append(vals[k])
            scalars = vals  # keep the latest step's values for the record
        self._buffer.clear()
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
            self.tb.add_scalars(step, scalars)
            self.tb.flush()

    def close(self):
        # Flush trailing sub-period steps (e.g. max_iter not a multiple of
        # `period`) so the final loss values reach disk/TensorBoard.
        if self._buffer:
            self._flush(self._buffer[-1][0])
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()


class ProfilerHook:
    """Captures a jax.profiler trace for steps [start, start+count)."""

    def __init__(self, output_dir: str | Path, start: int = 10,
                 count: int = 5):
        self.dir = str(Path(output_dir) / "profile")
        self.start = start
        self.stop = start + count
        self._active = False
        self._done = False

    def __call__(self, step: int, state, metrics: dict, **_):
        import jax

        if step == self.start and not self._active and not self._done:
            # _done guards a stabilization restart rewinding past `start`
            # from opening a second, overlapping trace window.
            jax.profiler.start_trace(self.dir)
            self._active = True
            logger.info("profiler trace started -> %s", self.dir)
        elif step >= self.stop and self._active:
            self._finish()

    def _finish(self):
        import jax

        jax.profiler.stop_trace()
        self._active = False
        self._done = True
        logger.info("profiler trace written -> %s", self.dir)

    def close(self):
        # Training may end (or crash) inside the trace window; an unclosed
        # trace leaves the profile directory incomplete.
        if self._active:
            self._finish()


class TrainVisHook:
    """Periodic training-sample visualization (the reference's
    visualize_training TensorBoard panels, rcnn3d.py:119-250): every
    `period` steps, render the first image of the batch with its GT 2D
    boxes and projected GT 3D cuboids to a PNG under output_dir/vis."""

    def __init__(self, output_dir: str | Path, period: int = 2320,
                 tb=None):
        self.dir = Path(output_dir) / "vis"
        self.period = max(period, 1)
        # Optional TBEventWriter: panels also go to TensorBoard as image
        # summaries (the reference's visualize_training put_image sink,
        # rcnn3d.py:119-250), in addition to the PNG on disk.
        self.tb = tb

    def __call__(self, step: int, state, metrics: dict, batch=None):
        if batch is None or step % self.period != 0:
            return
        import jax
        import numpy as np

        from ovmono3d_tpu.utils.util import imwrite_rgb
        from ovmono3d_tpu.vis.draw import draw_boxes_2d, draw_cuboid_3d

        b = jax.device_get({
            k: batch[k] for k in
            ("image", "K", "im_scale_ratio", "gt_boxes", "gt_classes",
             "gt_boxes3d", "gt_poses", "gt_valid")
            if k in batch
        })
        if "gt_boxes" not in b:
            return
        img = np.clip(np.asarray(b["image"][0]), 0, 255).astype(np.uint8)
        valid = np.asarray(b["gt_valid"][0]).astype(bool)
        fg = valid & (np.asarray(b["gt_classes"][0]) >= 0)
        panel = draw_boxes_2d(
            img, np.asarray(b["gt_boxes"][0])[fg],
            labels=[str(c) for c in np.asarray(b["gt_classes"][0])[fg]],
        )
        # Project GT cuboids with the network-resolution K.
        K_net = np.asarray(b["K"][0]) / float(b["im_scale_ratio"][0])
        K_net[2, 2] = 1.0
        from ovmono3d_tpu.utils.geometry import backproject, cuboid_corners
        import jax.numpy as jnp

        g3d = np.asarray(b["gt_boxes3d"][0])
        poses = np.asarray(b["gt_poses"][0])
        # 2D-only annotations (no center_cam) keep the mapper's default 3D
        # row [0,0,1,1,1,1,0,0,0] — drawing it would put a bogus unit cube
        # at the image origin. A real box can never hit the exact default
        # (its projected center is a float from K @ center).
        default_row = np.array([0, 0, 1, 1, 1, 1, 0, 0, 0], np.float32)
        has3d = ~np.all(g3d == default_row, axis=-1)
        for i in np.where(fg & has3d)[0]:
            u, v, z = g3d[i, :3]
            center = np.asarray(
                backproject(jnp.asarray(K_net),
                            jnp.asarray([u, v]), jnp.asarray(z))
            )
            corners = np.asarray(
                cuboid_corners(
                    jnp.asarray(
                        np.concatenate([center, g3d[i, 3:6]]), jnp.float32
                    ),
                    jnp.asarray(poses[i]),
                )
            )
            panel = draw_cuboid_3d(panel, corners, K_net)
        out = self.dir / f"train_{step:07d}.png"
        imwrite_rgb(out, panel)
        if self.tb is not None:
            self.tb.add_image(step, "train/vis", panel)
            self.tb.flush()
        logger.info("train vis -> %s", out)
