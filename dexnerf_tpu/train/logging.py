"""Experiment observability: TensorBoard + JSONL metrics, depth PNG dumps.

Mirrors the reference's TensorBoard usage (``train_nerf_rgb.py:159,288-301``:
scalars every iter, images at validation) and its uint32-millimeter depth
PNG dumps (``train_nerf_rgb.py:395-399``), while adding a plain JSONL stream
(machine-readable, no TB dependency) and ``jax.profiler`` trace hooks — the
reference has no profiling at all (SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricsLogger:
    """Writes scalars/images to TensorBoard (if available) and JSONL."""

    def __init__(self, logdir: str, use_tensorboard: bool = True,
                 enabled: bool = True):
        """``enabled=False`` turns every method into a no-op — used by
        non-primary processes in multi-host runs (all hosts train, one
        writes)."""
        self.logdir = logdir
        self.enabled = enabled
        self._jsonl = None
        self._tb = None
        if not enabled:
            return
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if not self.enabled:
            return
        self._jsonl.write(
            json.dumps(
                {"tag": tag, "value": float(value), "step": int(step),
                 "t": time.time()}
            )
            + "\n"
        )
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def scalars(self, values: Dict[str, float], step: int) -> None:
        for k, v in values.items():
            self.scalar(k, v, step)

    def image(self, tag: str, img: np.ndarray, step: int) -> None:
        """img: [H, W, 3] float in [0,1] or [H, W] grayscale.

        The pixel data goes to TensorBoard; the JSONL stream records the tag
        and shape so image emission is observable (and testable) without TB.
        """
        if not self.enabled:
            return
        arr = np.asarray(img)
        self._jsonl.write(
            json.dumps(
                {"tag": tag, "image_shape": list(arr.shape),
                 "step": int(step), "t": time.time()}
            )
            + "\n"
        )
        if self._tb is not None:
            chw = arr[None] if arr.ndim == 2 else arr.transpose(2, 0, 1)
            self._tb.add_image(tag, chw, step)

    def flush(self) -> None:
        if self._jsonl is not None:
            self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def save_depth_png_mm(path: str, depth_m: np.ndarray) -> None:
    """Save a depth map (meters) as a uint32 millimeter PNG (mode 'I'),
    matching the reference's validation artifact format
    (``train_nerf_rgb.py:395-399``)."""
    from PIL import Image

    mm = (np.asarray(depth_m) * 1000.0).astype(np.uint32)
    Image.fromarray(mm.astype(np.int32), mode="I").save(path)


def load_depth_png_mm(path: str) -> np.ndarray:
    """Inverse of :func:`save_depth_png_mm` (returns meters, float32)."""
    from PIL import Image

    return np.asarray(Image.open(path), dtype=np.float32) / 1000.0


@contextlib.contextmanager
def profiler_trace(logdir: Optional[str]):
    """``jax.profiler`` trace scope (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
