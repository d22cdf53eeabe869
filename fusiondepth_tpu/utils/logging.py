"""Experiment logging: stdout progress lines + JSONL scalars (+ TensorBoard
when TensorFlow is available).

Replaces the reference's tensorboardX + wandb pair (trainer.py:176-178,
644-681) with dependency-light equivalents: scalars always land in
log/<model>/<mode>/metrics.jsonl; tf.summary mirrors them when importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


def normalize_image(x):
    """Rescale an array to span [0, 1] for visualization (reference
    utils.py:16-22)."""
    import numpy as np

    x = np.asarray(x)
    ma, mi = float(x.max()), float(x.min())
    d = ma - mi if ma != mi else 1e5
    return (x - mi) / d


def sec_to_hm_str(t: float) -> str:
    t = int(t)
    s, t = t % 60, t // 60
    m, h = t % 60, t // 60
    return f"{h:02d}h{m:02d}m{s:02d}s"


class MetricLogger:
    def __init__(self, log_dir: str, mode: str, use_tb: bool = True):
        self.dir = os.path.join(log_dir, mode)
        os.makedirs(self.dir, exist_ok=True)
        self.path = os.path.join(self.dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        if use_tb:
            try:
                import tensorflow as tf  # noqa: F401

                self._tb = tf.summary.create_file_writer(self.dir)
            except Exception:
                self._tb = None

    def log_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(k, float(v), step=int(step))

    def log_image(self, step: int, name: str, image) -> None:
        """Log an HWC [0,1] image (TensorBoard when available, else a png
        next to the metrics) — the reference's TB image logging
        (trainer.py:644-681)."""
        import numpy as np

        img = np.clip(np.asarray(image), 0.0, 1.0)
        if img.ndim == 2:
            img = img[..., None]
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                tf.summary.image(name, img[None], step=int(step))
        else:
            from PIL import Image

            arr = (img * 255).astype(np.uint8)
            if arr.shape[-1] == 1:
                arr = arr[..., 0]
            Image.fromarray(arr).save(os.path.join(
                self.dir, f"{name.replace('/', '_')}_{int(step)}.png"))

    def close(self) -> None:
        self._f.close()
