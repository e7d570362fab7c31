"""Generic utilities: IO, ETA, colors (reference cubercnn/util/util.py)."""
from __future__ import annotations

import json
import pickle
import time
from pathlib import Path

import numpy as np

# COCO-style color table (subset; cycled with jitter like util.py:131-300).
_COLORS = [
    (31, 119, 180), (255, 127, 14), (44, 160, 44), (214, 39, 40),
    (148, 103, 189), (140, 86, 75), (227, 119, 194), (127, 127, 127),
    (188, 189, 34), (23, 190, 207), (174, 199, 232), (255, 187, 120),
    (152, 223, 138), (255, 152, 150), (197, 176, 213), (196, 156, 148),
]


def get_color(index: int, jitter: bool = False):
    c = _COLORS[index % len(_COLORS)]
    if jitter:
        rng = np.random.RandomState(index)
        c = tuple(
            int(np.clip(v + rng.randint(-20, 20), 0, 255)) for v in c
        )
    return tuple(int(v) for v in c)


def load_json(path):
    with open(path) as f:
        return json.load(f)


def save_json(path, obj):
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f)


def load_pickle(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def save_pickle(path, obj):
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def imread_rgb(path) -> np.ndarray:
    import cv2

    img = cv2.imread(str(path), cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def imwrite_rgb(path, image: np.ndarray):
    import cv2

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(path), cv2.cvtColor(image.astype(np.uint8),
                                        cv2.COLOR_RGB2BGR))


def list_images(folder) -> list[Path]:
    exts = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}
    return sorted(
        p for p in Path(folder).iterdir() if p.suffix.lower() in exts
    )


class ETA:
    """Wall-clock ETA tracker (util.py compute_eta)."""

    def __init__(self, total: int):
        self.total = total
        self.start = time.time()
        self.done = 0

    def step(self, n: int = 1) -> str:
        self.done += n
        dt = time.time() - self.start
        rate = self.done / max(dt, 1e-6)
        remain = (self.total - self.done) / max(rate, 1e-9)
        return f"{self.done}/{self.total} ({rate:.2f}/s, eta {remain:.0f}s)"
