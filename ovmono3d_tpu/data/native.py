"""ctypes bridge to the native (C++/OpenMP) preprocessing library.

Replaces the reference's dataloader worker processes for the preprocessing
hot loop (SURVEY.md §2.1 #16-#17): one `preprocess_batch` call resizes,
pads and packs a whole batch in parallel native threads. Falls back
gracefully to the Python/cv2 mapper when the library isn't built.

Build (done lazily on first use): `make -C native`.
"""
from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _load() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _NATIVE_DIR / "libpreproc.so"
    if not so.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception as e:  # pragma: no cover - toolchain missing
            logger.warning("native preproc build failed: %s", e)
            return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.preprocess_batch.restype = ctypes.c_int
        lib.preprocess_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
    except OSError as e:  # pragma: no cover
        logger.warning("native preproc load failed: %s", e)
    return _LIB


def native_available() -> bool:
    return _load() is not None


def native_worthwhile() -> bool:
    """Whether the native batch path is expected to beat per-image cv2.

    The C++ kernel's win is OpenMP parallelism ACROSS images (no GIL);
    its scalar bilinear inner loop loses to cv2's SIMD resize per image
    (measured 2.2x slower at 1 core). Use it only with cores to spare.
    """
    import os

    return native_available() and (os.cpu_count() or 1) >= 4


def preprocess_batch_native(
    images: list[np.ndarray],
    out_size: int,
    short_side: int,
    max_size: int,
):
    """Batch preprocess uint8 RGB images via the native library.

    Returns (images [B, S, S, 3] f32, im_hw [B, 2] i32, ratios [B] f32) or
    None when the library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    b = len(images)
    images = [np.ascontiguousarray(im, dtype=np.uint8) for im in images]
    for im in images:
        # The C kernel walks the buffer with channels=3 (preproc.cc): a
        # grayscale/RGBA image would read out of bounds (segfault) or
        # misinterleave pixels silently.
        if im.ndim != 3 or im.shape[2] != 3:
            raise ValueError(
                f"native preprocess needs HWC RGB uint8, got {im.shape}"
            )
    ptrs = (ctypes.c_void_p * b)(
        *[im.ctypes.data_as(ctypes.c_void_p) for im in images]
    )
    heights = (ctypes.c_int * b)(*[im.shape[0] for im in images])
    widths = (ctypes.c_int * b)(*[im.shape[1] for im in images])
    out = np.zeros((b, out_size, out_size, 3), np.float32)
    out_hw = np.zeros((b, 2), np.int32)
    ratios = np.zeros((b,), np.float32)
    rc = lib.preprocess_batch(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
        heights,
        widths,
        b,
        out_size,
        short_side,
        max_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ratios.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:  # pragma: no cover
        return None
    return out, out_hw, ratios
