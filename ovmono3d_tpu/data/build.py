"""Dataloader construction: samplers, weighting, fixed-shape batch iterators.

Host-side re-design of cubercnn/data/build.py (SURVEY.md §2.1 #16):
infinite shuffled training streams with dataset-balancing and/or LVIS-style
repeat-factor weights, a background-threaded mapper pool (replacing the
dataloader worker processes), and a sequential test iterator — all emitting
the model's static-shape batch dict.
"""
from __future__ import annotations

import logging
import math
import queue
import threading
from collections import Counter
from typing import Iterator

import numpy as np

logger = logging.getLogger(__name__)

from ovmono3d_tpu.config import Config
from ovmono3d_tpu.data.mapper import batch_examples, map_example


def repeat_factors_from_category_frequency(
    records: list[dict], repeat_thresh: float
) -> np.ndarray:
    """LVIS repeat factors: r(img) = max over its categories of
    max(1, sqrt(t / f_c)) (build.py:166-211)."""
    counts: Counter = Counter()
    for rec in records:
        cats = {a["category_id"] for a in rec.get("annotations", [])
                if a["category_id"] >= 0}
        counts.update(cats)
    total = max(len(records), 1)
    freq = {c: n / total for c, n in counts.items()}
    rep = np.ones(len(records))
    for i, rec in enumerate(records):
        cats = {a["category_id"] for a in rec.get("annotations", [])
                if a["category_id"] >= 0}
        if cats:
            rep[i] = max(
                max(1.0, math.sqrt(repeat_thresh / freq[c])) for c in cats
            )
    return rep


def dataset_balance_weights(sources: list) -> np.ndarray:
    """Per-image dataset-balancing weights (BALANCE_DATASETS,
    build.py:105-128): each SOURCE gets weight 1 - count/total,
    normalized so the largest source's weight is 1; a single source is
    left unweighted. Softer than equal-probability-per-dataset — the
    reference's deliberate partial rebalance.

    `sources` must be the per-image dataset SOURCE (the reference pools
    dataset ids through dataset_id_to_src = info['source'],
    train_net.py:534-539 + build.py:108-109 — e.g. two splits of KITTI
    count as ONE group), not the raw per-json dataset_id."""
    counts = Counter(sources)
    if len(counts) <= 1:
        return np.ones(len(sources))
    total = sum(counts.values())
    w = {d: 1.0 - c / total for d, c in counts.items()}
    mn = min(w.values())
    return np.array([w[d] / mn for d in sources])


def subsample_records(records: list[dict], percentage: float) -> list[dict]:
    """Seeded uniform TRAIN_SET_PERCENTAGE subsample, NOT a prefix —
    records are concatenated per dataset, so a prefix would drop whole
    sources (sample_by_percentage, reference build.py:30-34, 92-93)."""
    if percentage >= 1.0:
        return records
    keep = int(len(records) * percentage)
    idx = np.random.RandomState(42).permutation(len(records))[:keep]
    return [records[i] for i in np.sort(idx)]


def build_train_iterator(
    cfg: Config,
    records: list[dict],
    batch_size: int,
    image_loader=None,
    max_gt: int = 64,
    seed: int = 0,
    num_threads: int = 4,
    prefetch: int = 4,
) -> Iterator[dict]:
    """Infinite weighted-shuffle stream of fixed-shape train batches."""
    records = subsample_records(records, cfg.input.train_set_percentage)

    if getattr(cfg.datasets, "filter_empty_annotations", True):
        # detectron2 FILTER_EMPTY_ANNOTATIONS (reference build.py:84,
        # default True): images with no non-ignored annotation leave the
        # stream BEFORE weighting, so they neither produce all-negative
        # batches nor skew balance/repeat-factor counts.
        kept = [
            r for r in records
            if any(a.get("category_id", -1) >= 0
                   for a in r.get("annotations", []))
        ]
        if len(kept) != len(records):
            logger.info(
                "filtered %d empty-annotation images (%d left)",
                len(records) - len(kept), len(kept),
            )
        records = kept

    weights = np.ones(len(records))
    if cfg.datasets.balance_datasets:
        weights *= dataset_balance_weights(
            [r.get("source", r.get("dataset_id", 0)) for r in records]
        )
    if cfg.datasets.repeat_threshold > 0:
        weights *= repeat_factors_from_category_frequency(
            records, cfg.datasets.repeat_threshold
        )
    weights = weights / weights.sum()

    out_q: queue.Queue = queue.Queue(maxsize=prefetch)

    def load_one(idx: int, map_rng):
        rec = records[idx]
        image = image_loader(rec) if image_loader is not None else None
        return map_example(
            rec, cfg, image=image, is_train=True, max_gt=max_gt, rng=map_rng
        )

    def producer(tid: int):
        # Per-thread RNG (np.random.RandomState is not thread-safe).
        local = np.random.RandomState(seed + 1 + tid * 7919)
        while True:
            idx = local.choice(len(records), size=batch_size, p=weights)
            examples = [
                load_one(i, np.random.RandomState(local.randint(2**31)))
                for i in idx
            ]
            out_q.put(_to_model_batch(batch_examples(examples)))

    threads = [
        threading.Thread(target=producer, args=(t,), daemon=True)
        for t in range(num_threads)
    ]
    for t in threads:
        t.start()
    while True:
        yield out_q.get()


def build_test_iterator(
    cfg: Config,
    records: list[dict],
    batch_size: int = 1,
    image_loader=None,
    max_oracle: int = 64,
    use_native: bool = True,
) -> Iterator[tuple[list[dict], dict]]:
    """Sequential test batches (InferenceSampler semantics: each record once,
    in order). Yields (records_chunk, batch); pads the last chunk by
    repeating its final record (callers drop results via the chunk length).

    When the native preprocessing library is built and images are loaded
    from disk, the pixel path (resize+pad+pack) runs through the C++/OpenMP
    batch kernel; annotation geometry stays in Python (same shortest-edge
    rule — equality is covered by tests/test_native_preproc.py).
    """
    from ovmono3d_tpu.data import native as native_mod

    # The native path only wins when OpenMP has cores to parallelize
    # across images; at 1-2 cores cv2's SIMD per-image resize is faster
    # (native.native_worthwhile docstring).
    native_ok = use_native and native_mod.native_worthwhile()
    S = cfg.model.backbone.square_pad
    for start in range(0, len(records), batch_size):
        chunk = records[start : start + batch_size]
        padded = chunk + [chunk[-1]] * (batch_size - len(chunk))
        images = [
            image_loader(r) if image_loader is not None else None
            for r in padded
        ]
        if native_ok and all(im is not None for im in images):
            # Fast path: native pixels + Python annotation geometry
            # (skip_pixels: the zero canvas below is overwritten by the
            # native output, so don't resize/pad a full-res zero image).
            examples = [
                map_example(r, cfg, image=None, is_train=False,
                            max_oracle=max_oracle, skip_pixels=True)
                for r in padded
            ]
            batch = batch_examples(examples)
            out, hw, ratios = native_mod.preprocess_batch_native(
                images, S, cfg.input.min_size_test, cfg.input.max_size_test
            )
            batch["image"], batch["im_hw"] = out, hw
            batch["im_scale_ratio"] = ratios
        else:
            examples = [
                map_example(r, cfg, image=im, is_train=False,
                            max_oracle=max_oracle)
                for r, im in zip(padded, images)
            ]
            batch = batch_examples(examples)
        yield chunk, _to_model_batch(batch)


def _to_model_batch(b: dict) -> dict:
    """numpy batch dict -> model kwarg names."""
    out = {
        "image": b["image"],
        "K": b["K"],
        "im_hw": b["im_hw"],
        "im_scale_ratio": b["im_scale_ratio"],
    }
    for k in ("gt_boxes", "gt_classes", "gt_boxes3d", "gt_poses", "gt_valid",
              "oracle_boxes", "oracle_classes", "oracle_scores",
              "oracle_valid", "depth"):
        if k in b:
            out[k] = b[k]
    return out


def default_image_loader(data_root: str):
    """Loads record['file_name'] relative to data_root as RGB."""
    from pathlib import Path

    from ovmono3d_tpu.utils.util import imread_rgb

    def load(rec: dict):
        path = Path(data_root) / rec["file_name"]
        if not path.exists():
            return None  # zero image (tests / dry runs)
        return imread_rgb(path)

    return load
