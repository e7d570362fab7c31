"""Category statistics priors from training annotations.

Re-design of the reference's compute_priors (math_util.py:292-496): per
category, mean/std of dimensions and of depth, plus optional 1-D K-means
cluster bins of depth conditioned on 2D box scale (used when
cube.cluster_bins > 1 / dims_priors_enabled).
"""
from __future__ import annotations

import numpy as np


def compute_priors(
    records: list[dict],
    num_classes: int,
    cluster_bins: int = 1,
    min_points_for_std: int = 5,
    max_rounds: int = 200,
):
    """Returns dict with
      dims: [C, 2, 3]   (mean, std) of (w, h, l)
      z:    [C, 2]      (mean, std) of depth
      z_scales: [C, B]  cluster centers of 2D scale (if cluster_bins > 1)
      z_stats:  [C, B, 2] per-cluster depth (mean, std)
    Unseen categories fall back to the global statistics.
    """
    dims_per_cat = [[] for _ in range(num_classes)]
    z_per_cat = [[] for _ in range(num_classes)]
    scale_per_cat = [[] for _ in range(num_classes)]

    for rec in records:
        for anno in rec.get("annotations", []):
            cid = anno.get("category_id", -1)
            if cid is None or cid < 0 or cid >= num_classes:
                continue
            if anno.get("dimensions") is None or anno.get("center_cam") is None:
                continue
            dims_per_cat[cid].append(anno["dimensions"])
            z_per_cat[cid].append(anno["center_cam"][2])
            x1, y1, x2, y2 = anno["bbox2d"]
            scale_per_cat[cid].append(
                float(np.hypot(x2 - x1, y2 - y1))
            )

    all_dims = np.concatenate(
        [np.asarray(d) for d in dims_per_cat if d] or [np.ones((1, 3))]
    )
    all_z = np.concatenate(
        [np.asarray(z) for z in z_per_cat if z] or [np.ones(1)]
    )
    g_dims = (all_dims.mean(0), all_dims.std(0) + 1e-4)
    g_z = (float(all_z.mean()), float(all_z.std()) + 1e-4)

    dims = np.zeros((num_classes, 2, 3), np.float32)
    z = np.zeros((num_classes, 2), np.float32)
    z_scales = np.zeros((num_classes, max(cluster_bins, 1)), np.float32)
    z_stats = np.zeros((num_classes, max(cluster_bins, 1), 2), np.float32)

    for c in range(num_classes):
        d = np.asarray(dims_per_cat[c]) if dims_per_cat[c] else None
        if d is None or len(d) < min_points_for_std:
            dims[c, 0], dims[c, 1] = g_dims
            z[c] = g_z
            z_scales[c] = 1.0
            z_stats[c, :, 0], z_stats[c, :, 1] = g_z
            continue
        dims[c, 0] = d.mean(0)
        dims[c, 1] = d.std(0) + 1e-4
        zs = np.asarray(z_per_cat[c])
        z[c] = (zs.mean(), zs.std() + 1e-4)
        if cluster_bins > 1:
            sc = np.asarray(scale_per_cat[c])
            centers, assign = _kmeans_1d(sc, cluster_bins, max_rounds)
            z_scales[c] = centers
            for b in range(cluster_bins):
                zb = zs[assign == b]
                if len(zb) >= min_points_for_std:
                    z_stats[c, b] = (zb.mean(), zb.std() + 1e-4)
                else:
                    z_stats[c, b] = z[c]
        else:
            z_scales[c] = sc_mean = float(np.mean(scale_per_cat[c]))
            z_stats[c, 0] = z[c]
    return {
        "dims": dims,
        "z": z,
        "z_scales": z_scales,
        "z_stats": z_stats,
    }


def _kmeans_1d(values: np.ndarray, k: int, max_rounds: int):
    """Simple 1-D k-means (the reference's custom clustering,
    math_util.py:292-496)."""
    lo, hi = values.min(), values.max()
    centers = np.linspace(lo, hi, k)
    assign = np.zeros(len(values), np.int64)
    for _ in range(max_rounds):
        new_assign = np.argmin(
            np.abs(values[:, None] - centers[None, :]), axis=1
        )
        if np.array_equal(new_assign, assign):
            break
        assign = new_assign
        for b in range(k):
            sel = values[assign == b]
            if len(sel):
                centers[b] = sel.mean()
    return centers.astype(np.float32), assign
