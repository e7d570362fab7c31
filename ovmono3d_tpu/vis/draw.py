"""Drawing utilities: 2D boxes and projected 3D cuboids on images (CPU).

Re-design of the reference's vis helpers (cubercnn/vis/vis.py:76-843 —
SURVEY.md §2.1 #25): cv2-based box/cuboid wireframe drawing with z-clipping
and a simple novel-view (bird's-eye) panel. Vis is not on the training hot
path, so this stays host-side numpy/cv2.
"""
from __future__ import annotations

import numpy as np

from ovmono3d_tpu.utils.util import get_color

# Wireframe edges of the reference's corner ordering (math_util diagram).
CUBOID_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),   # front face (z-)
    (4, 5), (5, 6), (6, 7), (7, 4),   # back face (z+)
    (0, 4), (1, 5), (2, 6), (3, 7),   # connections
]


def draw_boxes_2d(image: np.ndarray, boxes: np.ndarray,
                  labels: list[str] | None = None,
                  scores: np.ndarray | None = None,
                  color=None) -> np.ndarray:
    import cv2

    out = np.ascontiguousarray(image.copy())
    for i, box in enumerate(np.asarray(boxes)):
        c = color or get_color(i)
        x1, y1, x2, y2 = [int(round(v)) for v in box]
        cv2.rectangle(out, (x1, y1), (x2, y2), c, 2)
        text = ""
        if labels is not None:
            text = labels[i]
        if scores is not None:
            text += f" {scores[i]:.2f}"
        if text:
            cv2.putText(out, text, (x1, max(y1 - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, c, 1, cv2.LINE_AA)
    return out


def draw_cuboid_3d(image: np.ndarray, corners3d: np.ndarray, K: np.ndarray,
                   color=None, min_z: float = 0.05,
                   thickness: int = 2) -> np.ndarray:
    """Project 8 camera-space corners and draw the wireframe, clipping edges
    whose endpoints fall behind the camera (vis.py draw_3d_box_from_verts
    z-plane clipping)."""
    import cv2

    out = np.ascontiguousarray(image.copy())
    corners3d = np.asarray(corners3d, np.float64)
    z = corners3d[:, 2]
    proj = (np.asarray(K, np.float64) @ corners3d.T).T
    uv = proj[:, :2] / np.maximum(proj[:, 2:3], 1e-9)
    c = color or (40, 220, 100)
    for a, b in CUBOID_EDGES:
        if z[a] <= min_z and z[b] <= min_z:
            continue
        pa, pb = corners3d[a], corners3d[b]
        # clip the behind endpoint to the z=min_z plane
        if z[a] <= min_z or z[b] <= min_z:
            if z[a] <= min_z:
                pa, pb = pb, pa  # pa in front now
            t = (min_z - pa[2]) / (pb[2] - pa[2] + 1e-12)
            pb = pa + t * (pb - pa)
            qa = (np.asarray(K) @ pa)[:2] / max(pa[2], 1e-9)
            qb = (np.asarray(K) @ pb)[:2] / max(pb[2], 1e-9)
        else:
            qa, qb = uv[a], uv[b]
        cv2.line(out, tuple(int(round(v)) for v in qa),
                 tuple(int(round(v)) for v in qb), c, thickness, cv2.LINE_AA)
    return out


def draw_bev(corners3d_list, extent: float = 10.0, size: int = 400,
             colors=None) -> np.ndarray:
    """Bird's-eye-view panel: xz footprints of cuboids (vis.py:26 BEV)."""
    import cv2

    canvas = np.full((size, size, 3), 255, np.uint8)

    def to_px(x, zz):
        px = int(round((x / extent + 0.5) * size))
        py = int(round(size - zz / extent * size))
        return px, py

    for i, corners in enumerate(corners3d_list):
        corners = np.asarray(corners)
        c = (colors[i] if colors else get_color(i))
        foot = corners[[0, 1, 5, 4]]  # top face footprint in xz
        pts = [to_px(p[0], p[2]) for p in foot]
        for j in range(4):
            cv2.line(canvas, pts[j], pts[(j + 1) % 4], c, 2, cv2.LINE_AA)
    return canvas


def pred_vs_gt_panels(
    image,
    K,
    gt: dict,
    pred: dict,
    class_names: list[str] | None = None,
    prompted_ids: set[int] | None = None,
    score_thres: float | None = None,
) -> np.ndarray:
    """3x2 evaluation panel grid (reference visualize_from_instances,
    vis.py:76-296): columns = GT all classes | GT evaluated classes |
    predictions; rows = 2D boxes | 3D wireframes.

    gt/pred: evaluation dicts (classes [N], boxes2d [N, 4] xyxy,
    corners3d [N, 8, 3]; pred also scores [N]).
    """
    import cv2

    g_cls = np.asarray(gt.get("classes", np.zeros(0, np.int64)))
    p_cls = np.asarray(pred.get("classes", np.zeros(0, np.int64)))
    p_scores = np.asarray(pred.get("scores", np.ones(len(p_cls))))
    if score_thres is None:
        # score > sqrt(1/n_cats) * 1.2 (vis.py:103-104)
        n_cats = max(len(class_names) if class_names else 1, 1)
        score_thres = float(np.sqrt(1.0 / n_cats) * 1.2)

    def name(c):
        return class_names[int(c)] if class_names else str(int(c))

    def column(classes, boxes2d, corners3d, keep, scores=None):
        im2d = np.ascontiguousarray(np.asarray(image).copy())
        im3d = np.ascontiguousarray(np.asarray(image).copy())
        for i in np.flatnonzero(keep):
            c = get_color(int(classes[i]))
            im2d = draw_boxes_2d(
                im2d, boxes2d[i : i + 1], [name(classes[i])],
                None if scores is None else scores[i : i + 1], color=c,
            )
            if corners3d is not None and (
                scores is None or scores[i] > score_thres
            ):
                im3d = draw_cuboid_3d(im3d, corners3d[i], K, color=c)
        return im2d, im3d

    g_boxes = np.asarray(gt.get("boxes2d", np.zeros((0, 4))))
    g_corners = np.asarray(gt.get("corners3d")) if "corners3d" in gt else None
    p_boxes = np.asarray(pred.get("boxes2d", np.zeros((0, 4))))
    p_corners = (
        np.asarray(pred.get("corners3d")) if "corners3d" in pred else None
    )

    all_keep = g_cls >= 0
    if prompted_ids is None:
        eval_keep = all_keep
    else:
        eval_keep = all_keep & np.isin(g_cls, list(prompted_ids))

    c1_2d, c1_3d = column(g_cls, g_boxes, g_corners, all_keep)
    c2_2d, c2_3d = column(g_cls, g_boxes, g_corners, eval_keep)
    c3_2d, c3_3d = column(
        p_cls, p_boxes, p_corners, np.ones(len(p_cls), bool), p_scores
    )
    top = cv2.hconcat([c1_2d, c2_2d, c3_2d])
    bottom = cv2.hconcat([c1_3d, c2_3d, c3_3d])
    return cv2.vconcat([top, bottom])


def draw_scene_view(image, K, corners3d_list, colors=None,
                    novel_angle_deg: float = 45.0) -> np.ndarray:
    """Front shaded render + novel-view shaded render, side by side
    (reference draw_scene_view, vis.py:309+, pytorch3d SoftPhong render
    replaced by the CPU flat-shaded z-buffer in vis.rasterize)."""
    import cv2

    from ovmono3d_tpu.vis.rasterize import render_mesh_view

    corners = np.asarray(corners3d_list, np.float64).reshape(-1, 8, 3)
    if colors is None:
        colors = np.array(
            [get_color(i) for i in range(len(corners))], np.float64
        )
    front = render_mesh_view(image, K, corners, colors)

    # Novel view: orbit the camera upward around the scene centroid by
    # novel_angle_deg about the camera-x axis (the reference's elevated
    # view), rendered on a blank canvas.
    if len(corners):
        center = corners.reshape(-1, 3).mean(0)
    else:
        center = np.array([0.0, 0.0, 5.0])
    a = np.deg2rad(novel_angle_deg)
    Rx = np.array(
        [[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]]
    )
    moved = (corners - center) @ Rx.T + center
    blank = np.full_like(np.asarray(image), 255)
    novel = render_mesh_view(blank, K, moved, colors)
    for i in range(len(moved)):
        novel = draw_cuboid_3d(novel, moved[i], K,
                               color=tuple(int(v) for v in colors[i]))
    return cv2.hconcat([front, novel])


def scene_panel(image, det, K, class_names=None) -> np.ndarray:
    """Side-by-side: image with 2D+3D boxes | BEV (draw_scene_view spirit)."""
    import cv2

    valid = np.asarray(det.valid).astype(bool)
    boxes = np.asarray(det.boxes)[valid]
    corners = np.asarray(det.corners3d)[valid]
    classes = np.asarray(det.classes)[valid]
    scores = np.asarray(det.scores)[valid]
    labels = [
        class_names[c] if class_names else str(int(c)) for c in classes
    ]
    img = draw_boxes_2d(image, boxes, labels, scores)
    for i in range(len(corners)):
        img = draw_cuboid_3d(img, corners[i], K, color=get_color(i))
    bev = draw_bev(list(corners))
    bev = cv2.resize(bev, (img.shape[0], img.shape[0]))
    return np.concatenate([img, bev], axis=1)
