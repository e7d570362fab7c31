"""Geometry core vs the REFERENCE'S OWN CODE as the oracle.

The reference's math_util.py is unimportable here (its module header pulls
pytorch3d/detectron2 renderers), but the geometry functions themselves are
pure torch — this test ast-extracts just those function definitions from
/root/reference and executes them as the ground truth, with a local
Rodrigues standing in for pytorch3d's axis_angle_to_matrix. Nothing from
the reference is copied into the repo; its source is loaded at test time
and skipped when absent.
"""
import ast
import math
from pathlib import Path

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

_REF = Path("/root/reference/cubercnn/util/math_util.py")

_WANTED = {
    "get_cuboid_verts_faces",
    "get_cuboid_verts",
    "iou",
    "intersect",
    "convert_3d_box_to_2d",
    "R_from_allocentric",
    "R_to_allocentric",
    "compute_virtual_scale_from_focal_spaces",
    "scaled_sigmoid",
}


def _axis_angle_to_matrix(aa: "torch.Tensor") -> "torch.Tensor":
    """Rodrigues rotation (pytorch3d.transforms.axis_angle_to_matrix
    semantics: the vector's norm is the angle)."""
    angle = torch.linalg.norm(aa, dim=-1, keepdim=True)
    axis = aa / angle.clamp(min=1e-12)
    x, y, z = axis.unbind(-1)
    a = angle[..., 0]
    c, s = torch.cos(a), torch.sin(a)
    C = 1.0 - c
    row0 = torch.stack([c + x * x * C, x * y * C - z * s,
                        x * z * C + y * s], -1)
    row1 = torch.stack([y * x * C + z * s, c + y * y * C,
                        y * z * C - x * s], -1)
    row2 = torch.stack([z * x * C - y * s, z * y * C + x * s,
                        c + z * z * C], -1)
    return torch.stack([row0, row1, row2], -2)


@pytest.fixture(scope="module")
def ref():
    if not _REF.exists():
        pytest.skip("reference source not present")
    tree = ast.parse(_REF.read_text())
    body = [n for n in tree.body
            if isinstance(n, ast.FunctionDef) and n.name in _WANTED]
    assert {n.name for n in body} == _WANTED
    mod = ast.Module(body=body, type_ignores=[])
    ns = {
        "torch": torch,
        "np": np,
        "math": math,
        "to_float_tensor": lambda x: (
            x.float() if isinstance(x, torch.Tensor)
            else torch.as_tensor(np.asarray(x), dtype=torch.float32)
        ),
        "axis_angle_to_matrix": _axis_angle_to_matrix,
    }
    from scipy.optimize import linear_sum_assignment

    ns["linear_sum_assignment"] = linear_sum_assignment
    exec(compile(mod, str(_REF), "exec"), ns)
    return ns


def _random_rotations(rng, n):
    from scipy.spatial.transform import Rotation

    return Rotation.random(n, random_state=rng).as_matrix().astype(
        np.float32
    )


def test_cuboid_corners_match_reference(ref):
    from ovmono3d_tpu.utils.geometry import CUBOID_FACES, cuboid_corners

    rng = np.random.RandomState(0)
    box = np.concatenate(
        [rng.randn(16, 3), rng.rand(16, 3) + 0.2], -1
    ).astype(np.float32)
    R = _random_rotations(rng, 16)
    want_verts, want_faces = ref["get_cuboid_verts_faces"](
        torch.from_numpy(box), torch.from_numpy(R)
    )
    got = cuboid_corners(jnp.asarray(box), jnp.asarray(R))
    np.testing.assert_allclose(np.asarray(got), want_verts.numpy(),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(CUBOID_FACES),
                                  want_faces[0].numpy().astype(np.int64))


def test_allocentric_conversions_match_reference(ref):
    from ovmono3d_tpu.utils.geometry import (
        R_from_allocentric,
        R_to_allocentric,
    )

    rng = np.random.RandomState(1)
    n = 32
    K = np.tile(np.array([[320.0, 0, 310], [0, 330.0, 250], [0, 0, 1]],
                         np.float32), (n, 1, 1))
    R = _random_rotations(rng, n)
    u = (rng.rand(n) * 640).astype(np.float32)
    v = (rng.rand(n) * 480).astype(np.float32)
    # include the exact on-axis case (angle == 0 branch)
    u[0], v[0] = 310.0, 250.0

    want = ref["R_from_allocentric"](
        torch.from_numpy(K), torch.from_numpy(R), torch.from_numpy(u),
        torch.from_numpy(v),
    ).numpy()
    got = np.asarray(R_from_allocentric(
        jnp.asarray(K), jnp.asarray(R), jnp.asarray(u), jnp.asarray(v)
    ))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    want = ref["R_to_allocentric"](
        torch.from_numpy(K), torch.from_numpy(R), torch.from_numpy(u),
        torch.from_numpy(v),
    ).numpy()
    got = np.asarray(R_to_allocentric(
        jnp.asarray(K), jnp.asarray(R), jnp.asarray(u), jnp.asarray(v)
    ))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_virtual_scale_and_scaled_sigmoid_match_reference(ref):
    from ovmono3d_tpu.utils.geometry import (
        scaled_sigmoid,
        virtual_to_real_scale,
    )

    want = ref["compute_virtual_scale_from_focal_spaces"](
        f=500.0, H=480.0, f0=512.0, H0=896.0
    )
    got = float(virtual_to_real_scale(jnp.asarray(500.0), jnp.asarray(480.0),
                                      512.0, jnp.asarray(896.0)))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    x = np.linspace(-6, 6, 25).astype(np.float32)
    want = ref["scaled_sigmoid"](torch.from_numpy(x), min=0.5,
                                 max=2.5).numpy()
    got = np.asarray(scaled_sigmoid(jnp.asarray(x), 0.5, 2.5))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


def test_convert_3d_box_to_2d_matches_reference(ref):
    """Projection + behind-camera corner clipping (the reference's 2D-box
    derivation for vis/eval, math_util.py:498-577) across in-front,
    straddling, and fully-behind cuboids."""
    from ovmono3d_tpu.utils.geometry import cuboid_to_2d_box

    rng = np.random.RandomState(2)
    n = 24
    centers = rng.randn(n, 3).astype(np.float32) * 2.0
    centers[:8, 2] = rng.rand(8) * 8 + 2          # clearly in front
    centers[8:16, 2] = rng.randn(8) * 0.4         # straddling the plane
    centers[16:, 2] = -(rng.rand(8) * 5 + 1)      # behind
    dims = (rng.rand(n, 3) + 0.3).astype(np.float32)
    box = np.concatenate([centers, dims], -1)
    R = _random_rotations(rng, n)
    K = np.array([[320.0, 0, 310], [0, 330.0, 250], [0, 0, 1]], np.float32)

    want_box, want_behind, want_fully = ref["convert_3d_box_to_2d"](
        torch.from_numpy(K), torch.from_numpy(box), torch.from_numpy(R),
        clipw=640, cliph=480, XYWH=True,
    )
    got_box, got_behind, got_fully = cuboid_to_2d_box(
        jnp.asarray(K), jnp.asarray(box), jnp.asarray(R),
        clip_w=640, clip_h=480, xywh=True,
    )
    np.testing.assert_array_equal(np.asarray(got_behind),
                                  want_behind.numpy())
    np.testing.assert_array_equal(np.asarray(got_fully),
                                  want_fully.numpy())
    np.testing.assert_allclose(np.asarray(got_box), want_box.numpy(),
                               atol=1e-2, rtol=1e-4)


def test_2d_iou_matches_reference(ref):
    """ops.iou2d vs the reference's iou/intersect (math_util.py:850-966),
    cross mode + ignore-area-b (IoA) mode."""
    from ovmono3d_tpu.ops.iou2d import pairwise_ioa, pairwise_iou

    rng = np.random.RandomState(3)

    def boxes(n):
        xy = rng.rand(n, 2) * 100
        wh = rng.rand(n, 2) * 50 + 1
        return np.concatenate([xy, xy + wh], -1).astype(np.float32)

    a, b = boxes(13), boxes(7)
    want = ref["iou"](torch.from_numpy(a), torch.from_numpy(b),
                      mode="cross").numpy()
    got = np.asarray(pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-5)

    # reference ign_area_b divides by area(a): fraction of a inside b —
    # our pairwise_ioa divides by area(boxes2), so swap + transpose.
    want = ref["iou"](torch.from_numpy(a), torch.from_numpy(b),
                      mode="cross", ign_area_b=True).numpy()
    got = np.asarray(pairwise_ioa(jnp.asarray(b), jnp.asarray(a))).T
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-5)


def test_category_sets_match_reference():
    """data.builtin vs the reference's hard-coded category splits
    (builtin.py:12-53) for every dataset name the reference accepts —
    a silent typo here skews base/novel AP splits."""
    ref_path = Path("/root/reference/cubercnn/data/builtin.py")
    if not ref_path.exists():
        pytest.skip("reference source not present")
    ns = {}
    exec(compile(ref_path.read_text(), str(ref_path), "exec"), ns)
    ref_cats = ns["get_omni3d_categories"]

    from ovmono3d_tpu.data.builtin import get_omni3d_categories

    names = [
        "omni3d", "omni3d_in", "omni3d_out",
        "SUNRGBD_train", "SUNRGBD_val", "SUNRGBD_test",
        "Hypersim_train", "Hypersim_val", "Hypersim_test",
        "ARKitScenes_train", "ARKitScenes_val", "ARKitScenes_test",
        "Objectron_train", "Objectron_val", "Objectron_test",
        "KITTI_train", "KITTI_val", "KITTI_test",
        "nuScenes_train", "nuScenes_val", "nuScenes_test",
        "SUNRGBD_test_novel", "ARKitScenes_test_novel", "KITTI_test_novel",
    ]
    for name in names:
        assert set(get_omni3d_categories(name)) == set(ref_cats(name)), name


def test_is_ignore_matches_reference():
    """Fuzz the multi-criterion annotation filter against the reference's
    is_ignore (datasets.py:82-122) across 500 random annotations spanning
    every criterion (behind-camera, invalid 3D, degenerate dims, depth cap,
    lidar/segmentation emptiness, depth error, box-height bounds from each
    2D source, truncation/visibility)."""
    ref_path = Path("/root/reference/cubercnn/data/datasets.py")
    if not ref_path.exists():
        pytest.skip("reference source not present")

    tree = ast.parse(ref_path.read_text())
    body = [n for n in tree.body if isinstance(n, ast.FunctionDef)
            and n.name in ("is_ignore", "get_filter_settings_from_cfg")]

    class _BoxMode:
        XYXY_ABS, XYWH_ABS = 0, 1

        @staticmethod
        def convert(box, frm, to):
            assert frm == _BoxMode.XYXY_ABS and to == _BoxMode.XYWH_ABS
            x1, y1, x2, y2 = box
            return [x1, y1, x2 - x1, y2 - y1]

    ns = {"np": np, "BoxMode": _BoxMode}
    exec(compile(ast.Module(body=body, type_ignores=[]), str(ref_path),
                 "exec"), ns)
    ref_fs = ns["get_filter_settings_from_cfg"](None)
    ref_fs["trunc_2D_boxes"] = True

    from ovmono3d_tpu.data.datasets import FilterSettings, is_ignore

    fs = FilterSettings(trunc_2d_boxes=True, modal_2d_boxes=False)
    rng = np.random.RandomState(4)
    H = 480
    mismatches = []
    for i in range(500):
        x1, y1 = rng.rand(2) * 300
        w, h = rng.rand(2) * rng.choice([10.0, 200.0, 900.0], 2)
        anno = {
            "behind_camera": bool(rng.rand() < 0.1),
            "valid3D": bool(rng.rand() > 0.1),
            "dimensions": list(rng.randn(3) * 0.5 + 0.5),
            "center_cam": [0.0, 0.0, float(rng.rand() * 2e8)],
            "lidar_pts": int(rng.rand() > 0.1),
            "segmentation_pts": int(rng.rand() > 0.1),
            "depth_error": float(rng.rand()),
            "truncation": float(rng.choice([-1.0, rng.rand()])),
            "visibility": float(rng.choice([-1.0, rng.rand()])),
            "category_name": "chair",
            "bbox2D_trunc": (
                [-1, -1, -1, -1] if rng.rand() < 0.2
                else [x1, y1, x1 + w, y1 + h]
            ),
            "bbox2D_proj": [x1, y1, x1 + w * 0.8, y1 + h * 0.8],
            "bbox": [x1, y1, w, h],
        }
        want = bool(ns["is_ignore"](anno, ref_fs, H))
        got = is_ignore(anno, fs, H)
        if want != got:
            mismatches.append((i, anno, want, got))
    assert not mismatches, mismatches[:3]


def test_nhd_matches_reference():
    """Hungarian corner distance + diagonal normalization vs the
    reference's calculate_nhd (omni3d_evaluation.py:2227-2247): the
    matched costs are SUMMED and normalized by the AABB diagonal of the
    rotated GT corners."""
    ref_path = Path(
        "/root/reference/cubercnn/evaluation/omni3d_evaluation.py"
    )
    if not ref_path.exists():
        pytest.skip("reference source not present")
    from scipy.optimize import linear_sum_assignment

    tree = ast.parse(ref_path.read_text())
    body = [n for n in tree.body if isinstance(n, ast.FunctionDef)
            and n.name == "calculate_nhd"]
    ns = {"np": np, "linear_sum_assignment": linear_sum_assignment}
    exec(compile(ast.Module(body=body, type_ignores=[]), str(ref_path),
                 "exec"), ns)
    ref = ns

    from ovmono3d_tpu.evaluation.omni3d_eval import (
        corners_diag,
        hungarian_corner_distance,
    )

    rng = np.random.RandomState(5)
    n = 12
    for i in range(n):
        pred = rng.randn(8, 3) * 2
        gt = rng.randn(8, 3) * 2
        want = ref["calculate_nhd"](pred, gt)
        got = (hungarian_corner_distance(pred[None], gt[None])
               / corners_diag(gt[None]))[0]
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_compute_priors_matches_reference():
    """utils.priors.compute_priors vs the reference's compute_priors
    (math_util.py:292-496) executed on identical annotations: test-resolution
    2D-scale rescale, virtual-depth z conversion, per-category dims/z stats
    (pandas ddof=1), the custom best-of K-means with top-k fill, and the
    dummy fallbacks for unseen / under-sampled categories."""
    if not _REF.exists():
        pytest.skip("reference source not present")
    pd = pytest.importorskip("pandas")
    import types

    tree = ast.parse(_REF.read_text())
    wanted = {"compute_priors", "approx_eval_resolution",
              "compute_virtual_scale_from_focal_spaces"}
    body = [n for n in tree.body
            if isinstance(n, ast.FunctionDef) and n.name in wanted]
    assert {n.name for n in body} == wanted

    class _BoxMode:
        XYXY_ABS, XYWH_ABS = 0, 1

        @staticmethod
        def convert(box, from_mode, to_mode):
            x1, y1, x2, y2 = box
            return [x1, y1, x2 - x1, y2 - y1]

    names = ["chair", "table", "books", "cup", "lamp", "shoes"]
    meta = types.SimpleNamespace(thing_classes=names)
    ns = {
        "torch": torch, "np": np, "pd": pd, "math": math,
        "BoxMode": _BoxMode,
        "MetadataCatalog": types.SimpleNamespace(get=lambda _name: meta),
        "print": lambda *a, **k: None,
    }
    exec(compile(ast.Module(body=body, type_ignores=[]), str(_REF),
                 "exec"), ns)

    # --- synthetic annotations: per-category sample counts exercising the
    # unseen-dummy (0), the under-sampled-bins branch (3) and the full
    # K-means path (>= 30) -------------------------------------------------
    rng = np.random.RandomState(7)
    counts = [0, 3, 30, 55, 80, 120]
    img_shapes = [(480, 640, 520.0), (1080, 1920, 1250.0),
                  (375, 1242, 721.5), (768, 1024, 980.0)]
    imgs, anns, records = {}, [], []
    for i, (h, w, f) in enumerate(img_shapes):
        K = [[f, 0.0, w / 2], [0.0, f, h / 2], [0.0, 0.0, 1.0]]
        imgs[i] = {"K": K, "height": h, "width": w}
        records.append({"image_id": i, "height": h, "width": w, "K": K,
                        "annotations": []})
    for cid, cnt in enumerate(counts):
        for _ in range(cnt):
            i = int(rng.randint(len(img_shapes)))
            h, w, _f = img_shapes[i]
            x1 = rng.uniform(0, w * 0.6)
            y1 = rng.uniform(0, h * 0.6)
            bw = rng.uniform(8, w * 0.35)
            bh = rng.uniform(8, h * 0.35)
            box = [x1, y1, x1 + bw, y1 + bh]
            dims = rng.uniform(0.2, 2.0, 3).tolist()
            center = [rng.uniform(-2, 2), rng.uniform(-1, 1),
                      rng.uniform(1.0, 40.0)]
            ignore = bool(rng.rand() < 0.15)
            anns.append({
                "category_name": names[cid].upper(),  # ref lowercases
                "ignore": ignore, "dataset_id": 0, "image_id": i,
                "bbox2D_proj": box, "center_cam": center,
                "dimensions": dims,
            })
            records[i]["annotations"].append({
                "category_id": -1 if ignore else cid, "ignore": ignore,
                "bbox2d": box, "center_cam": center, "dimensions": dims,
            })
    # annotations for a category outside the master list are dropped
    anns.append({"category_name": "zebra", "ignore": False,
                 "dataset_id": 0, "image_id": 0,
                 "bbox2D_proj": [0, 0, 50, 50],
                 "center_cam": [0, 0, 5.0], "dimensions": [1, 1, 1]})
    records[0]["annotations"].append({
        "category_id": -1, "ignore": False, "bbox2d": [0, 0, 50, 50],
        "center_cam": [0, 0, 5.0], "dimensions": [1, 1, 1]})

    class _COCOStub:
        def __init__(self):
            self.imgs = imgs

        def getAnnIds(self):
            return list(range(len(anns)))

        def loadAnns(self, ids):
            return [anns[i] for i in ids]

    n_bins, vfocal, tmin, tmax = 4, 512.0, 532, 896
    cfg = types.SimpleNamespace(
        MODEL=types.SimpleNamespace(
            ROI_CUBE_HEAD=types.SimpleNamespace(
                VIRTUAL_DEPTH=True, VIRTUAL_FOCAL=vfocal,
                CLUSTER_BINS=n_bins),
            ANCHOR_GENERATOR=types.SimpleNamespace(SIZES=[[64.0], [256.0],
                                                          [512.0]]),
        ),
        INPUT=types.SimpleNamespace(MIN_SIZE_TEST=tmin, MAX_SIZE_TEST=tmax),
        DATASETS=types.SimpleNamespace(MODAL_2D_BOXES=False,
                                       TRUNC_2D_BOXES=False),
    )
    want = ns["compute_priors"](cfg, _COCOStub())

    from ovmono3d_tpu.utils.priors import compute_priors

    got = compute_priors(
        records, len(names), n_bins,
        virtual_depth=True, virtual_focal=vfocal,
        test_min=tmin, test_max=tmax, anchor_min=64.0, anchor_max=512.0,
    )

    np.testing.assert_allclose(
        got["dims"], np.asarray(want["priors_dims_per_cat"], np.float32),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        got["z"], np.asarray(want["priors_z3d_per_cat"], np.float32),
        rtol=1e-5, atol=1e-6)
    assert len(want["priors_bins"]) == len(names)
    for c, (cat, scales, bin_z) in enumerate(want["priors_bins"]):
        assert cat == names[c]
        np.testing.assert_allclose(
            got["z_scales"][c], np.asarray(scales, np.float32),
            rtol=1e-5, atol=1e-4, err_msg=f"cluster scales cat {cat}")
        np.testing.assert_allclose(
            got["z_stats"][c], np.asarray(bin_z, np.float32),
            rtol=1e-5, atol=1e-5, err_msg=f"bin z stats cat {cat}")


def test_rpn_iouness_losses_match_reference():
    """RPN IoUness losses vs the reference's
    _dense_box_regression_loss_with_uncertainty + matched_pairwise_iou
    (rpn.py:206-354) executed on identical anchors/logits/deltas/fg masks:
    BCE(logit, matched-IoU) weighted by the IoU itself, and per-anchor
    summed L1 on deltas weighted by the IoU, both summed over foreground."""
    ref_path = Path(
        "/root/reference/cubercnn/modeling/proposal_generator/rpn.py"
    )
    if not ref_path.exists():
        pytest.skip("reference source not present")
    import types

    import torch.nn.functional as F

    tree = ast.parse(ref_path.read_text())
    wanted = {"_dense_box_regression_loss_with_uncertainty",
              "matched_pairwise_iou"}
    body = [n for n in tree.body
            if isinstance(n, ast.FunctionDef) and n.name in wanted]
    assert {n.name for n in body} == wanted

    class _Boxes:
        """detectron2.structures.Boxes surface used by the extracted code."""

        def __init__(self, tensor):
            self.tensor = tensor

        def __len__(self):
            return self.tensor.shape[0]

        def area(self):
            b = self.tensor
            return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    class _Box2Box:
        """Box2BoxTransform.get_deltas with unit weights (detectron2
        defaults used by the reference RPN)."""

        def get_deltas(self, src, tgt):
            sw = src[:, 2] - src[:, 0]
            sh = src[:, 3] - src[:, 1]
            scx = src[:, 0] + 0.5 * sw
            scy = src[:, 1] + 0.5 * sh
            tw = tgt[:, 2] - tgt[:, 0]
            th = tgt[:, 3] - tgt[:, 1]
            tcx = tgt[:, 0] + 0.5 * tw
            tcy = tgt[:, 1] + 0.5 * th
            return torch.stack([(tcx - scx) / sw, (tcy - scy) / sh,
                                torch.log(tw / sw), torch.log(th / sh)], 1)

    def _smooth_l1(input, target, beta, reduction="none"):
        # fvcore.nn.smooth_l1_loss
        if beta < 1e-5:
            loss = torch.abs(input - target)
        else:
            n = torch.abs(input - target)
            loss = torch.where(n < beta, 0.5 * n**2 / beta, n - 0.5 * beta)
        if reduction == "sum":
            loss = loss.sum()
        return loss

    storage = types.SimpleNamespace(put_scalar=lambda *a, **k: None)
    ns = {
        "torch": torch, "np": np, "F": F, "List": list, "Union": None,
        "Boxes": _Boxes, "Box2BoxTransform": _Box2Box,
        "cat": torch.cat, "smooth_l1_loss": _smooth_l1,
        "get_event_storage": lambda: storage,
    }
    import typing

    ns["List"] = typing.List
    ns["Union"] = typing.Union
    exec(compile(ast.Module(body=body, type_ignores=[]), str(ref_path),
                 "exec"), ns)

    rng = np.random.RandomState(11)
    N, R = 2, 48
    x1 = rng.uniform(0, 300, (R, 1))
    y1 = rng.uniform(0, 300, (R, 1))
    anchors = np.concatenate(
        [x1, y1, x1 + rng.uniform(8, 120, (R, 1)),
         y1 + rng.uniform(8, 120, (R, 1))], 1).astype(np.float32)
    # matched gt per anchor: the anchor jittered (overlapping, IoU > 0)
    gt = np.stack([
        anchors + rng.uniform(-6, 6, (R, 4)).astype(np.float32)
        for _ in range(N)
    ])
    gt[..., 2] = np.maximum(gt[..., 2], gt[..., 0] + 4)
    gt[..., 3] = np.maximum(gt[..., 3], gt[..., 1] + 4)
    logits = rng.randn(N, R).astype(np.float32)
    deltas = rng.randn(N, R, 4).astype(np.float32) * 0.3
    fg = rng.rand(N, R) < 0.3

    t = torch.from_numpy
    want_reg, want_conf = ns["_dense_box_regression_loss_with_uncertainty"](
        [t(anchors)], _Box2Box(), [t(deltas)], [t(logits)],
        [t(gt[i]) for i in range(N)], t(fg),
        box_reg_loss_type="smooth_l1", smooth_l1_beta=0.0,
    )

    from ovmono3d_tpu.models.rcnn3d import optax_sigmoid_bce, smooth_l1
    from ovmono3d_tpu.ops import boxes as box_ops

    ours_anchors = jnp.asarray(np.broadcast_to(anchors, (N, R, 4)))
    iou_targets = _diag_iou(ours_anchors, jnp.asarray(gt))
    fg_f = jnp.asarray(fg, jnp.float32)
    bce = optax_sigmoid_bce(jnp.asarray(logits), iou_targets)
    got_conf = jnp.sum(bce * iou_targets * fg_f)
    gt_deltas = box_ops.get_deltas(ours_anchors, jnp.asarray(gt))
    reg = smooth_l1(jnp.asarray(deltas), gt_deltas).sum(-1)
    got_reg = jnp.sum(reg * iou_targets * fg_f)

    np.testing.assert_allclose(float(got_conf), float(want_conf), rtol=1e-5)
    np.testing.assert_allclose(float(got_reg), float(want_reg), rtol=1e-5)


def _diag_iou(a, b):
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / (area_a + area_b - inter)


def test_geo_box_fit_matches_reference():
    """geo.pipeline.fit_box_from_mask_depth vs the reference's
    build_pseudo_bbox3d_from_mask2d_outlier (tools/ovmono3d_geo.py:127-210)
    executed on an identical mask + depth map: unprojection with the open3d
    flip, PCA yaw on the xz plane, min/max box in the yaw frame, and the
    8-corner reconstruction. The synthetic cluster is dense enough that both
    outlier filters (reference DBSCAN, our voxel density-core) keep every
    point, making the geometric chain exactly comparable."""
    ref_path = Path("/root/reference/tools/ovmono3d_geo.py")
    if not ref_path.exists():
        pytest.skip("reference source not present")
    sklearn = pytest.importorskip("sklearn")
    from sklearn.cluster import DBSCAN
    from sklearn.decomposition import PCA
    from sklearn.utils import shuffle

    tree = ast.parse(ref_path.read_text())
    wanted = {"build_pseudo_bbox3d_from_mask2d_outlier", "gen_8corners",
              "heading2rotmat", "auto_downsample"}
    body = [n for n in tree.body
            if isinstance(n, ast.FunctionDef) and n.name in wanted]
    assert {n.name for n in body} == wanted
    ns = {
        "np": np, "PCA": PCA, "DBSCAN": DBSCAN, "shuffle": shuffle,
        "print": lambda *a, **k: None,
        "build_lineset": lambda *a, **k: None,
    }
    exec(compile(ast.Module(body=body, type_ignores=[]), str(ref_path),
                 "exec"), ns)

    # dense tilted plane patch: ~2500 points spanning ~2.5 cm at z~0.5 m
    rng = np.random.RandomState(3)
    H = W = 128
    K = np.array([[1000.0, 0, W / 2], [0, 1000.0, H / 2], [0, 0, 1]])
    mask = np.zeros((H, W), np.float32)
    mask[40:90, 38:88] = 1.0
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    depth = (0.5 + 2e-4 * (xx - W / 2) + 1e-4 * (yy - H / 2)).astype(
        np.float64
    )

    want_bbox, _ls, _dims, _yaw = ns[
        "build_pseudo_bbox3d_from_mask2d_outlier"
    ](mask, depth, K)

    import jax

    from ovmono3d_tpu.geo.pipeline import fit_box_from_mask_depth

    got = jax.jit(fit_box_from_mask_depth)(
        jnp.asarray(mask), jnp.asarray(depth, jnp.float32),
        jnp.asarray(K, jnp.float32),
    )
    assert int(got["num_points"]) == int(mask.sum())

    flip = np.diag([1.0, -1.0, -1.0])
    want_corners_cam = np.asarray(want_bbox) @ flip

    def canon(c):
        c = np.round(np.asarray(c, np.float64), 5)
        return c[np.lexsort((c[:, 2], c[:, 1], c[:, 0]))]

    np.testing.assert_allclose(
        canon(got["corners"]), canon(want_corners_cam), atol=7e-4,
        err_msg="fitted corner sets differ")
    np.testing.assert_allclose(
        np.asarray(got["center"]), want_corners_cam.mean(0), atol=3e-4)


def test_evaluator_accumulate_summarize_match_reference():
    """Full AP/AR protocol vs the REFERENCE'S OWN Omni3Deval.accumulate and
    .summarize (omni3d_evaluation.py:1554-1688, 2072-2224), executed on
    pycocotools-format evalImgs built from our matcher's per-image results:
    validates band/areaRng handling, the maxDets axis, mergesort score
    ordering, the monotone precision envelope, searchsorted recall sampling,
    the -1 absent-category convention, and the 13-stat summary mapping."""
    ref_path = Path(
        "/root/reference/cubercnn/evaluation/omni3d_evaluation.py"
    )
    if not ref_path.exists():
        pytest.skip("reference source not present")
    import copy
    import datetime
    import time
    import types

    tree = ast.parse(ref_path.read_text())
    params_cls = next(n for n in tree.body if isinstance(n, ast.ClassDef)
                      and n.name == "Omni3DParams")
    omni_cls = next(n for n in tree.body if isinstance(n, ast.ClassDef)
                    and n.name == "Omni3Deval")
    fns = [n for n in omni_cls.body if isinstance(n, ast.FunctionDef)
           and n.name in ("accumulate", "summarize")]
    assert len(fns) == 2
    ns = {"np": np, "time": time, "datetime": datetime, "copy": copy,
          "print": lambda *a, **k: None}
    exec(compile(ast.Module(body=[params_cls] + fns, type_ignores=[]),
                 str(ref_path), "exec"), ns)

    from ovmono3d_tpu.evaluation.omni3d_eval import Omni3DEvaluator

    # --- synthetic detections/GT across area bands, with per-category
    # ignores, planted boundary areas, empty-category cases ----------------
    rng = np.random.RandomState(17)
    C, I = 4, 8
    ev = Omni3DEvaluator(C, mode="2D")
    img_of = [[] for _ in range(C)]

    def rand_box(kind):
        side = {"s": rng.uniform(8, 25, 2), "m": rng.uniform(40, 90, 2),
                "l": rng.uniform(120, 300, 2)}[kind]
        x, y = rng.uniform(0, 500, 2)
        return np.array([x, y, x + side[0], y + side[1]])

    for i in range(I):
        G = rng.randint(1, 7)
        g_boxes, g_cls, g_ign = [], [], []
        for _ in range(G):
            g_boxes.append(rand_box(rng.choice(["s", "m", "l"])))
            # category 3 gets GTs but (below) never detections
            g_cls.append(rng.randint(0, C))
            g_ign.append(bool(rng.rand() < 0.2))
        if i == 0:  # exact boundary: 32x32 = 1024 px^2, in BOTH s and m
            g_boxes.append(np.array([10.0, 10.0, 42.0, 42.0]))
            g_cls.append(0)
            g_ign.append(False)
        g_boxes = np.stack(g_boxes)
        g_cls = np.asarray(g_cls, np.int64)
        g_ign = np.asarray(g_ign, bool)

        d_boxes, d_cls, d_scores = [], [], []
        for g in range(len(g_boxes)):
            if g_cls[g] == 3 or rng.rand() < 0.25:
                continue
            jit = rng.randn(4) * 3
            d_boxes.append(g_boxes[g] + jit)
            # sometimes the wrong class
            d_cls.append(g_cls[g] if rng.rand() < 0.85
                         else rng.randint(0, 3))
            d_scores.append(rng.rand())
        for _ in range(rng.randint(0, 4)):  # false positives
            d_boxes.append(rand_box(rng.choice(["s", "m", "l"])))
            d_cls.append(rng.randint(0, 3))
            d_scores.append(rng.rand())
        pred = {
            "classes": np.asarray(d_cls, np.int64),
            "scores": np.asarray(d_scores, float),
            "boxes2d": (np.stack(d_boxes) if d_boxes
                        else np.zeros((0, 4))),
        }
        before = [len(ev.evals["all"][c]) for c in range(C)]
        ev.add_image(
            {"classes": g_cls, "ignore": g_ign, "boxes2d": g_boxes}, pred
        )
        for c in range(C):
            if len(ev.evals["all"][c]) > before[c]:
                img_of[c].append(i)

    # --- reference side: evalImgs in pycocotools layout -------------------
    bands = list(ev.bands)
    assert bands == ["all", "small", "medium", "large"]
    eval_imgs = []
    for c in range(C):
        for band in bands:
            per_img = {}
            for k, i in enumerate(img_of[c]):
                e = ev.evals[band][c][k]
                per_img[i] = {
                    "dtScores": np.asarray(e.det_scores, float),
                    "dtMatches": (e.det_matched + 1).astype(float),
                    "dtIgnore": e.det_ignored.astype(bool),
                    "gtIgnore": np.zeros(e.num_gt, int),
                }
            eval_imgs.extend(per_img.get(i) for i in range(I))

    p = ns["Omni3DParams"]("2D")
    p.imgIds = list(range(I))
    p.catIds = list(range(C))
    stub = types.SimpleNamespace(
        params=p, _paramsEval=copy.deepcopy(p), evalImgs=eval_imgs,
        evals_per_cat_area=None, eval={}, mode="2D", stats=[],
    )
    ns["accumulate"](stub)
    ns["summarize"](stub)

    # --- compare the full precision/recall tensors ------------------------
    for a, band in enumerate(bands):
        for m, cap in enumerate([1, 10, 100]):
            prec, rec, _ = ev._pr_curves(band, max_dets=cap)
            np.testing.assert_allclose(
                prec, stub.eval["precision"][:, :, :, a, m], atol=1e-12,
                err_msg=f"precision band={band} maxDets={cap}")
            np.testing.assert_allclose(
                rec, stub.eval["recall"][:, :, a, m], atol=1e-12,
                err_msg=f"recall band={band} maxDets={cap}")

    # --- and the 13-stat summary -------------------------------------------
    got = ev.summarize()
    want = np.asarray(stub.stats)
    mapping = [
        ("AP2D", 0), ("AP2D@50", 1), ("AP2D@75", 2), ("AP2D@95", 3),
        ("AP2D-S", 4), ("AP2D-M", 5), ("AP2D-L", 6),
        ("AR2D@1", 7), ("AR2D@10", 8), ("AR2D", 9),
        ("AR2D-S", 10), ("AR2D-M", 11), ("AR2D-L", 12),
    ]
    for key, si in mapping:
        np.testing.assert_allclose(
            got[key] / 100.0, want[si], atol=1e-12,
            err_msg=f"{key} vs stats[{si}]")
    # non-vacuity: the planted data must populate every band and the
    # headline AP must be a real value strictly inside (0, 100)
    assert 0 < got["AP2D"] < 100
    for key in ("AP2D-S", "AP2D-M", "AP2D-L", "AR2D@1", "AR2D-S"):
        assert got[key] > 0, key


# ---------------------------------------------------------------------------
# Cube-head training losses vs the reference's own loss block
# ---------------------------------------------------------------------------

def _load_cube_loss_block():
    """Extract the `if self.training:` loss subtree of
    ROIHeads3D._forward_cube (roi_heads.py:551-792) plus the class's own
    l1_loss / chamfer_loss / safely_reduce_losses methods, compiled for
    exec with a caller-provided namespace."""
    path = Path("/root/reference/cubercnn/modeling/roi_heads/roi_heads.py")
    if not path.exists():
        pytest.skip("reference source not present")
    tree = ast.parse(path.read_text())
    cls = next(
        n for n in tree.body
        if isinstance(n, ast.ClassDef) and n.name == "ROIHeads3D"
    )
    fwd = next(
        m for m in cls.body
        if isinstance(m, ast.FunctionDef) and m.name == "_forward_cube"
    )

    def _starts_with_prefix_assign(if_node):
        for s in if_node.body[:3]:
            if isinstance(s, ast.Assign) and any(
                isinstance(t, ast.Name) and t.id == "prefix"
                for t in s.targets
            ):
                return True
        return False

    train_if = next(
        s for s in fwd.body
        if isinstance(s, ast.If)
        and isinstance(s.test, ast.Attribute)
        and s.test.attr == "training"
        and _starts_with_prefix_assign(s)
    )
    block = compile(
        ast.Module(body=train_if.body, type_ignores=[]), str(path), "exec"
    )
    methods = {}
    for m in cls.body:
        if isinstance(m, ast.FunctionDef) and m.name in {
            "l1_loss", "chamfer_loss", "safely_reduce_losses",
        }:
            ns = {"torch": torch, "F": torch.nn.functional}
            exec(
                compile(ast.Module(body=[m], type_ignores=[]), str(path),
                        "exec"),
                ns,
            )
            methods[m.name] = ns[m.name]
    assert len(methods) == 3
    return block, methods


def _so3_relative_angle_torch(r1, r2, eps=1e-4, cos_angle=False):
    """pytorch3d.transforms.so3_relative_angle stand-in (pure torch):
    angle of r1 @ r2^T via the trace formula; with cos_angle=True the RAW
    cosine is returned (pytorch3d only clamps in its acos branch)."""
    r12 = torch.bmm(r1, r2.transpose(1, 2))
    trace = r12[:, 0, 0] + r12[:, 1, 1] + r12[:, 2, 2]
    cos = (trace - 1.0) * 0.5
    if cos_angle:
        return cos
    return torch.acos(cos.clamp(-1.0 + eps, 1.0 - eps))


def _run_reference_cube_losses(ref, flags, data):
    """Execute the reference's training-loss block with `flags` on `self`
    and `data` as the decoded/GT tensors. Returns its `losses` dict."""
    import types

    block, methods = _load_cube_loss_block()
    self_obj = types.SimpleNamespace(**flags)
    for name, fn in methods.items():
        setattr(self_obj, name, types.MethodType(fn, self_obj))
    storage = types.SimpleNamespace(put_scalar=lambda *a, **k: None)
    util_ns = types.SimpleNamespace(
        get_cuboid_verts_faces=ref["get_cuboid_verts_faces"],
        R_to_allocentric=ref["R_to_allocentric"],
    )
    losses = {}
    ns = {
        "self": self_obj,
        "torch": torch,
        "np": np,
        "F": torch.nn.functional,
        "util": util_ns,
        "get_event_storage": lambda: storage,
        "so3_relative_angle": _so3_relative_angle_torch,
        "E_CONSTANT": 2.71828183,       # roi_heads.py:28
        "SQRT_2_CONSTANT": 1.41421356,  # roi_heads.py:29
        "losses": losses,
        **data,
    }
    exec(block, ns)
    return ns["losses"]


def _cube_loss_data(rng, N, z_type="direct"):
    """Random but geometrically sane decoded predictions + GTs, as both the
    torch namespace the reference block needs and our jax-side inputs."""
    from scipy.spatial.transform import Rotation

    fx = rng.uniform(400, 800, N).astype(np.float32)
    fy = rng.uniform(400, 800, N).astype(np.float32)
    K = np.zeros((N, 3, 3), np.float32)
    K[:, 0, 0] = fx
    K[:, 1, 1] = fy
    K[:, 0, 2] = rng.uniform(300, 500, N)
    K[:, 1, 2] = rng.uniform(200, 400, N)
    K[:, 2, 2] = 1.0

    gt_2d = rng.uniform(100, 700, (N, 2)).astype(np.float32)
    gt_z = rng.uniform(1.5, 30.0, N).astype(np.float32)
    gt_dims = rng.uniform(0.3, 3.5, (N, 3)).astype(np.float32)
    gt_boxes3d = np.concatenate(
        [gt_2d, gt_z[:, None], gt_dims, np.zeros((N, 3), np.float32)], 1
    )
    gt_poses = Rotation.random(N, random_state=rng).as_matrix().astype(
        np.float32
    )

    cube_x = (gt_2d[:, 0] + rng.randn(N) * 12).astype(np.float32)
    cube_y = (gt_2d[:, 1] + rng.randn(N) * 12).astype(np.float32)
    cube_z = (gt_z * np.exp(rng.randn(N) * 0.2)).astype(np.float32)
    cube_dims = (gt_dims * np.exp(rng.randn(N, 3) * 0.2)).astype(np.float32)
    cube_pose = Rotation.random(N, random_state=rng).as_matrix().astype(
        np.float32
    )
    cube_pose_allo = Rotation.random(N, random_state=rng).as_matrix().astype(
        np.float32
    )
    cube_uncert = rng.uniform(-1, 1, N).astype(np.float32)
    deltas_2d = (rng.randn(N, 2) * 0.3).astype(np.float32)
    dims_norm = (rng.randn(N, 3) * 0.4).astype(np.float32)
    v2r = rng.uniform(0.5, 2.0, N).astype(np.float32)
    z_mean = rng.uniform(2, 20, N).astype(np.float32)
    z_std = rng.uniform(0.5, 4, N).astype(np.float32)
    if z_type == "sigmoid":
        z_norm = rng.uniform(0.01, 0.99, N).astype(np.float32)
    else:
        z_norm = (rng.randn(N) * 0.5 + 1.0).astype(np.float32)

    src = np.zeros((N, 4), np.float32)
    src[:, 0] = gt_2d[:, 0] - rng.uniform(30, 80, N)
    src[:, 1] = gt_2d[:, 1] - rng.uniform(30, 80, N)
    src[:, 2] = gt_2d[:, 0] + rng.uniform(30, 80, N)
    src[:, 3] = gt_2d[:, 1] + rng.uniform(30, 80, N)

    t = torch.from_numpy
    torch_ns = {
        "gt_boxes3D": t(gt_boxes3d),
        "gt_poses": t(gt_poses),
        "Ks_scaled_per_box": t(K),
        "cube_x": t(cube_x),
        "cube_y": t(cube_y),
        "cube_xy": t(np.stack([cube_x, cube_y], 1)),
        "cube_z": t(cube_z),
        "cube_dims": t(cube_dims),
        "cube_pose": t(cube_pose),
        "cube_pose_allocentric": t(cube_pose_allo),
        "cube_uncert": t(cube_uncert),
        "cube_2d_deltas": t(deltas_2d),
        "cube_dims_norm": t(dims_norm),
        "cube_z_norm": t(z_norm),
        "real_to_virtual": t(1.0 / v2r),
        "z_means": t(z_mean),
        "z_stds": t(z_std),
        "src_ctr_x": t((src[:, 0] + src[:, 2]) / 2),
        "src_ctr_y": t((src[:, 1] + src[:, 3]) / 2),
        "src_widths": t(src[:, 2] - src[:, 0]),
        "src_heights": t(src[:, 3] - src[:, 1]),
        "n": N,
        "num_boxes_per_image": N,
    }
    dec = {
        "x": jnp.asarray(cube_x),
        "y": jnp.asarray(cube_y),
        "z": jnp.asarray(cube_z),
        "z_norm": jnp.asarray(z_norm),
        "dims": jnp.asarray(cube_dims),
        "dims_norm": jnp.asarray(dims_norm),
        "pose": jnp.asarray(cube_pose),
        "pose_allocentric": jnp.asarray(cube_pose_allo),
        "uncert": jnp.asarray(cube_uncert),
        "deltas_2d": jnp.asarray(deltas_2d),
        "virtual_to_real": jnp.asarray(v2r),
        "z_mean": jnp.asarray(z_mean),
        "z_std": jnp.asarray(z_std),
    }
    ours_inputs = dict(
        dec=dec,
        gt_boxes3d=jnp.asarray(gt_boxes3d),
        gt_poses=jnp.asarray(gt_poses),
        K_scaled=jnp.asarray(K),
        fg_mask=jnp.ones((N,), jnp.float32),
        src_boxes=jnp.asarray(src),
    )
    return torch_ns, ours_inputs


_REF_LOSS_KEYMAP = {
    "loss_xy": "Cube/loss_xy",
    "loss_z": "Cube/loss_z",
    "loss_dims": "Cube/loss_dims",
    "loss_pose": "Cube/loss_pose",
    "loss_joint": "Cube/loss_joint",
    "loss_uncert": "Cube/uncert",
}

_LOSS_WEIGHT_FLAGS = dict(
    loss_w_3d=1.7, loss_w_xy=0.8, loss_w_z=1.3, loss_w_dims=0.7,
    loss_w_pose=1.1, loss_w_joint=0.6,
)


def _compare_cube_losses(ref_losses, ours):
    assert set(ours) == set(_REF_LOSS_KEYMAP), sorted(ours)
    for k, ref_k in _REF_LOSS_KEYMAP.items():
        np.testing.assert_allclose(
            float(ours[k]), float(ref_losses[ref_k]), rtol=2e-4, atol=1e-6,
            err_msg=k,
        )
        assert float(ours[k]) != 0.0, k  # non-vacuous


def test_cube_losses_disentangled_match_reference(ref):
    """The flagship loss configuration — disentangled corner losses with
    chamfer pose, joint chamfer loss, uncertainty scaling and inverse-z
    weighting — vs the reference's own `if self.training:` loss block
    (roi_heads.py:551-792) executed on identical decoded predictions."""
    import dataclasses

    from ovmono3d_tpu.config import CubeHeadConfig
    from ovmono3d_tpu.models.rcnn3d import cube_losses

    flags = dict(
        disentangled_loss=True, chamfer_pose=True, dims_priors_enabled=False,
        allocentric_pose=True, z_type="direct", inverse_z_weight=True,
        use_confidence=0.5, virtual_depth=True, **_LOSS_WEIGHT_FLAGS,
    )
    torch_ns, ours_inputs = _cube_loss_data(np.random.RandomState(7), 24)
    ref_losses = _run_reference_cube_losses(ref, flags, torch_ns)

    cfg = dataclasses.replace(
        CubeHeadConfig(), disentangled_loss=True, chamfer_pose=True,
        inverse_z_weight=True, use_confidence=0.5, **_LOSS_WEIGHT_FLAGS,
    )
    _compare_cube_losses(ref_losses, cube_losses(cfg, **ours_inputs))


@pytest.mark.parametrize("z_type", ["direct", "sigmoid", "log", "clusters"])
def test_cube_losses_entangled_match_reference(ref, z_type):
    """The non-disentangled loss variants (roi_heads.py:630-673): delta-space
    xy, log-space dims, `1 - so3_relative_angle` allocentric pose, the four
    z_type targets, and the l1 joint loss — vs the reference's own block."""
    import dataclasses

    from ovmono3d_tpu.config import CubeHeadConfig
    from ovmono3d_tpu.models.rcnn3d import cube_losses

    flags = dict(
        disentangled_loss=False, chamfer_pose=True, dims_priors_enabled=False,
        allocentric_pose=True, z_type=z_type, inverse_z_weight=False,
        use_confidence=1.0, virtual_depth=True, **_LOSS_WEIGHT_FLAGS,
    )
    torch_ns, ours_inputs = _cube_loss_data(
        np.random.RandomState(13), 24, z_type=z_type
    )
    ref_losses = _run_reference_cube_losses(ref, flags, torch_ns)

    cfg = dataclasses.replace(
        CubeHeadConfig(), disentangled_loss=False, chamfer_pose=True,
        allocentric_pose=True, z_type=z_type, use_confidence=1.0,
        **_LOSS_WEIGHT_FLAGS,
    )
    _compare_cube_losses(ref_losses, cube_losses(cfg, **ours_inputs))


def test_cube_losses_entangled_priors_match_reference(ref):
    """dims_priors_enabled=True entangled dims loss: the reference trains
    dims_norm toward PRIOR-NORMALIZED log(gt/prior_dims)
    (roi_heads.py:644-647 cube_dims_gt_normspace) — vs our cube_losses fed
    the same per-sample prior means through dec['dims_prior_mean']."""
    import dataclasses

    from ovmono3d_tpu.config import CubeHeadConfig
    from ovmono3d_tpu.models.rcnn3d import cube_losses

    flags = dict(
        disentangled_loss=False, chamfer_pose=True, dims_priors_enabled=True,
        allocentric_pose=True, z_type="direct", inverse_z_weight=False,
        use_confidence=1.0, virtual_depth=True, **_LOSS_WEIGHT_FLAGS,
    )
    rng = np.random.RandomState(21)
    torch_ns, ours_inputs = _cube_loss_data(rng, 24)
    prior_mean = rng.uniform(0.3, 2.5, (24, 3)).astype(np.float32)
    torch_ns["prior_dims"] = torch.from_numpy(prior_mean)
    ours_inputs["dec"]["dims_prior_mean"] = jnp.asarray(prior_mean)
    ref_losses = _run_reference_cube_losses(ref, flags, torch_ns)

    cfg = dataclasses.replace(
        CubeHeadConfig(), disentangled_loss=False, chamfer_pose=True,
        allocentric_pose=True, z_type="direct", use_confidence=1.0,
        dims_priors_enabled=True, **_LOSS_WEIGHT_FLAGS,
    )
    _compare_cube_losses(ref_losses, cube_losses(cfg, **ours_inputs))


# ---------------------------------------------------------------------------
# Fast R-CNN inference vs the reference's own fast_rcnn.py
# ---------------------------------------------------------------------------

class _RefBoxes:
    """detectron2.structures.Boxes surface used by
    fast_rcnn_inference_single_image: .tensor, .clip((h, w))."""

    def __init__(self, tensor):
        self.tensor = tensor

    def clip(self, box_size):
        h, w = box_size
        self.tensor[:, 0].clamp_(min=0, max=w)
        self.tensor[:, 1].clamp_(min=0, max=h)
        self.tensor[:, 2].clamp_(min=0, max=w)
        self.tensor[:, 3].clamp_(min=0, max=h)


class _RefInstances:
    """detectron2.structures.Instances: attribute bag."""

    def __init__(self, image_size):
        self.image_size = image_size


def _np_nms(boxes, scores, thresh):
    """torchvision.ops.nms semantics: greedy by descending score, suppress
    IoU > thresh. Returns kept indices in descending-score order."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        b = boxes[i]
        xx1 = np.maximum(b[0], boxes[order, 0])
        yy1 = np.maximum(b[1], boxes[order, 1])
        xx2 = np.minimum(b[2], boxes[order, 2])
        yy2 = np.minimum(b[3], boxes[order, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        a = (b[2] - b[0]) * (b[3] - b[1])
        areas = (boxes[order, 2] - boxes[order, 0]) * (
            boxes[order, 3] - boxes[order, 1]
        )
        iou = inter / np.maximum(a + areas - inter, 1e-12)
        suppressed[order[iou > thresh]] = True
        suppressed[i] = True  # self (already kept)
    return np.asarray(keep, np.int64)


def _torch_batched_nms(boxes, scores, idxs, iou_threshold):
    """detectron2.layers.batched_nms semantics via the class-offset trick."""
    if boxes.numel() == 0:
        return torch.zeros((0,), dtype=torch.int64)
    max_coord = float(boxes.max())
    offsets = idxs.to(boxes.dtype) * (max_coord + 1.0)
    shifted = boxes + offsets[:, None]
    keep = _np_nms(shifted.numpy(), scores.numpy(), iou_threshold)
    return torch.from_numpy(keep)


def test_fast_rcnn_inference_matches_reference():
    """fast_rcnn_inference_single vs the reference's own
    fast_rcnn_inference_single_image (fast_rcnn.py:57-116) executed on
    identical per-class boxes and softmax scores: background-column drop,
    image clipping, strict score threshold, per-class NMS, post-NMS topk,
    and the (boxes, scores, classes) of every kept detection in order."""
    ref_path = Path(
        "/root/reference/cubercnn/modeling/roi_heads/fast_rcnn.py"
    )
    if not ref_path.exists():
        pytest.skip("reference source not present")
    import typing

    tree = ast.parse(ref_path.read_text())
    body = [n for n in tree.body
            if isinstance(n, ast.FunctionDef)
            and n.name == "fast_rcnn_inference_single_image"]
    assert len(body) == 1
    ns = {
        "torch": torch, "np": np, "Boxes": _RefBoxes,
        "Instances": _RefInstances, "batched_nms": _torch_batched_nms,
        "Tuple": typing.Tuple, "List": typing.List,
    }
    exec(compile(ast.Module(body=body, type_ignores=[]), str(ref_path),
                 "exec"), ns)

    rng = np.random.RandomState(21)
    N, C, H, W, topk = 60, 9, 480, 640, 16
    score_thresh, nms_thresh = 0.05, 0.5
    # clustered boxes (so NMS actually suppresses), some crossing the border
    centers = rng.uniform(-20, 680, (N, 1, 2)) + rng.randn(N, C, 2) * 10
    sizes = rng.uniform(20, 160, (N, C, 2))
    boxes = np.concatenate(
        [centers - sizes / 2, centers + sizes / 2], -1
    ).astype(np.float32)
    # sparse peaky scores: a valid set bigger than topk but far under the
    # candidate cap, plus sub-threshold mass everywhere
    raw = rng.rand(N, C) ** 6
    scores = (raw / raw.sum(1, keepdims=True)).astype(np.float32)
    bg = np.clip(1.0 - scores.sum(1, keepdims=True), 0, None)

    inst, kept_prop = ns["fast_rcnn_inference_single_image"](
        torch.from_numpy(boxes.reshape(N, C * 4).copy()),
        torch.from_numpy(np.concatenate([scores, bg], 1)),
        (H, W), score_thresh, nms_thresh, topk,
    )
    want_boxes = inst.pred_boxes.tensor.numpy()
    want_scores = inst.scores.numpy()
    want_classes = inst.pred_classes.numpy()
    assert topk >= len(want_scores) > 4  # non-vacuous, exercises NMS + topk

    import jax

    from ovmono3d_tpu.models.rcnn3d import fast_rcnn_inference_single

    got = jax.jit(
        fast_rcnn_inference_single,
        static_argnames=("score_thresh", "nms_thresh", "topk"),
    )(
        jnp.asarray(boxes), jnp.asarray(scores),
        jnp.ones((N,), bool), jnp.asarray([H, W], jnp.int32),
        score_thresh=score_thresh, nms_thresh=nms_thresh, topk=topk,
    )
    g_boxes, g_scores, g_classes, g_valid = (
        np.asarray(got[0]), np.asarray(got[1]), np.asarray(got[2]),
        np.asarray(got[3]),
    )
    nk = int(g_valid.sum())
    assert g_valid[:nk].all()  # valid entries are the score-ordered prefix
    assert nk == len(want_scores)
    np.testing.assert_allclose(g_scores[:nk], want_scores, rtol=1e-6)
    np.testing.assert_array_equal(g_classes[:nk], want_classes)
    np.testing.assert_allclose(g_boxes[:nk], want_boxes, rtol=1e-5,
                               atol=1e-4)


# ---------------------------------------------------------------------------
# GDINO phrase-logit pooling vs the reference's own roi_heads_gdino.py
# ---------------------------------------------------------------------------

def test_gdino_phrase_logits_match_reference():
    """postprocess_grounding's span pooling vs the reference's own
    get_phrase_logits_from_token_logits (roi_heads_gdino.py:273-294)
    executed on identical sigmoid token logits and the SAME WordPiece
    tokenization: per-phrase token-span sum, then max/argmax over phrases
    (get_grounding_output:192-198)."""
    ref_path = Path(
        "/root/reference/cubercnn/modeling/roi_heads/roi_heads_gdino.py"
    )
    if not ref_path.exists():
        pytest.skip("reference source not present")
    import typing

    tree = ast.parse(ref_path.read_text())
    body = [n for n in tree.body
            if isinstance(n, ast.FunctionDef)
            and n.name == "get_phrase_logits_from_token_logits"]
    assert len(body) == 1
    ns = {
        "torch": torch, "Dict": typing.Dict, "List": typing.List,
        "AutoTokenizer": object,
    }
    exec(compile(ast.Module(body=body, type_ignores=[]), str(ref_path),
                 "exec"), ns)

    from ovmono3d_tpu.models.gdino.inference import build_text_inputs
    from ovmono3d_tpu.models.gdino.tokenizer import (
        BertTokenizer,
        build_caption,
        phrase_token_spans,
    )

    vocab = {
        "[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, ".": 4,
        "chair": 5, "cup": 6, "cereal": 7, "box": 8, "lap": 9,
        "##top": 10, "shoes": 11, "coffee": 12, "maker": 13,
    }
    tok = BertTokenizer(vocab)
    cats = ["chair", "laptop", "cereal box", "coffee maker", "cup"]

    class _TokShim:
        """The two call shapes get_phrase_logits_from_token_logits uses."""

        def __call__(self, text, add_special_tokens=True):
            if isinstance(text, list):
                assert not add_special_tokens
                return {"input_ids": [tok.tokenize_ids(t) for t in text]}
            ids, _ = phrase_token_spans(tok, cats)
            assert text == build_caption(cats)
            return {"input_ids": ids}

    rng = np.random.RandomState(5)
    Q = 40
    probs = rng.rand(Q, 256).astype(np.float32)

    want = ns["get_phrase_logits_from_token_logits"](
        torch.from_numpy(probs), _TokShim()(build_caption(cats)),
        _TokShim(), cats,
    )
    want_scores, want_classes = want.max(dim=1)

    text = build_text_inputs(tok, cats, max_len=256, max_phrases=len(cats))
    got = np.asarray(probs @ text["span_matrix"].T)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(got.max(1), want_scores.numpy(), rtol=1e-6)
    np.testing.assert_array_equal(got.argmax(1), want_classes.numpy())


# ---------------------------------------------------------------------------
# Cube-head decode vs the reference's own decode subtree
# ---------------------------------------------------------------------------

def _load_cube_decode_segment():
    """Extract the decode statements of ROIHeads3D._forward_cube — from
    `fg_inds = torch.arange(n)` (just after the cube-head forward,
    roi_heads.py:433) up to the training-loss `if` (roi_heads.py:551):
    cluster-bin assignment from 2D scales, per-class gathers, center-delta
    application, dims-prior decode (exp/sigmoid), allocentric->egocentric
    pose, the four z_type decodes, and virtual-depth scaling."""
    path = Path("/root/reference/cubercnn/modeling/roi_heads/roi_heads.py")
    if not path.exists():
        pytest.skip("reference source not present")
    tree = ast.parse(path.read_text())
    cls = next(
        n for n in tree.body
        if isinstance(n, ast.ClassDef) and n.name == "ROIHeads3D"
    )
    fwd = next(
        m for m in cls.body
        if isinstance(m, ast.FunctionDef) and m.name == "_forward_cube"
    )
    start = next(
        i for i, s in enumerate(fwd.body)
        if isinstance(s, ast.Assign)
        and isinstance(s.targets[0], ast.Name)
        and s.targets[0].id == "fg_inds"
    )
    end = next(
        i for i, s in enumerate(fwd.body)
        if i > start
        and isinstance(s, ast.If)
        and isinstance(s.test, ast.Attribute)
        and s.test.attr == "training"
    )
    return compile(
        ast.Module(body=fwd.body[start:end], type_ignores=[]), str(path),
        "exec",
    )


@pytest.mark.parametrize(
    "priors_on,dims_func,z_type",
    [
        (True, "exp", "clusters"),
        (True, "sigmoid", "clusters"),
        (False, "exp", "log"),
        (False, "exp", "direct"),
        (False, "exp", "sigmoid"),
    ],
)
def test_cube_decode_matches_reference(ref, priors_on, dims_func, z_type):
    """decode_cube vs the reference's own decode subtree executed on
    identical raw head outputs, priors and proposals."""
    import dataclasses
    import types

    from ovmono3d_tpu.config import CubeHeadConfig
    from ovmono3d_tpu.models.rcnn3d import decode_cube
    from scipy.spatial.transform import Rotation

    seg = _load_cube_decode_segment()
    rng = np.random.RandomState(3 + priors_on + len(z_type))
    N, C, B = 20, 7, (4 if z_type == "clusters" else 1)
    S = 512  # network-input height

    classes = rng.randint(0, C, N)
    ratio = rng.uniform(1.0, 3.0, N).astype(np.float32)
    fy = rng.uniform(400, 1200, N).astype(np.float32)
    K_scaled = np.zeros((N, 3, 3), np.float32)
    K_scaled[:, 0, 0] = fy / ratio
    K_scaled[:, 1, 1] = fy / ratio
    K_scaled[:, 0, 2] = rng.uniform(200, 320, N) / ratio
    K_scaled[:, 1, 2] = rng.uniform(150, 260, N) / ratio
    K_scaled[:, 2, 2] = 1.0

    src = np.zeros((N, 4), np.float32)
    src[:, 0] = rng.uniform(0, 300, N)
    src[:, 1] = rng.uniform(0, 200, N)
    src[:, 2] = src[:, 0] + rng.uniform(20, 200, N)
    src[:, 3] = src[:, 1] + rng.uniform(20, 200, N)

    # raw head outputs, reference layout
    if priors_on:
        deltas = (rng.randn(N, C, 2) * 0.3).astype(np.float32)
        dims_n = (rng.randn(N, C, 3) * 0.4).astype(np.float32)
        pose = Rotation.random(N * C, random_state=rng).as_matrix().astype(
            np.float32).reshape(N, C, 3, 3)
        z_raw = (rng.randn(N, B, C, 1) * 0.7).astype(np.float32)
        uncert = rng.uniform(0.01, 3.0, (N, C)).astype(np.float32)
    else:
        deltas = (rng.randn(N, 2) * 0.3).astype(np.float32)
        dims_n = (rng.randn(N, 3) * 0.4).astype(np.float32)
        pose = Rotation.random(N, random_state=rng).as_matrix().astype(
            np.float32)
        z_raw = (rng.randn(N, 1) * 0.7 + (2.0 if z_type == "log" else 8.0)
                 ).astype(np.float32)
        uncert = rng.uniform(0.01, 3.0, (N, 1)).astype(np.float32)

    pz_scales = np.sort(rng.uniform(30, 600, (C, B)).astype(np.float32), 1)
    pz_stats = np.stack(
        [rng.uniform(2, 25, (C, B)), rng.uniform(0.5, 5, (C, B))], -1
    ).astype(np.float32)
    pdims = np.stack(
        [rng.uniform(0.3, 3, (C, 3)), rng.uniform(0.05, 0.8, (C, 3))], 1
    ).astype(np.float32)

    t = torch.from_numpy
    src_w, src_h = src[:, 2] - src[:, 0], src[:, 3] - src[:, 1]
    self_obj = types.SimpleNamespace(
        cluster_bins=B, dims_priors_enabled=priors_on,
        dims_priors_func=dims_func, use_confidence=1.0,
        allocentric_pose=True, z_type=z_type, virtual_depth=True,
        priors_z_scales=t(pz_scales), priors_z_stats=t(pz_stats),
        priors_dims_per_cat=t(pdims[None]),
    )
    virtual_focal = 512.0
    v2r_ref = ref["compute_virtual_scale_from_focal_spaces"](
        t(fy), t(np.float32(S) * ratio), virtual_focal, t(np.full(N, S, np.float32))
    )
    util_ns = types.SimpleNamespace(
        scaled_sigmoid=ref["scaled_sigmoid"],
        R_from_allocentric=ref["R_from_allocentric"],
    )
    ns = {
        "self": self_obj, "torch": torch, "np": np, "util": util_ns,
        "n": N, "box_classes": t(classes.astype(np.int64)),
        "cube_2d_deltas": t(deltas), "cube_z": t(z_raw),
        "cube_dims": t(dims_n), "cube_pose": t(pose),
        "cube_uncert": t(uncert),
        "Ks_scaled_per_box": t(K_scaled),
        "virtual_to_real": v2r_ref,
        "src_ctr_x": t(src[:, 0] + 0.5 * src_w),
        "src_ctr_y": t(src[:, 1] + 0.5 * src_h),
        "src_widths": t(src_w), "src_heights": t(src_h),
        "src_scales": t(np.sqrt(src_w**2 + src_h**2)),
    }
    exec(seg, ns)

    cfg = dataclasses.replace(
        CubeHeadConfig(), cluster_bins=B, dims_priors_enabled=priors_on,
        dims_priors_func=dims_func, z_type=z_type, allocentric_pose=True,
        virtual_depth=True, virtual_focal=virtual_focal, use_confidence=1.0,
    )
    outputs = {
        "deltas_2d": jnp.asarray(deltas),
        "dims": jnp.asarray(dims_n),
        "pose": jnp.asarray(pose),
        "uncert": jnp.asarray(uncert.reshape(N, C) if priors_on
                              else uncert.reshape(N)),
        "z": jnp.asarray(z_raw.reshape(N, B, C) if priors_on
                         else z_raw.reshape(N, 1)),
    }
    dec = decode_cube(
        cfg, outputs, jnp.asarray(src), jnp.asarray(classes),
        jnp.asarray(K_scaled), jnp.asarray(fy),
        jnp.full((N,), S, jnp.float32), jnp.asarray(ratio),
        priors_dims=jnp.asarray(pdims) if priors_on else None,
        priors_z_scales=jnp.asarray(pz_scales),
        priors_z_stats=jnp.asarray(pz_stats) if z_type == "clusters"
        else None,
    )

    pairs = {
        "x": "cube_x", "y": "cube_y", "z": "cube_z", "dims": "cube_dims",
        "pose": "cube_pose", "uncert": "cube_uncert",
        "z_norm": "cube_z_norm", "pose_allocentric":
        "cube_pose_allocentric",
    }
    np.testing.assert_allclose(
        np.asarray(dec["virtual_to_real"]), v2r_ref.numpy(),
        rtol=2e-5, err_msg="virtual_to_real",
    )
    for ours_k, ref_k in pairs.items():
        if ref_k == "cube_z_norm" and z_type == "direct":
            continue  # the reference only defines it for the bounded types
        want = ns[ref_k].detach().numpy().reshape(
            np.asarray(dec[ours_k]).shape
        )
        np.testing.assert_allclose(
            np.asarray(dec[ours_k]), want, rtol=3e-4, atol=1e-5,
            err_msg=ours_k,
        )


# ---------------------------------------------------------------------------
# Fast R-CNN box-head losses vs the reference's own FastRCNNOutputs.losses
# ---------------------------------------------------------------------------

def _load_fast_rcnn_loss_methods():
    """Extract FastRCNNOutputs.losses + .box_reg_loss (fast_rcnn.py:145-260)
    as free functions taking `self` explicitly."""
    path = Path(
        "/root/reference/cubercnn/modeling/roi_heads/fast_rcnn.py"
    )
    if not path.exists():
        pytest.skip("reference source not present")
    tree = ast.parse(path.read_text())
    cls = next(
        n for n in tree.body
        if isinstance(n, ast.ClassDef) and n.name == "FastRCNNOutputs"
    )
    fns = [m for m in cls.body
           if isinstance(m, ast.FunctionDef)
           and m.name in ("losses", "box_reg_loss")]
    assert len(fns) == 2
    import torch.nn.functional as F

    def smooth_l1_loss(input, target, beta, reduction="none"):
        # fvcore.nn.smooth_l1_loss semantics (beta==0 -> pure L1).
        if beta < 1e-5:
            loss = torch.abs(input - target)
        else:
            n = torch.abs(input - target)
            loss = torch.where(
                n < beta, 0.5 * n**2 / beta, n - 0.5 * beta
            )
        if reduction == "sum":
            return loss.sum()
        return loss

    ns = {
        "torch": torch,
        "cat": torch.cat,
        "cross_entropy": F.cross_entropy,
        "smooth_l1_loss": smooth_l1_loss,
        "giou_loss": None,
        "nonzero_tuple": lambda t: torch.nonzero(t, as_tuple=True),
        "_log_classification_stats": lambda *a, **k: None,
    }
    exec(compile(ast.Module(body=fns, type_ignores=[]), str(path),
                 "exec"), ns)
    return ns


@pytest.mark.parametrize("beta,cls_agnostic", [(0.0, False), (0.5, False),
                                               (0.0, True)])
def test_box_head_losses_match_reference(beta, cls_agnostic):
    """box_head_losses vs the reference's own losses()/box_reg_loss()
    executed on identical logits/deltas/proposals (Box2BoxTransform
    get_deltas shimmed with the standard detectron2 formula)."""
    import dataclasses
    import types

    from ovmono3d_tpu.config import ROIBoxConfig
    from ovmono3d_tpu.models.rcnn3d import box_head_losses

    ns = _load_fast_rcnn_loss_methods()
    rng = np.random.RandomState(11)
    N, C = 96, 9  # proposals, foreground classes (bg index = C)
    W = (10.0, 10.0, 5.0, 5.0)

    classes = rng.randint(0, C + 1, N).astype(np.int64)
    scores = (rng.randn(N, C + 1) * 2).astype(np.float32)
    deltas = (rng.randn(N, 4 if cls_agnostic else C * 4) * 0.5).astype(
        np.float32
    )
    boxes = np.zeros((N, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, 300, N)
    boxes[:, 1] = rng.uniform(0, 200, N)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(10, 150, N)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(10, 150, N)
    gt_boxes = boxes + rng.uniform(-8, 8, (N, 4)).astype(np.float32)
    gt_boxes[:, 2] = np.maximum(gt_boxes[:, 2], gt_boxes[:, 0] + 5)
    gt_boxes[:, 3] = np.maximum(gt_boxes[:, 3], gt_boxes[:, 1] + 5)

    class _Box2Box:
        def get_deltas(self, src, tgt):
            # detectron2 Box2BoxTransform.get_deltas with weights W.
            sw = src[:, 2] - src[:, 0]
            sh = src[:, 3] - src[:, 1]
            scx = src[:, 0] + 0.5 * sw
            scy = src[:, 1] + 0.5 * sh
            tw = tgt[:, 2] - tgt[:, 0]
            th = tgt[:, 3] - tgt[:, 1]
            tcx = tgt[:, 0] + 0.5 * tw
            tcy = tgt[:, 1] + 0.5 * th
            return torch.stack(
                [W[0] * (tcx - scx) / sw, W[1] * (tcy - scy) / sh,
                 W[2] * torch.log(tw / sw), W[3] * torch.log(th / sh)],
                dim=1,
            )

    class _Proposals:
        def __init__(self):
            self.gt_classes = torch.from_numpy(classes)
            self.proposal_boxes = types.SimpleNamespace(
                tensor=torch.from_numpy(boxes)
            )
            self.gt_boxes = types.SimpleNamespace(
                tensor=torch.from_numpy(gt_boxes)
            )

        def has(self, key):
            return True

    self_obj = types.SimpleNamespace(
        num_classes=C, box_reg_loss_type="smooth_l1",
        smooth_l1_beta=beta, loss_weight={},
        box2box_transform=_Box2Box(),
        box_reg_loss=None,
    )
    self_obj.box_reg_loss = types.MethodType(ns["box_reg_loss"], self_obj)
    want = ns["losses"](
        self_obj,
        (torch.from_numpy(scores), torch.from_numpy(deltas)),
        [_Proposals()],
    )

    cfg = dataclasses.replace(
        ROIBoxConfig(), smooth_l1_beta=beta,
        cls_agnostic_bbox_reg=cls_agnostic, bbox_reg_weights=W,
    )
    got_cls, got_reg = box_head_losses(
        cfg, C, jnp.asarray(scores), jnp.asarray(deltas),
        jnp.asarray(classes.astype(np.int32)),
        jnp.ones(N, bool), jnp.asarray(classes < C),
        jnp.asarray(boxes), jnp.asarray(gt_boxes),
    )
    np.testing.assert_allclose(
        float(got_cls), float(want["BoxHead/loss_cls"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(got_reg), float(want["BoxHead/loss_box_reg"]), rtol=1e-5
    )


# ---------------------------------------------------------------------------
# Dataloader weighting vs the reference's own build.py
# ---------------------------------------------------------------------------

_REF_BUILD = Path("/root/reference/cubercnn/data/build.py")


def _synthetic_records(rng, n_img=400, n_cat=12, n_datasets=3,
                       sources=None, p=None):
    if sources is None:
        sources = ["KITTI", "SUNRGBD", "ARKitScenes"][:n_datasets]
    # skewed dataset sizes + skewed category frequencies
    ds_of_img = rng.choice(n_datasets, n_img, p=p or [0.65, 0.25, 0.10])
    records = []
    for i in range(n_img):
        n_ann = rng.randint(0, 6)
        cats = rng.zipf(1.6, n_ann) % n_cat  # rare tail categories
        anns = [{"category_id": int(c) if rng.rand() > 0.05 else -1}
                for c in cats]
        records.append(
            {"dataset_id": int(ds_of_img[i]), "annotations": anns}
        )
    return records, sources


def test_repeat_factors_match_reference():
    """repeat_factors_from_category_frequency vs the reference's own
    function (build.py:166-211) on identical records."""
    if not _REF_BUILD.exists():
        pytest.skip("reference source not present")
    from collections import defaultdict

    from ovmono3d_tpu.data.build import (
        repeat_factors_from_category_frequency,
    )

    tree = ast.parse(_REF_BUILD.read_text())
    fn = next(n for n in tree.body if isinstance(n, ast.FunctionDef)
              and n.name == "repeat_factors_from_category_frequency")
    ns = {"torch": torch, "math": math, "defaultdict": defaultdict}
    exec(compile(ast.Module(body=[fn], type_ignores=[]), str(_REF_BUILD),
                 "exec"), ns)

    rng = np.random.RandomState(7)
    records, _ = _synthetic_records(rng)
    for thresh in (0.1, 0.5, 1.0):
        want = ns["repeat_factors_from_category_frequency"](
            records, thresh
        ).numpy()
        got = repeat_factors_from_category_frequency(records, thresh)
        np.testing.assert_allclose(got, want, rtol=1e-6, err_msg=str(thresh))


def test_dataset_balance_weights_match_reference():
    """dataset_balance_weights vs the reference's BALANCE_DATASETS block
    (build.py:105-128) ast-extracted from _train_loader_from_config and
    executed on identical records."""
    if not _REF_BUILD.exists():
        pytest.skip("reference source not present")
    from ovmono3d_tpu.data.build import dataset_balance_weights

    tree = ast.parse(_REF_BUILD.read_text())
    fn = next(n for n in tree.body if isinstance(n, ast.FunctionDef)
              and n.name == "_train_loader_from_config")
    blk = next(
        s for s in ast.walk(fn)
        if isinstance(s, ast.If) and isinstance(s.test, ast.Name)
        and s.test.id == "balance_datasets"
    )
    seg = compile(ast.Module(body=blk.body, type_ignores=[]),
                  str(_REF_BUILD), "exec")

    rng = np.random.RandomState(8)
    # Two dataset ids share the KITTI source: the reference pools splits
    # of one source into ONE balancing group (dataset_id_to_src,
    # train_net.py:534-539) — ids 0 and 1 must be counted together.
    records, sources = _synthetic_records(
        rng, n_datasets=4,
        sources=["KITTI", "KITTI", "SUNRGBD", "ARKitScenes"],
        p=[0.45, 0.20, 0.25, 0.10],
    )
    ns = {
        "torch": torch, "np": np,
        "dataset_id_to_src": {i: s for i, s in enumerate(sources)},
        "dataset": records,
    }
    exec(seg, ns)
    want = ns["weights_per_img"].numpy()

    got = dataset_balance_weights(
        [sources[r["dataset_id"]] for r in records]
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # single source -> unweighted (build.py:113-115)
    one = dataset_balance_weights([0] * 10)
    np.testing.assert_array_equal(one, np.ones(10))
