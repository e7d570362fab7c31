"""Multi-dataset evaluation helper + disentangled NHD tests."""
import jax.numpy as jnp
import numpy as np

from ovmono3d_tpu.evaluation.helper import (
    Omni3DEvaluationHelper,
    disentangled_nhd,
)
from ovmono3d_tpu.utils.geometry import cuboid_corners


def _corners(x, y, z, w=1.0, h=1.0, l=1.0):
    return np.asarray(
        cuboid_corners(jnp.array([x, y, z, w, h, l], jnp.float32))
    )


def _image(boxes3d, classes, scores=None):
    corners = np.stack([_corners(*b) for b in boxes3d])
    d = {
        "classes": np.asarray(classes, np.int64),
        "boxes2d": np.tile([0, 0, 10, 10], (len(boxes3d), 1)).astype(float),
        "corners3d": corners,
        "depths": np.array([b[2] for b in boxes3d], float),
        "center": np.array([b[:3] for b in boxes3d], float),
        "dims": np.array([[1.0, 1.0, 1.0]] * len(boxes3d)),
        "pose": np.tile(np.eye(3), (len(boxes3d), 1, 1)),
    }
    if scores is not None:
        d["scores"] = np.asarray(scores, float)
    return d


def test_multi_dataset_aggregation():
    helper = Omni3DEvaluationHelper(2, ["a", "b"])
    # dataset 1: perfect on class 0
    gt = _image([(0, 0, 5)], [0])
    pred = _image([(0, 0, 5)], [0], [0.9])
    helper.add_image("ds1", gt, pred)
    # dataset 2: miss on class 0
    gt2 = _image([(3, 0, 5)], [0])
    pred2 = _image([(30, 0, 5)], [0], [0.8])
    helper.add_image("ds2", gt2, pred2)

    res = helper.summarize_all()
    # per-dataset: ds1 perfect, ds2 zero.
    np.testing.assert_allclose(res["datasets"]["ds1"]["AP3D"], 100, atol=1e-5)
    np.testing.assert_allclose(res["datasets"]["ds2"]["AP3D"], 0, atol=1e-5)
    # merged: 1 TP + 1 FP + 2 GT. At recall 0.5 precision depends on score
    # order: the FP has LOWER score (0.8) so precision stays 1 up to r=0.5.
    np.testing.assert_allclose(
        res["overall"]["AP3D"], 100 * 51 / 101, atol=0.2
    )


def test_disentangled_nhd_components():
    gt = {
        "center": np.array([[0.0, 0, 5]]),
        "dims": np.array([[1.0, 1.0, 1.0]]),
        "pose": np.eye(3)[None],
    }
    # Perfect prediction -> all zeros.
    dis = disentangled_nhd(gt, gt)
    for k, v in dis.items():
        np.testing.assert_allclose(v, 0.0, atol=1e-6, err_msg=k)

    # Only depth wrong: z-NHD > 0, others 0.
    pred = {
        "center": np.array([[0.0, 0, 6.0]]),
        "dims": gt["dims"],
        "pose": gt["pose"],
    }
    dis = disentangled_nhd(pred, gt)
    assert dis["z"][0] > 0.3
    np.testing.assert_allclose(dis["xy"], 0.0, atol=1e-6)
    np.testing.assert_allclose(dis["dims"], 0.0, atol=1e-6)
    np.testing.assert_allclose(dis["pose"], 0.0, atol=1e-6)

    # Only dims wrong.
    pred = {
        "center": gt["center"],
        "dims": np.array([[2.0, 1.0, 1.0]]),
        "pose": gt["pose"],
    }
    dis = disentangled_nhd(pred, gt)
    assert dis["dims"][0] > 0.1
    np.testing.assert_allclose(dis["z"], 0.0, atol=1e-6)


def test_novel_easy_hard_split():
    names = ["board", "bag"]  # board = easy, bag = hard
    helper = Omni3DEvaluationHelper(
        2, names, novel_categories={"board", "bag"}
    )
    gt = _image([(0, 0, 5), (3, 0, 5)], [0, 1])
    # board perfect, bag missed.
    pred = _image([(0, 0, 5)], [0], [0.9])
    helper.add_image("ds", gt, pred)
    res = helper.summarize_all()
    np.testing.assert_allclose(res["novel_easy_AP3D"], 100.0, atol=1e-5)
    np.testing.assert_allclose(res["novel_hard_AP3D"], 0.0, atol=1e-5)


def test_novel_easy_excludes_base_categories():
    """A BASE category whose name happens to be in the fixed easy-novel
    list ('painting') must not leak into novel_easy_AP3D (the reference's
    split runs over the novel set only, omni3d_evaluation.py:602-613)."""
    names = ["painting", "board"]  # painting = BASE here, board = novel
    helper = Omni3DEvaluationHelper(
        2, names, novel_categories={"board"}
    )
    gt = _image([(0, 0, 5), (3, 0, 5)], [0, 1])
    # painting perfect (AP 100), board missed (AP 0).
    pred = _image([(0, 0, 5)], [0], [0.9])
    helper.add_image("ds", gt, pred)
    res = helper.summarize_all()
    # board (the only novel easy category) was missed -> easy AP must be 0,
    # NOT inflated by the base 'painting' at 100.
    np.testing.assert_allclose(res["novel_easy_AP3D"], 0.0, atol=1e-5)
    assert "novel_hard_AP3D" not in res  # no hard novel categories present


def test_omni3d_rollups_require_full_category_set():
    """AP3D_omni_in/out are reported only when EVERY category of the set
    was evaluated (reference: len(set - categories) == 0 else NaN,
    omni3d_evaluation.py:553/567) — a partial mean is not comparable."""
    helper = Omni3DEvaluationHelper(2, ["car", "truck"])  # omni3d_out subset
    gt = _image([(0, 0, 5)], [0])
    helper.add_image("ds", gt, _image([(0, 0, 5)], [0], [0.9]))
    res = helper.summarize_all()
    assert "AP3D_omni_out" not in res
    assert "AP3D_omni_in" not in res
