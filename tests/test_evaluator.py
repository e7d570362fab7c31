"""Evaluator tests with analytically known AP values."""
import numpy as np

from ovmono3d_tpu.evaluation.omni3d_eval import (
    Omni3DEvaluator,
    hungarian_corner_distance,
)
from ovmono3d_tpu.utils.geometry import cuboid_corners
import jax.numpy as jnp


def _corners(x, y, z, w=1.0, h=1.0, l=1.0):
    return np.asarray(
        cuboid_corners(jnp.array([x, y, z, w, h, l], jnp.float32))
    )


def _gt(boxes3d):
    corners = np.stack([_corners(*b) for b in boxes3d])
    return {
        "classes": np.zeros(len(boxes3d), np.int64),
        "boxes2d": np.tile([0, 0, 10, 10], (len(boxes3d), 1)).astype(float),
        "corners3d": corners,
        "depths": np.array([b[2] for b in boxes3d], float),
    }


def _pred(boxes3d, scores):
    corners = np.stack([_corners(*b) for b in boxes3d])
    return {
        "classes": np.zeros(len(boxes3d), np.int64),
        "scores": np.asarray(scores, float),
        "boxes2d": np.tile([0, 0, 10, 10], (len(boxes3d), 1)).astype(float),
        "corners3d": corners,
    }


def test_perfect_predictions_ap100():
    ev = Omni3DEvaluator(num_classes=1, mode="3D")
    gt = _gt([(0, 0, 5), (2, 0, 5)])
    ev.add_image(gt, _pred([(0, 0, 5), (2, 0, 5)], [0.9, 0.8]))
    res = ev.summarize()
    np.testing.assert_allclose(res["AP3D"], 100.0, atol=1e-6)
    np.testing.assert_allclose(res["AR3D"], 100.0, atol=1e-6)
    np.testing.assert_allclose(res["NHD"], 0.0, atol=1e-5)


def test_half_recall_ap():
    ev = Omni3DEvaluator(num_classes=1, mode="3D")
    gt = _gt([(0, 0, 5), (20, 0, 5)])
    ev.add_image(gt, _pred([(0, 0, 5)], [0.9]))  # second gt missed
    res = ev.summarize()
    # Precision 1.0 up to recall 0.5 -> 51 of 101 recall points.
    np.testing.assert_allclose(res["AP3D"], 100 * 51 / 101, atol=0.1)
    np.testing.assert_allclose(res["AR3D"], 50.0, atol=1e-6)


def test_false_positive_hurts():
    ev = Omni3DEvaluator(num_classes=1, mode="3D")
    gt = _gt([(0, 0, 5)])
    # One perfect TP + one far FP with lower score: AP stays 100 (FP after
    # full recall doesn't lower the envelope).
    ev.add_image(gt, _pred([(0, 0, 5), (50, 0, 5)], [0.9, 0.1]))
    res = ev.summarize()
    np.testing.assert_allclose(res["AP3D"], 100.0, atol=1e-6)

    # FP with HIGHER score halves precision at recall 1.
    ev2 = Omni3DEvaluator(num_classes=1, mode="3D")
    ev2.add_image(gt, _pred([(0, 0, 5), (50, 0, 5)], [0.1, 0.9]))
    res2 = ev2.summarize()
    np.testing.assert_allclose(res2["AP3D"], 50.0, atol=0.1)


def test_iou_threshold_sensitivity():
    ev = Omni3DEvaluator(num_classes=1, mode="3D")
    gt = _gt([(0, 0, 5)])
    # Offset by 0.5 of a unit cube: IoU = 1/3 -> matches thresholds <= 0.30.
    ev.add_image(gt, _pred([(0.5, 0, 5)], [0.9]))
    res = ev.summarize()
    # Thresholds 0.05..0.50; 6 of 10 (0.05..0.30) match.
    np.testing.assert_allclose(res["AP3D"], 100 * 6 / 10, atol=0.5)
    np.testing.assert_allclose(res["AP3D@25"], 100.0, atol=1e-5)
    np.testing.assert_allclose(res["AP3D@50"], 0.0, atol=1e-5)


def test_depth_bands():
    ev = Omni3DEvaluator(num_classes=1, mode="3D")
    gt = _gt([(0, 0, 5), (0, 0, 50)])  # near + far
    ev.add_image(gt, _pred([(0, 0, 5)], [0.9]))  # only near detected
    res = ev.summarize()
    np.testing.assert_allclose(res["AP3D-N"], 100.0, atol=1e-5)
    # In far band, the near GT is ignore and its detection matches nothing:
    # pure FP + one missed GT -> AP 0.
    np.testing.assert_allclose(res["AP3D-F"], 0.0, atol=1e-5)


def test_ignore_regions_dont_count():
    ev = Omni3DEvaluator(num_classes=1, mode="3D")
    gt = _gt([(0, 0, 5), (20, 0, 5)])
    gt["classes"] = np.array([0, -1])  # second is ignore region
    # Detection on the ignore region is neither TP nor FP.
    ev.add_image(gt, _pred([(0, 0, 5), (20, 0, 5)], [0.9, 0.8]))
    res = ev.summarize()
    np.testing.assert_allclose(res["AP3D"], 100.0, atol=1e-6)


def test_2d_mode():
    ev = Omni3DEvaluator(num_classes=2, mode="2D")
    gt = {
        "classes": np.array([0, 1]),
        "boxes2d": np.array([[0, 0, 10, 10], [20, 20, 40, 40]], float),
        "depths": np.array([5.0, 5.0]),
    }
    pred = {
        "classes": np.array([0, 1]),
        "scores": np.array([0.9, 0.8]),
        "boxes2d": np.array([[0, 0, 10, 10], [20, 20, 40, 40]], float),
    }
    ev.add_image(gt, pred)
    res = ev.summarize()
    np.testing.assert_allclose(res["AP2D"], 100.0, atol=1e-6)
    np.testing.assert_allclose(res["AP2D@50"], 100.0, atol=1e-6)


def test_hungarian_distance_permutation_invariant():
    c = _corners(0, 0, 5)
    perm = c[[1, 0, 3, 2, 5, 4, 7, 6]]
    d = hungarian_corner_distance(perm[None], c[None])
    np.testing.assert_allclose(d, 0.0, atol=1e-6)


def test_proximity_eval_ignores_far_detections():
    """eval_prox: detections whose 2D box is far from every GT 2D box are
    ignored, not FPs ("proximity of the ground truth 2D boxes",
    omni3d_evaluation.py:1483-84 — for non-exhaustive datasets)."""
    gt = _gt([(0, 0, 5)])
    # One perfect TP + one far high-scoring det whose 2D box is ALSO far.
    pred = _pred([(0, 0, 5), (50, 0, 5)], [0.5, 0.9])
    pred["boxes2d"] = np.array([[0, 0, 10, 10], [500, 0, 510, 10]], float)
    ev = Omni3DEvaluator(num_classes=1, mode="3D")
    ev.add_image(gt, pred)
    np.testing.assert_allclose(ev.summarize()["AP3D"], 50.0, atol=0.1)

    ev_prox = Omni3DEvaluator(num_classes=1, mode="3D", eval_prox=True)
    ev_prox.add_image(gt, pred)
    np.testing.assert_allclose(ev_prox.summarize()["AP3D"], 100.0, atol=1e-5)


def test_proximity_gate_is_2d_not_3d():
    """In 3D mode the proximity gate must use 2D-box IoU: a detection at
    the right 2D location but wrong depth (3D IoU ~ 0) is a REAL false
    positive — gating on 3D IoU would silently ignore nearly every
    unmatched detection and inflate AP3D."""
    gt = _gt([(0, 0, 5)])
    # Wrong-depth det shares the GT's 2D box (helper default [0,0,10,10]).
    pred = _pred([(0, 0, 5), (0, 0, 15)], [0.5, 0.9])
    ev_prox = Omni3DEvaluator(num_classes=1, mode="3D", eval_prox=True)
    ev_prox.add_image(gt, pred)
    # Higher-scoring wrong-depth det is an FP at every threshold -> AP 50.
    np.testing.assert_allclose(ev_prox.summarize()["AP3D"], 50.0, atol=0.1)


def _greedy_match_scalar(iou, gt_ignore, thresholds):
    """Direct transcription of pycocotools COCOeval.evaluateImg's matching
    loop (the semantics the reference inherits, omni3d_evaluation.py:1467):
    gts scanned ignores-last (gtind = argsort(_ignore, mergesort)), every
    matched gt consumed (iscrowd is always False in this protocol), and the
    `break` once a det holding a real match reaches the ignore section."""
    D, G = iou.shape
    T = len(thresholds)
    matched = -np.ones((T, D), np.int64)
    ignored = np.zeros((T, D), bool)
    gtind = np.argsort(np.asarray(gt_ignore, np.int8), kind="mergesort")
    for ti, thr in enumerate(thresholds):
        gtm = np.zeros(G, bool)   # indexed by sorted position
        for d in range(D):
            best = min(thr, 1 - 1e-10)
            m = -1  # sorted position of the current match
            for pos, g in enumerate(gtind):
                if gtm[pos]:
                    continue
                if m > -1 and not gt_ignore[gtind[m]] and gt_ignore[g]:
                    break
                if iou[d, g] < best:
                    continue
                best = iou[d, g]
                m = pos
            if m >= 0:
                gtm[m] = True
                matched[ti, d] = gtind[m]
                ignored[ti, d] = gt_ignore[gtind[m]]
    return matched, ignored


def test_greedy_match_parity_with_scalar_reference():
    from ovmono3d_tpu.evaluation.omni3d_eval import _greedy_match

    rng = np.random.RandomState(0)
    thresholds = np.round(np.arange(0.05, 0.501, 0.05), 2)
    for trial in range(200):
        D = rng.randint(0, 8)
        G = rng.randint(0, 8)
        # Quantized IoUs force frequent exact ties.
        iou = np.round(rng.rand(D, G), 1)
        gt_ignore = rng.rand(G) < 0.3
        m1, i1 = _greedy_match(iou, gt_ignore, thresholds)
        m2, i2 = _greedy_match_scalar(iou, gt_ignore, thresholds)
        np.testing.assert_array_equal(m1, m2, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(i1, i2, err_msg=f"trial {trial}")


def test_greedy_match_throughput():
    """10k-image-scale matching completes in seconds (VERDICT weak #6)."""
    import time

    from ovmono3d_tpu.evaluation.omni3d_eval import _greedy_match

    rng = np.random.RandomState(1)
    thresholds = np.round(np.arange(0.05, 0.501, 0.05), 2)
    t0 = time.time()
    for _ in range(2000):  # ~10k images x 4 bands / 2 modes, 20 dets each
        iou = rng.rand(20, 6)
        gt_ignore = rng.rand(6) < 0.2
        _greedy_match(iou, gt_ignore, thresholds)
    assert time.time() - t0 < 20.0


def test_matched_pair_metrics_shuffle_invariant():
    """Disentangled NHD computed on IoU-matched pairs: shuffling prediction
    order must not change it (VERDICT weak #7)."""
    boxes = [(0, 0, 5), (3, 0, 5), (0, 2, 8)]
    gt = _gt(boxes)
    gt["center"] = np.array([b[:3] for b in boxes], float)
    gt["dims"] = np.ones((3, 3))
    gt["pose"] = np.tile(np.eye(3), (3, 1, 1))

    # every pred within 3D IoU >= 0.5 of its GT (the reference's matched-pair
    # gate, omni3d_evaluation.py:2294-2296)
    pb = [(0.05, 0, 5.1), (3, 0.05, 5.1), (0, 2, 8.15)]
    results = []
    for order in ([0, 1, 2], [2, 0, 1]):
        pred = _pred([pb[i] for i in order], [0.9, 0.8, 0.7])
        pred["center"] = np.array([pb[i][:3] for i in order], float)
        pred["dims"] = np.ones((3, 3))
        pred["pose"] = np.tile(np.eye(3), (3, 1, 1))
        ev = Omni3DEvaluator(num_classes=1, mode="3D")
        ev.add_image(gt, pred)
        results.append({k: sorted(v) for k, v in ev._nhd_dis.items()})
        assert len(ev._errors["z_m"]) == 3
    for k in results[0]:
        np.testing.assert_allclose(results[0][k], results[1][k], atol=1e-9,
                                   err_msg=k)


def test_matched_pair_metrics_allow_duplicate_gt():
    """Reference NHD pairing has NO one-to-one constraint
    (omni3d_evaluation.py:2380-2399: each detection independently takes its
    best-IoU GT >= 0.5) — two near-identical detections both pair with the
    same GT, and a detection below the gate contributes nothing."""
    boxes = [(0, 0, 5)]
    gt = _gt(boxes)
    gt["center"] = np.array([b[:3] for b in boxes], float)
    gt["dims"] = np.ones((1, 3))
    gt["pose"] = np.tile(np.eye(3), (1, 1, 1))

    pb = [(0.05, 0, 5.1), (0, 0.05, 5.1), (0, 0, 25.0)]  # 2 dup + 1 far-off
    pred = _pred(pb, [0.9, 0.8, 0.7])
    pred["center"] = np.array([b[:3] for b in pb], float)
    pred["dims"] = np.ones((3, 3))
    pred["pose"] = np.tile(np.eye(3), (3, 1, 1))
    ev = Omni3DEvaluator(num_classes=1, mode="3D")
    ev.add_image(gt, pred)
    assert len(ev._nhd_values) == 2
    assert len(ev._errors["z_m"]) == 2


def test_nhd_pairs_restricted_to_same_category():
    """NHD pairing candidates are the SAME-category GTs only: the
    reference's gt list is _gts[imgId, catId], where out-of-vocab (-1)
    annotations never appear. A class-0 detection overlapping a -1 GT more
    strongly than its true class-0 GT must still pair with the class-0 GT,
    and a detection whose only overlap is a -1 GT contributes no pair."""
    boxes = [(0, 0, 5), (0.4, 0, 5), (10, 0, 5)]  # cls0, cls-1, cls-1
    gt = _gt(boxes)
    gt["classes"] = np.array([0, -1, -1], np.int64)
    gt["center"] = np.array([b[:3] for b in boxes], float)
    gt["dims"] = np.ones((3, 3))
    gt["pose"] = np.tile(np.eye(3), (3, 1, 1))

    # det 0 sits ON the -1 GT (higher IoU there) but overlaps the class-0
    # GT at IoU 1/4 >= NHD gate? (0.6 offset of unit cube -> IoU
    # 0.4/1.6 = 0.25 < 0.5) -- use 0.3 offset: inter 0.7, union 1.3,
    # IoU ~0.538 >= 0.5. det 1 overlaps ONLY the far -1 GT.
    pb = [(0.3, 0, 5), (10, 0, 5)]
    pred = _pred(pb, [0.9, 0.8])
    pred["center"] = np.array([b[:3] for b in pb], float)
    pred["dims"] = np.ones((2, 3))
    pred["pose"] = np.tile(np.eye(3), (2, 1, 1))

    ev = Omni3DEvaluator(num_classes=1, mode="3D")
    ev.add_image(gt, pred)
    # exactly one pair: det0 <-> the class-0 GT at (0,0,5)
    assert len(ev._nhd_values) == 1
    assert len(ev._errors["z_m"]) == 1
    # the pair is with the TRUE class-0 GT: center error in x is 0.3
    np.testing.assert_allclose(ev._errors["whl_m"], [0.0], atol=1e-9)
    assert abs(ev._nhd_values[0]) > 0  # offset pair, nonzero NHD


def test_out_of_band_unmatched_det_is_ignored_not_fp():
    """COCOeval dtIg: an unmatched detection whose own depth lies outside
    the band must not count as a false positive in that band — here a
    high-scoring near det above a perfect far TP leaves AP3D-F at 100
    (it deflated the far AP before the fix)."""
    ev = Omni3DEvaluator(num_classes=1, mode="3D")
    gt = _gt([(0, 0, 50)])                       # one far GT
    # near det (depth 5, unmatched, HIGHER score) + perfect far det
    ev.add_image(gt, _pred([(30, 0, 5), (0, 0, 50)], [0.95, 0.9]))
    res = ev.summarize()
    np.testing.assert_allclose(res["AP3D-F"], 100.0, atol=1e-5)
    # in the unrestricted band the near det IS a false positive
    assert res["AP3D"] < 100.0


def test_2d_area_bands():
    """2D mode buckets by pixel area (32^2/96^2 boundaries): a 20x20 box is
    'small', a 200x200 box is 'large'."""
    ev = Omni3DEvaluator(num_classes=1, mode="2D")
    gt = {
        "classes": np.zeros(2, np.int64),
        "boxes2d": np.array([[0, 0, 20, 20], [100, 100, 300, 300]], float),
    }
    pred = {
        "classes": np.zeros(2, np.int64),
        "scores": np.array([0.9, 0.8]),
        "boxes2d": np.array([[0, 0, 20, 20], [100, 100, 300, 300]], float),
    }
    ev.add_image(gt, pred)
    res = ev.summarize()
    np.testing.assert_allclose(res["AP2D-S"], 100.0, atol=1e-5)
    np.testing.assert_allclose(res["AP2D-L"], 100.0, atol=1e-5)
    assert np.isnan(res["AP2D-M"])  # no medium GT anywhere


def test_ar_maxdets_caps():
    """AR1 caps each image to its single highest-scoring detection
    (COCO maxDets axis): with 2 GT and 2 correct dets, AR@1 = 50."""
    ev = Omni3DEvaluator(num_classes=1, mode="3D")
    gt = _gt([(0, 0, 5), (4, 0, 5)])
    ev.add_image(gt, _pred([(0, 0, 5), (4, 0, 5)], [0.9, 0.8]))
    res = ev.summarize()
    np.testing.assert_allclose(res["AR3D"], 100.0, atol=1e-5)
    np.testing.assert_allclose(res["AR3D@1"], 50.0, atol=1e-5)
    np.testing.assert_allclose(res["AR3D@10"], 100.0, atol=1e-5)
