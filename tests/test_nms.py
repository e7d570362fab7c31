"""Tests for fixed-shape NMS against a straightforward numpy greedy NMS."""
import jax
import jax.numpy as jnp
import numpy as np

from ovmono3d_tpu.ops.nms import batched_nms_mask, nms_mask, topk_after_nms


def _np_greedy_nms(boxes, scores, thresh):
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / np.maximum(area_i + areas - inter, 1e-7)
        suppressed |= iou > thresh
    mask = np.zeros(len(boxes), bool)
    mask[keep] = True
    return mask


def _random_boxes(key, n, size=100.0):
    k1, k2 = jax.random.split(key)
    xy = jax.random.uniform(k1, (n, 2), minval=0, maxval=size)
    wh = jax.random.uniform(k2, (n, 2), minval=5, maxval=40)
    return jnp.concatenate([xy, xy + wh], axis=1)


def test_nms_matches_numpy_greedy():
    for seed in range(5):
        key = jax.random.PRNGKey(seed)
        boxes = _random_boxes(key, 64)
        scores = jax.random.uniform(jax.random.PRNGKey(seed + 100), (64,))
        got = np.asarray(nms_mask(boxes, scores, 0.5))
        want = _np_greedy_nms(np.asarray(boxes), np.asarray(scores), 0.5)
        np.testing.assert_array_equal(got, want)


def test_nms_respects_valid_mask():
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]],
                      jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7])
    valid = jnp.array([False, True, True])
    keep = np.asarray(nms_mask(boxes, scores, 0.5, valid))
    # Highest scoring box is invalid -> second box survives instead.
    np.testing.assert_array_equal(keep, [False, True, True])


def test_batched_nms_classes_dont_suppress():
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = jnp.array([0.9, 0.8])
    same = np.asarray(batched_nms_mask(boxes, scores, jnp.array([0, 0]), 0.5))
    diff = np.asarray(batched_nms_mask(boxes, scores, jnp.array([0, 1]), 0.5))
    np.testing.assert_array_equal(same, [True, False])
    np.testing.assert_array_equal(diff, [True, True])


def test_topk_after_nms():
    boxes = _random_boxes(jax.random.PRNGKey(0), 32)
    scores = jnp.linspace(1.0, 0.0, 32)
    keep = nms_mask(boxes, scores, 0.9)  # high thresh keeps most
    idx, valid = topk_after_nms(boxes, scores, keep, 8)
    assert idx.shape == (8,) and valid.shape == (8,)
    kept_scores = np.asarray(scores)[np.asarray(idx)][np.asarray(valid)]
    assert np.all(np.diff(kept_scores) <= 0)  # sorted descending


def test_nms_jits():
    boxes = _random_boxes(jax.random.PRNGKey(1), 128)
    scores = jax.random.uniform(jax.random.PRNGKey(2), (128,))
    fn = jax.jit(lambda b, s: nms_mask(b, s, 0.5))
    out1 = fn(boxes, scores)
    out2 = nms_mask(boxes, scores, 0.5)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_parallel_nms_matches_serial():
    from ovmono3d_tpu.ops.nms import nms_mask_parallel

    for seed in range(8):
        key = jax.random.PRNGKey(seed)
        boxes = _random_boxes(key, 128)
        scores = jax.random.uniform(jax.random.PRNGKey(seed + 500), (128,))
        for thresh in (0.3, 0.5, 0.7):
            serial = np.asarray(nms_mask(boxes, scores, thresh))
            par = np.asarray(nms_mask_parallel(boxes, scores, thresh))
            np.testing.assert_array_equal(par, serial)


def test_parallel_nms_chain():
    from ovmono3d_tpu.ops.nms import nms_mask_parallel

    # A suppression chain: box i overlaps i+1 heavily; greedy keeps evens.
    n = 24
    boxes = jnp.stack(
        [
            jnp.arange(n, dtype=jnp.float32) * 4.0,
            jnp.zeros(n),
            jnp.arange(n, dtype=jnp.float32) * 4.0 + 10.0,
            jnp.full((n,), 10.0),
        ],
        axis=1,
    )
    scores = jnp.linspace(1.0, 0.5, n)
    serial = np.asarray(nms_mask(boxes, scores, 0.3))
    par = np.asarray(nms_mask_parallel(boxes, scores, 0.3))
    np.testing.assert_array_equal(par, serial)
    np.testing.assert_array_equal(serial, np.arange(n) % 2 == 0)


def test_parallel_nms_respects_valid():
    from ovmono3d_tpu.ops.nms import nms_mask_parallel

    boxes = jnp.array(
        [[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]], jnp.float32
    )
    scores = jnp.array([0.9, 0.8, 0.7])
    valid = jnp.array([False, True, True])
    keep = np.asarray(nms_mask_parallel(boxes, scores, 0.5, valid))
    np.testing.assert_array_equal(keep, [False, True, True])


def test_per_group_nms_equals_joint_batched():
    """Running NMS independently per group is bit-identical to the joint
    class-offset batched NMS — the RPN's per-level NMS relies on this
    (detectron2 find_top_rpn_proposals batched_nms over level ids)."""
    from ovmono3d_tpu.ops.nms import batched_nms_mask, nms_mask_parallel

    rng = np.random.RandomState(3)
    n, g = 120, 3
    xy = rng.rand(n, 2).astype(np.float32) * 80
    wh = rng.rand(n, 2).astype(np.float32) * 30 + 2
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], axis=1))
    scores = jnp.asarray(rng.rand(n).astype(np.float32))
    groups = jnp.asarray(np.sort(rng.randint(0, g, n)))

    joint = np.asarray(
        batched_nms_mask(boxes, scores, groups, 0.4)
    )
    per_group = np.zeros(n, bool)
    for gi in range(g):
        sel = np.asarray(groups) == gi
        keep = np.asarray(
            nms_mask_parallel(boxes[sel], scores[sel], 0.4)
        )
        per_group[sel] = keep
    np.testing.assert_array_equal(per_group, joint)


def test_batched_nms_nonfinite_box_does_not_poison_span():
    """A single NaN/Inf box among the candidates must not disable NMS for
    the whole image: the class-offset span is computed over FINITE valid
    boxes only (a NaN span would shift every box to NaN -> all IoUs 0 ->
    zero suppression -> duplicate detections returned as valid)."""
    import numpy as np
    from ovmono3d_tpu.ops.nms import batched_nms_mask

    boxes = jnp.asarray(np.array([
        [0, 0, 10, 10],
        [0.5, 0, 10.5, 10],      # overlaps box 0 (IoU ~0.9), same class
        [np.nan, 0, 10, 10],     # poisoned slot
        [100, 100, 110, 110],    # disjoint, other class
    ], np.float32))
    scores = jnp.asarray([0.9, 0.8, 0.95, 0.7])
    classes = jnp.asarray([0, 0, 0, 1], jnp.int32)
    valid = jnp.asarray([True, True, True, True])
    keep = np.asarray(
        batched_nms_mask(boxes, scores, classes, 0.5, valid)
    )
    assert keep[0] and not keep[1], "duplicate must be suppressed"
    assert not keep[2], "non-finite box must not be kept"
    assert keep[3]

    # Same with the poisoned slot marked invalid (the usual padding case).
    valid2 = jnp.asarray([True, True, False, True])
    keep2 = np.asarray(
        batched_nms_mask(boxes, scores, classes, 0.5, valid2)
    )
    assert list(keep2) == [True, False, False, True]
