"""Tests for anchor generation, box transforms, matching and sampling."""
import jax
import jax.numpy as jnp
import numpy as np

from ovmono3d_tpu.ops.boxes import (
    apply_deltas,
    generate_anchors,
    get_deltas,
    match_anchors,
    subsample_labels,
)


def test_generate_anchors_geometry():
    anchors = generate_anchors((2, 3), stride=16, sizes=(32.0,),
                               aspect_ratios=(1.0,))
    assert anchors.shape == (6, 4)
    a = np.asarray(anchors)
    # First anchor centered at (0, 0) with 32x32 extent.
    np.testing.assert_allclose(a[0], [-16, -16, 16, 16], atol=1e-5)
    # Cell (row 0, col 1) centered at (16, 0).
    np.testing.assert_allclose(a[1], [0, -16, 32, 16], atol=1e-5)
    # Areas preserved under aspect ratios.
    b = np.asarray(
        generate_anchors((1, 1), 16, (32.0,), (0.5, 1.0, 2.0))
    )
    areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    np.testing.assert_allclose(areas, 32.0**2, rtol=1e-5)
    # ratio = h/w (detectron2): first anchor is wide (r=0.5).
    assert (b[0, 2] - b[0, 0]) > (b[0, 3] - b[0, 1])


def test_deltas_roundtrip():
    rng = np.random.RandomState(0)
    src = rng.uniform(0, 100, (32, 2))
    src = np.concatenate([src, src + rng.uniform(5, 50, (32, 2))], axis=1)
    tgt = rng.uniform(0, 100, (32, 2))
    tgt = np.concatenate([tgt, tgt + rng.uniform(5, 50, (32, 2))], axis=1)
    w = (10.0, 10.0, 5.0, 5.0)
    deltas = get_deltas(jnp.asarray(src, jnp.float32),
                        jnp.asarray(tgt, jnp.float32), w)
    back = apply_deltas(deltas, jnp.asarray(src, jnp.float32), w)
    np.testing.assert_allclose(np.asarray(back), tgt, atol=1e-2)


def test_match_anchors_thresholds():
    anchors = jnp.array(
        [[0, 0, 10, 10], [0, 0, 9, 10], [50, 50, 60, 60], [200, 200, 210, 210]],
        jnp.float32,
    )
    gt = jnp.array([[0, 0, 10, 10], [52, 52, 62, 62]], jnp.float32)
    valid = jnp.ones(2, bool)
    idx, labels, ious, _ = match_anchors(
        anchors, gt, valid, (0.3, 0.7), allow_low_quality=False
    )
    lab = np.asarray(labels)
    assert lab[0] == 1          # IoU 1.0
    assert lab[1] == 1          # IoU 0.9
    assert lab[2] == -1         # IoU ~0.47 in (0.3, 0.7) -> ignore
    assert lab[3] == 0          # IoU 0 -> background
    assert np.asarray(idx)[0] == 0 and np.asarray(idx)[2] == 1
    # Low-quality matches force the best anchor per GT positive.
    _, labels_lq, _, _ = match_anchors(
        anchors, gt, valid, (0.3, 0.7), allow_low_quality=True
    )
    assert np.asarray(labels_lq)[2] == 1


def test_match_anchors_ignores_invalid_gt():
    anchors = jnp.array([[0, 0, 10, 10]], jnp.float32)
    gt = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    valid = jnp.array([False, True])
    idx, labels, _, _ = match_anchors(anchors, gt, valid, (0.3, 0.7))
    assert np.asarray(idx)[0] == 1  # matched to the valid row


def test_subsample_labels_counts_and_weighting():
    key = jax.random.PRNGKey(0)
    labels = jnp.array([1] * 40 + [0] * 100 + [-1] * 20)
    ious = jnp.concatenate(
        [jnp.linspace(0.1, 1.0, 40), jnp.zeros(120)]
    )
    pos, neg = subsample_labels(key, labels, 64, 0.5, ious)
    assert int(pos.sum()) == 32          # 64 * 0.5
    assert int(neg.sum()) == 32          # fill the rest
    assert not bool((np.asarray(pos) & (np.asarray(labels) != 1)).any())
    assert not bool((np.asarray(neg) & (np.asarray(labels) != 0)).any())

    # Fewer positives than target: all kept, negatives fill up.
    labels2 = jnp.array([1] * 5 + [0] * 100)
    pos2, neg2 = subsample_labels(key, labels2, 64, 0.5, jnp.ones(105))
    assert int(pos2.sum()) == 5
    assert int(neg2.sum()) == 59

    # IoU weighting: high-IoU positives sampled far more often.
    counts = np.zeros(40)
    for seed in range(40):
        p, _ = subsample_labels(
            jax.random.PRNGKey(seed), labels, 16, 0.5, ious
        )
        counts += np.asarray(p)[:40]
    assert counts[30:].mean() > counts[:10].mean() * 1.5
