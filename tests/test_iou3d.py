"""Golden tests for exact 3D IoU against analytically known volumes."""
import jax
import jax.numpy as jnp
import numpy as np

from ovmono3d_tpu.ops import rotation as R
from ovmono3d_tpu.ops.iou3d import box_volume, matched_iou3d, pairwise_iou3d
from ovmono3d_tpu.utils.geometry import cuboid_corners


def _box(x, y, z, w, h, l, rot=None):
    c = cuboid_corners(jnp.array([x, y, z, w, h, l], jnp.float32), rot)
    return c


def test_box_volume():
    c = _box(1.0, 2.0, 3.0, 2.0, 3.0, 4.0)
    np.testing.assert_allclose(float(box_volume(c)), 24.0, rtol=1e-5)
    rot = R.random_rotations(jax.random.PRNGKey(0), 1)[0]
    c2 = _box(1.0, 2.0, 3.0, 2.0, 3.0, 4.0, rot)
    np.testing.assert_allclose(float(box_volume(c2)), 24.0, rtol=1e-4)


def test_identical_boxes_iou_one():
    c = _box(0, 0, 5, 1, 2, 3)[None]
    _, iou = pairwise_iou3d(c, c)
    np.testing.assert_allclose(np.asarray(iou), [[1.0]], atol=1e-4)


def test_disjoint_boxes_iou_zero():
    a = _box(0, 0, 5, 1, 1, 1)[None]
    b = _box(10, 0, 5, 1, 1, 1)[None]
    _, iou = pairwise_iou3d(a, b)
    np.testing.assert_allclose(np.asarray(iou), [[0.0]], atol=1e-5)


def test_axis_aligned_partial_overlap():
    # Unit cubes offset by 0.5 in x: inter = 0.5, union = 1.5, IoU = 1/3.
    a = _box(0, 0, 5, 1, 1, 1)[None]
    b = _box(0.5, 0, 5, 1, 1, 1)[None]
    vol, iou = pairwise_iou3d(a, b)
    np.testing.assert_allclose(np.asarray(vol), [[0.5]], atol=1e-4)
    np.testing.assert_allclose(np.asarray(iou), [[1.0 / 3.0]], atol=1e-4)


def test_contained_box():
    a = _box(0, 0, 5, 2, 2, 2)[None]  # vol 8
    b = _box(0, 0, 5, 1, 1, 1)[None]  # vol 1, fully inside
    vol, iou = pairwise_iou3d(a, b)
    np.testing.assert_allclose(np.asarray(vol), [[1.0]], atol=1e-4)
    np.testing.assert_allclose(np.asarray(iou), [[1.0 / 8.0]], atol=1e-4)


def test_rotated_45_overlap():
    # Unit cube vs same cube rotated 45 deg about the vertical (y) axis:
    # intersection is a regular octagon prism; analytic area = 2*(sqrt(2)-1)
    # ~ 0.828427 for unit square cross-section, height 1.
    rot = R.euler_angles_to_matrix(jnp.array([0.0, jnp.pi / 4, 0.0]), "XYZ")
    a = _box(0, 0, 5, 1, 1, 1)[None]
    b = _box(0, 0, 5, 1, 1, 1, rot)[None]
    vol, iou = pairwise_iou3d(a, b)
    inter_analytic = 2 * (np.sqrt(2) - 1)
    np.testing.assert_allclose(np.asarray(vol), [[inter_analytic]], atol=1e-3)
    want_iou = inter_analytic / (2 - inter_analytic)
    np.testing.assert_allclose(np.asarray(iou), [[want_iou]], atol=1e-3)


def test_rotation_invariance_of_iou():
    # Apply the same random rigid transform to a box pair: IoU unchanged.
    key = jax.random.PRNGKey(1)
    rot_pair = R.random_rotations(key, 2)
    a = _box(0, 0, 5, 1.0, 2.0, 1.5, rot_pair[0])
    b = _box(0.3, -0.2, 5.4, 1.2, 1.8, 1.4, rot_pair[1])
    _, iou0 = pairwise_iou3d(a[None], b[None])

    g = R.random_rotations(jax.random.PRNGKey(2), 1)[0]
    t = jnp.array([0.5, -1.0, 2.0])
    a2 = a @ g.T + t
    b2 = b @ g.T + t
    _, iou1 = pairwise_iou3d(a2[None], b2[None])
    np.testing.assert_allclose(np.asarray(iou0), np.asarray(iou1), atol=1e-3)


def test_monte_carlo_agreement():
    # Random oriented pair, compare with Monte-Carlo volume estimate.
    key = jax.random.PRNGKey(3)
    rots = R.random_rotations(key, 2)
    a = _box(0, 0, 0, 1.4, 1.1, 0.9, rots[0])
    b = _box(0.2, 0.1, 0.3, 1.0, 1.3, 1.2, rots[1])
    vol, _ = pairwise_iou3d(a[None], b[None])

    # MC estimate: sample in a's frame.
    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.5, 0.5, size=(200000, 3)) * np.array([0.9, 1.1, 1.4])
    pts = pts @ np.asarray(rots[0]).T  # a's local -> world (center 0)
    # Inside b? transform into b's local frame.
    q = (pts - np.array([0.2, 0.1, 0.3])) @ np.asarray(rots[1])
    inside = (
        (np.abs(q[:, 0]) <= 1.2 / 2)
        & (np.abs(q[:, 1]) <= 1.3 / 2)
        & (np.abs(q[:, 2]) <= 1.0 / 2)
    )
    vol_a = 1.4 * 1.1 * 0.9
    mc = inside.mean() * vol_a
    np.testing.assert_allclose(float(vol[0, 0]), mc, rtol=0.02, atol=5e-3)


def test_pairwise_shapes_and_matched():
    key = jax.random.PRNGKey(4)
    boxes = jax.random.uniform(key, (5, 6), minval=0.5, maxval=2.0)
    boxes = boxes.at[:, :3].set(jax.random.normal(key, (5, 3)))
    rots = R.random_rotations(key, 5)
    corners = jax.vmap(cuboid_corners)(boxes, rots)
    vol, iou = pairwise_iou3d(corners, corners)
    assert iou.shape == (5, 5)
    np.testing.assert_allclose(np.asarray(jnp.diag(iou)), 1.0, atol=1e-3)
    # Symmetry.
    np.testing.assert_allclose(np.asarray(iou), np.asarray(iou).T, atol=1e-3)
    m = matched_iou3d(corners, corners)
    np.testing.assert_allclose(np.asarray(m), 1.0, atol=1e-3)
