"""Golden tests for the cuboid geometry core against independent numpy math
and hand-constructed cases (reference semantics: cubercnn/util/math_util.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from ovmono3d_tpu.ops import rotation as R
from ovmono3d_tpu.utils import geometry as G


def test_cuboid_corners_axis_aligned():
    box = jnp.array([1.0, 2.0, 10.0, 2.0, 4.0, 6.0])  # X Y Z W H L
    corners = np.asarray(G.cuboid_corners(box))
    assert corners.shape == (8, 3)
    # L=6 along x, H=4 along y, W=2 along z; centered at (1,2,10).
    np.testing.assert_allclose(corners.min(0), [1 - 3, 2 - 2, 10 - 1], atol=1e-6)
    np.testing.assert_allclose(corners.max(0), [1 + 3, 2 + 2, 10 + 1], atol=1e-6)
    # Corner ordering from the reference diagram: v0 = (-L/2, -H/2, -W/2).
    np.testing.assert_allclose(corners[0], [-2.0, 0.0, 9.0], atol=1e-6)
    np.testing.assert_allclose(corners[6], [4.0, 4.0, 11.0], atol=1e-6)


def test_cuboid_corners_rotation():
    box = jnp.array([0.0, 0.0, 5.0, 1.0, 1.0, 2.0])
    # 90 deg about y: x-axis -> -z.
    Ry = R.euler_angles_to_matrix(jnp.array([0.0, jnp.pi / 2, 0.0]), "XYZ")
    corners = np.asarray(G.cuboid_corners(box, Ry))
    # L=2 was along x; now spans z.
    np.testing.assert_allclose(corners[:, 2].max() - corners[:, 2].min(), 2.0,
                               atol=1e-5)
    np.testing.assert_allclose(corners[:, 0].max() - corners[:, 0].min(), 1.0,
                               atol=1e-5)


def test_cuboid_corners_batched():
    boxes = jax.random.uniform(jax.random.PRNGKey(0), (4, 7, 6)) + 0.5
    rots = R.random_rotations(jax.random.PRNGKey(1), 28).reshape(4, 7, 3, 3)
    corners = G.cuboid_corners(boxes, rots)
    assert corners.shape == (4, 7, 8, 3)
    # Centroid of corners == box center.
    np.testing.assert_allclose(
        np.asarray(jnp.mean(corners, axis=-2)),
        np.asarray(boxes[..., :3]),
        atol=1e-5,
    )


def test_project_points():
    K = jnp.array([[100.0, 0, 50], [0, 100.0, 40], [0, 0, 1]])
    pts = jnp.array([[0.0, 0.0, 2.0], [1.0, -1.0, 4.0]])
    uvz = np.asarray(G.project_points(K, pts))
    np.testing.assert_allclose(uvz[0], [50, 40, 2], atol=1e-5)
    np.testing.assert_allclose(uvz[1], [50 + 100 / 4, 40 - 100 / 4, 4], atol=1e-5)


def test_backproject_roundtrip():
    K = jnp.array([[120.0, 0, 64], [0, 110.0, 48], [0, 0, 1]])
    pts = jnp.array([[0.5, -0.2, 3.0], [2.0, 1.0, 8.0]])
    uvz = G.project_points(K, pts)
    back = G.backproject(K, uvz[..., :2], uvz[..., 2])
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-3)


def test_cuboid_to_2d_box_in_front():
    K = jnp.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
    box = jnp.array([0.0, 0.0, 10.0, 2.0, 2.0, 2.0])
    eye = jnp.eye(3)
    box2d, behind, fully = G.cuboid_to_2d_box(K, box, eye, 100, 100, xywh=False)
    assert not bool(behind) and not bool(fully)
    b = np.asarray(box2d)
    # Front face at z=9: half-extent 1 -> 100/9 px; back face z=11 smaller.
    np.testing.assert_allclose(b, [50 - 100 / 9, 50 - 100 / 9,
                                   50 + 100 / 9, 50 + 100 / 9], atol=1e-4)


def test_cuboid_to_2d_box_behind():
    K = jnp.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
    box = jnp.array([0.0, 0.0, -5.0, 1.0, 1.0, 1.0])
    box2d, behind, fully = G.cuboid_to_2d_box(K, box, jnp.eye(3), 100, 100)
    assert bool(behind) and bool(fully)


def test_virtual_depth_scale():
    # f=1000px real focal, H=600 original height, virtual f0=512, H0=896 net
    # height: scale = H0*f/(f0*H).
    s = G.virtual_to_real_scale(1000.0, 600.0, 512.0, 896.0)
    np.testing.assert_allclose(float(s), 896 * 1000 / (512 * 600), rtol=1e-6)


def test_allocentric_roundtrip():
    K = jnp.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    K = jnp.broadcast_to(K, (16, 3, 3))
    rots = R.random_rotations(jax.random.PRNGKey(2), 16)
    u = jax.random.uniform(jax.random.PRNGKey(3), (16,), minval=0, maxval=640)
    v = jax.random.uniform(jax.random.PRNGKey(4), (16,), minval=0, maxval=480)
    allo = G.R_to_allocentric(K, rots, u, v)
    back = G.R_from_allocentric(K, allo, u, v)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rots), atol=1e-5)


def test_allocentric_at_principal_point_is_identity_correction():
    K = jnp.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    rots = R.random_rotations(jax.random.PRNGKey(5), 4)
    allo = G.R_to_allocentric(jnp.broadcast_to(K, (4, 3, 3)), rots,
                              jnp.full((4,), 320.0), jnp.full((4,), 240.0))
    np.testing.assert_allclose(np.asarray(allo), np.asarray(rots), atol=1e-5)


def test_scaled_sigmoid_bounds():
    vals = jnp.linspace(-10, 10, 21)
    out = np.asarray(G.scaled_sigmoid(vals, 2.0, 5.0))
    assert out.min() >= 2.0 and out.max() <= 5.0
    np.testing.assert_allclose(
        np.asarray(G.scaled_sigmoid(jnp.zeros(()), 2.0, 5.0)), 3.5, atol=1e-6
    )


def test_chamfer_corner_distance_zero_for_identical():
    box = jnp.array([0.0, 0.0, 5.0, 1.0, 2.0, 3.0])
    c = G.cuboid_corners(box)
    d = G.chamfer_corner_distance(c, c)
    np.testing.assert_allclose(float(d), 0.0, atol=1e-6)
    # Permutation-invariant: 180deg yaw flip maps the cuboid onto itself.
    Ry = R.euler_angles_to_matrix(jnp.array([0.0, jnp.pi, 0.0]), "XYZ")
    c2 = G.cuboid_corners(box, Ry)
    d2 = G.chamfer_corner_distance(c2, c)
    np.testing.assert_allclose(float(d2), 0.0, atol=1e-5)


def test_approx_eval_resolution():
    h, w, sf = G.approx_eval_resolution(480, 640, scale_min=532, scale_max=896)
    assert abs(min(h, w) - 532) < 1e-6 or max(h, w) == 896
    assert abs(sf - h / 480) < 1e-9
