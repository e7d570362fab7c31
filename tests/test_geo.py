"""GEO pipeline tests: synthetic depth of a known box must be recovered."""
import jax
import jax.numpy as jnp
import numpy as np

from ovmono3d_tpu.geo.pipeline import (
    fit_box_from_mask_depth,
    heading_to_rotmat,
    pca_yaw,
    unproject_depth,
)


def test_heading_rotmat():
    R = np.asarray(heading_to_rotmat(jnp.asarray(0.3)))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(R[1, 1], 1.0, atol=1e-7)


def test_unproject_center_pixel():
    K = jnp.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    depth = jnp.full((64, 64), 2.0)
    pts = np.asarray(unproject_depth(depth, K))
    # Principal-point pixel -> x=0, y=0; flip makes z=-2.
    np.testing.assert_allclose(pts[32, 32], [0, 0, -2.0], atol=1e-5)
    # +x to the right, -y downward (flipped frame).
    assert pts[32, 63, 0] > 0
    assert pts[63, 32, 1] < 0


def test_pca_yaw_recovers_dominant_direction():
    rng = np.random.RandomState(0)
    # Elongated blob along a known xz direction.
    yaw_true = 0.5
    t = rng.randn(2000) * 3.0
    n = rng.randn(2000) * 0.2
    x = t * np.cos(yaw_true) - n * np.sin(yaw_true)
    z = t * np.sin(yaw_true) + n * np.cos(yaw_true)
    pts = np.stack([x, rng.randn(2000) * 0.1, z], axis=1).astype(np.float32)
    yaw = float(pca_yaw(jnp.asarray(pts), jnp.ones(2000, bool)))
    # Yaw is direction-ambiguous (v vs -v).
    diff = min(abs(yaw - yaw_true), abs(abs(yaw - yaw_true) - np.pi))
    assert diff < 0.05, (yaw, yaw_true)


def _render_box_depth(center, dims, H=96, W=96, f=150.0):
    """Depth map of the front face of an axis-aligned box + mask."""
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    cx, cy, cz = center
    w, h, l = dims  # w along z (depth extent), h along y, l along x
    depth = np.zeros((H, W), np.float32)
    mask = np.zeros((H, W), np.float32)
    z_front = cz - w / 2
    for v in range(H):
        for u in range(W):
            x = z_front * (u - K[0, 2]) / f
            y = z_front * (v - K[1, 2]) / f
            if abs(x - cx) <= l / 2 and abs(y - cy) <= h / 2:
                depth[v, u] = z_front
                mask[v, u] = 1.0
    return mask, depth, K


def test_fit_box_front_face():
    # A fronto-parallel plane (the visible face of a box): the fit must
    # recover the face's center/extent; depth extent ~0.
    center = (0.2, -0.1, 3.0)
    dims = (0.8, 0.6, 1.0)  # w (z), h (y), l (x)
    mask, depth, K = _render_box_depth(center, dims)
    out = fit_box_from_mask_depth(
        jnp.asarray(mask), jnp.asarray(depth), jnp.asarray(K)
    )
    c = np.asarray(out["center"])
    d = np.asarray(out["dims"])
    # Center of the front face: (cx, cy, cz - w/2).
    np.testing.assert_allclose(c[0], center[0], atol=0.05)
    np.testing.assert_allclose(c[1], center[1], atol=0.05)
    np.testing.assert_allclose(c[2], center[2] - dims[0] / 2, atol=0.05)
    # Extents: one of the fitted in-plane dims ~ l, another ~ h (the fit's
    # yaw may swap x/z roles for a planar cloud); the smallest dim ~ 0.
    fitted = np.sort(d)
    np.testing.assert_allclose(fitted[0], 0.0, atol=0.05)
    np.testing.assert_allclose(sorted([fitted[1], fitted[2]]),
                               sorted([dims[1], dims[2]]), atol=0.1)
    # Pose is a valid rotation.
    R = np.asarray(out["pose"])
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)
    # Corners reproduce the fit (finite, centered on c).
    np.testing.assert_allclose(
        np.asarray(out["corners"]).mean(axis=0), c, atol=1e-4
    )


def test_outlier_rejection():
    # Dense front face + scattered far-away outlier pixels inside the mask:
    # the density filter must reject them so the extent stays tight.
    # (Resolution must be fine enough for the density criterion to engage —
    # on sparse clouds both the reference DBSCAN loop and this filter fall
    # back to the unfiltered points after 4 eps-doublings.)
    center = (0.0, 0.0, 3.0)
    dims = (0.5, 0.6, 0.6)
    mask, depth, K = _render_box_depth(center, dims, H=224, W=224, f=350.0)
    depth_bad = depth.copy()
    ys, xs = np.where(mask > 0)
    # corrupt scattered pixels to 3x depth
    for i in range(8):
        depth_bad[ys[i * 97 % len(ys)], xs[i * 131 % len(xs)]] = 9.0
    out_clean = fit_box_from_mask_depth(
        jnp.asarray(mask), jnp.asarray(depth), jnp.asarray(K)
    )
    out_bad = fit_box_from_mask_depth(
        jnp.asarray(mask), jnp.asarray(depth_bad), jnp.asarray(K)
    )
    d_clean = np.asarray(out_clean["dims"])
    d_bad = np.asarray(out_bad["dims"])
    # Without rejection the depth extent would blow up to ~6 m.
    assert np.max(d_bad) < np.max(d_clean) + 0.5, (d_clean, d_bad)
