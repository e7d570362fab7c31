"""CPU z-buffer rasterizer: analytic depth / visibility / truncation cases
(reference math_util.py:707-758 semantics)."""
import jax.numpy as jnp
import numpy as np

from ovmono3d_tpu.utils.geometry import cuboid_corners
from ovmono3d_tpu.vis.rasterize import (
    estimate_truncation,
    estimate_visibility,
    render_depth_map,
    render_mesh_view,
)

K = np.array([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]])


def _corners(x, y, z, w=1.0, h=1.0, l=1.0):
    return np.asarray(
        cuboid_corners(jnp.array([x, y, z, w, h, l], jnp.float32))
    )


def test_depth_map_front_face():
    # Unit cube centered at z=5: front face at z=4.5 should fill the center.
    verts = _corners(0, 0, 5)[None]
    sil, depth, inds = render_depth_map(K, verts, 128, 128)
    assert sil[0, 64, 64]
    np.testing.assert_allclose(depth[64, 64], 4.5, atol=1e-6)
    # Front face spans +-0.5 at z=4.5 -> +-11.1 px around center.
    assert not sil[0, 64, 64 + 13]
    assert sil[0, 64, 64 + 9]


def test_visibility_analytic_occlusion():
    # Box B sits directly behind box A (same x/y): A fully visible, B hidden
    # where A covers it. A at z=5 spans ~+-11px; B at z=10 spans ~+-5.3px,
    # entirely inside A's silhouette -> visibility(B) = 0.
    verts = np.stack([_corners(0, 0, 5), _corners(0, 0, 10)])
    vis = estimate_visibility(K, verts, 128, 128)
    assert vis[0] > 0.99
    assert vis[1] < 0.01

    # Move B out to the side: fully visible.
    verts2 = np.stack([_corners(0, 0, 5), _corners(4.0, 0, 10)])
    vis2 = estimate_visibility(K, verts2, 128, 128)
    assert vis2[1] > 0.99


def test_truncation_cases():
    # Centered small box: no truncation.
    t = estimate_truncation(K, np.array([0, 0, 5, 1, 1, 1], np.float32),
                            np.eye(3, dtype=np.float32), 128, 128)
    assert t < 0.01
    # Box centered at the left image edge: ~half out.
    t2 = estimate_truncation(
        K, np.array([-3.2, 0, 5, 1, 1, 1], np.float32),
        np.eye(3, dtype=np.float32), 128, 128,
    )
    assert 0.3 < t2 < 0.7
    # Fully behind the camera.
    t3 = estimate_truncation(
        K, np.array([0, 0, -5, 1, 1, 1], np.float32),
        np.eye(3, dtype=np.float32), 128, 128,
    )
    assert t3 == 1.0


def test_render_mesh_view_shades_pixels():
    img = np.zeros((128, 128, 3), np.uint8)
    out = render_mesh_view(img, K, _corners(0, 0, 5)[None],
                           colors=np.array([[255.0, 0, 0]]))
    assert out.shape == (128, 128, 3)
    assert out[64, 64, 0] > 50          # shaded red at center
    assert (out[5, 5] == 0).all()       # background untouched


def test_pred_vs_gt_panels_shape():
    from ovmono3d_tpu.vis.draw import pred_vs_gt_panels

    img = np.zeros((64, 96, 3), np.uint8)
    gt = {
        "classes": np.array([0, 1]),
        "boxes2d": np.array([[4, 4, 30, 30], [40, 10, 80, 50]], float),
        "corners3d": np.stack([_corners(0, 0, 5), _corners(1, 0, 6)]),
    }
    pred = {
        "classes": np.array([0]),
        "scores": np.array([0.9]),
        "boxes2d": np.array([[5, 5, 31, 31]], float),
        "corners3d": _corners(0, 0, 5.2)[None],
    }
    panel = pred_vs_gt_panels(img, K, gt, pred, class_names=["a", "b"],
                              prompted_ids={0})
    assert panel.shape == (128, 288, 3)


def test_straddling_camera_plane_rasterizes_front_portion():
    """A cuboid crossing z=0 (e.g. an ego-vehicle box with corners behind
    the camera) must still rasterize its in-front portion via near-plane
    clipping — the reference's pytorch3d renderer clips, it doesn't drop
    whole triangles. Previously every face touching z<=0 was skipped and
    the silhouette came back empty (visibility 0 for a dominant object)."""
    # 4m-deep box centered at z=1.5: corners from z=-0.5 to z=3.5 (the
    # corner template scales z by W — geometry.py:83); every face has a
    # behind-camera vertex except front/back.
    verts = _corners(0, 0, 1.5, w=4.0, h=1.0, l=1.0)[None]
    assert (verts[0][:, 2] < 0).any() and (verts[0][:, 2] > 0).any()
    sil, depth, inds = render_depth_map(K, verts, 128, 128)
    area = sil[0].sum()
    assert area > 1000, f"straddling box silhouette empty/tiny ({area} px)"
    vis = estimate_visibility(K, verts, 128, 128)
    np.testing.assert_allclose(vis[0], 1.0, atol=1e-6)  # alone in scene
    # Shaded render covers pixels too.
    img = np.zeros((128, 128, 3), np.uint8)
    out = render_mesh_view(img, K, verts)
    assert (out != 0).any()
