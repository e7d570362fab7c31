"""SAM segmenter + DepthPro smoke/shape tests."""
import jax
import jax.numpy as jnp
import numpy as np

from ovmono3d_tpu.models.depth import (
    DepthPro,
    fov_to_focal,
    metric_depth,
)
from ovmono3d_tpu.models.sam import SamSegmenter


def test_sam_segmenter_shapes():
    model = SamSegmenter(embed_dim=32)
    embed = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32))
    boxes = jnp.array([[10.0, 10, 50, 60], [0, 0, 30, 30]])
    params = jax.jit(model.init)(jax.random.PRNGKey(1), embed, boxes, 128.0)
    masks, iou = jax.jit(
        lambda p: model.apply(p, embed, boxes, 128.0)
    )(params)
    assert masks.shape == (2, 3, 32, 32)  # 3 masks at 4x embedding res
    assert iou.shape == (2, 3)
    assert np.all(np.isfinite(np.asarray(masks)))


def test_sam_prompt_depends_on_box():
    model = SamSegmenter(embed_dim=32)
    embed = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 32))
    b1 = jnp.array([[10.0, 10, 50, 60]])
    b2 = jnp.array([[60.0, 60, 100, 100]])
    params = jax.jit(model.init)(jax.random.PRNGKey(1), embed, b1, 128.0)
    m1, _ = model.apply(params, embed, b1, 128.0)
    m2, _ = model.apply(params, embed, b2, 128.0)
    assert not np.allclose(np.asarray(m1), np.asarray(m2))


def test_depthpro_shapes_and_positivity():
    model = DepthPro(
        patch_size=8, encoder_size=32, vit_dim=32, vit_depth=2, vit_heads=4,
        scaled_dims=(16, 16, 8), hook_ids=(1,), hook_dims=(8,),
        fusion_dim=8, merge_padding=1, dtype=jnp.float32,
    )
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 128, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(1), img)
    out = jax.jit(model.apply)(params, img)
    assert out["canonical_inverse_depth"].shape == (1, 128, 128)
    assert out["fov_deg"].shape == (1,)
    assert np.all(np.asarray(out["canonical_inverse_depth"]) >= 0)


def test_metric_depth_decode():
    inv = jnp.full((1, 4, 4), 0.5)
    d = metric_depth(inv, jnp.array([256.0]), width=256)
    # depth = f / (W * c_inv) = 256 / (256 * 0.5) = 2.
    np.testing.assert_allclose(np.asarray(d), 2.0, rtol=1e-5)
    # telephoto: f = 2W -> same apparent size means twice the distance
    # (inverse_depth = c_inv * W / f_px, image_processing_depth_pro.py:376).
    d = metric_depth(inv, jnp.array([512.0]), width=256)
    np.testing.assert_allclose(np.asarray(d), 4.0, rtol=1e-5)
    f = fov_to_focal(jnp.array([90.0]), 256)
    np.testing.assert_allclose(float(f[0]), 128.0, rtol=1e-5)
