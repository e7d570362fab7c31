"""End-to-end model smoke tests at tiny scale: init, oracle inference,
full 2D detect path, and training losses — all jitted, all finite."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ovmono3d_tpu.config import Config
from ovmono3d_tpu.models.rcnn3d import RCNN3D, build_model
from ovmono3d_tpu.structures import GroundTruth


def tiny_config() -> Config:
    cfg = Config()
    bb = dataclasses.replace(
        cfg.model.backbone,
        embed_dim=32,
        depth=1,
        num_heads=2,
        patch_size=14,
        pretrain_grid=8,
        out_channels=32,
        square_pad=112,  # 8x8 patch grid -> p2 16x16, p3 8x8, p4 4x4
    )
    rpn = dataclasses.replace(
        cfg.model.rpn,
        pre_nms_topk_train=64,
        pre_nms_topk_test=64,
        post_nms_topk_train=64,
        post_nms_topk_test=32,
        batch_size_per_image=32,
    )
    roi = dataclasses.replace(
        cfg.model.roi_box, fc_dim=32, batch_size_per_image=16
    )
    cube = dataclasses.replace(cfg.model.cube, fc_dim=32)
    model = dataclasses.replace(
        cfg.model,
        backbone=bb,
        rpn=rpn,
        roi_box=roi,
        cube=cube,
        num_classes=5,
        max_detections=8,
    )
    return dataclasses.replace(cfg, model=model)


S = 112
B = 2
NO = 4  # oracle slots
M = 3   # gt slots


def _batch():
    key = jax.random.PRNGKey(0)
    image = jax.random.uniform(key, (B, S, S, 3)) * 255.0
    K = jnp.broadcast_to(
        jnp.array([[100.0, 0, 56], [0, 100.0, 56], [0, 0, 1]]), (B, 3, 3)
    )
    im_hw = jnp.array([[112, 112], [98, 84]], jnp.int32)
    ratio = jnp.array([2.0, 1.5])
    return image, K, im_hw, ratio


def _oracle():
    boxes = jnp.array(
        [
            [[10, 10, 50, 50], [30, 20, 90, 80], [0, 0, 20, 20], [0, 0, 0, 0]],
            [[5, 5, 60, 60], [40, 40, 80, 90], [0, 0, 0, 0], [0, 0, 0, 0]],
        ],
        jnp.float32,
    )
    classes = jnp.array([[0, 2, 4, 0], [1, 3, 0, 0]], jnp.int32)
    scores = jnp.array([[0.9, 0.8, 0.7, 0.0], [0.95, 0.6, 0.0, 0.0]])
    valid = jnp.array([[1, 1, 1, 0], [1, 1, 0, 0]], bool)
    return boxes, classes, scores, valid


def _gt():
    boxes = jnp.array(
        [
            [[10, 10, 50, 50], [30, 20, 90, 80], [0, 0, 0, 0]],
            [[5, 5, 60, 60], [0, 0, 10, 10], [0, 0, 0, 0]],
        ],
        jnp.float32,
    )
    classes = jnp.array([[0, 2, 0], [1, -1, 0]], jnp.int32)
    # [u, v, z, w, h, l, X, Y, Z]
    boxes3d = jnp.array(
        [
            [
                [30, 30, 2.0, 0.5, 0.4, 0.6, 0, 0, 2.0],
                [60, 50, 3.0, 1.0, 0.8, 1.2, 0.1, 0.1, 3.0],
                [0, 0, 1, 1, 1, 1, 0, 0, 1],
            ],
            [
                [32, 32, 1.5, 0.3, 0.3, 0.3, 0, 0, 1.5],
                [5, 5, 1, 1, 1, 1, 0, 0, 1],
                [0, 0, 1, 1, 1, 1, 0, 0, 1],
            ],
        ]
    )
    poses = jnp.broadcast_to(jnp.eye(3), (B, M, 3, 3))
    valid = jnp.array([[1, 1, 0], [1, 1, 0]], bool)
    return GroundTruth(
        boxes=boxes, classes=classes, boxes3d=boxes3d, poses=poses, valid=valid
    )


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_config()
    model = build_model(cfg.model)
    image, K, im_hw, ratio = _batch()
    # Init through the FULL path (no oracle) so every head gets params;
    # jitted because eager init compiles each op separately (very slow).
    params = jax.jit(model.init)(
        jax.random.PRNGKey(1), image, K, im_hw, ratio
    )
    return cfg, model, params


def test_oracle_inference(model_and_params):
    cfg, model, params = model_and_params
    image, K, im_hw, ratio = _batch()
    ob, oc, osc, ov = _oracle()

    @jax.jit
    def run(params, image):
        return model.apply(
            params, image, K, im_hw, ratio,
            oracle_boxes=ob, oracle_classes=oc, oracle_scores=osc,
            oracle_valid=ov,
        )

    det = run(params, image)
    assert det.boxes.shape == (B, NO, 4)
    assert det.corners3d.shape == (B, NO, 8, 3)
    assert det.pose.shape == (B, NO, 3, 3)
    for leaf in jax.tree.leaves(det):
        assert np.all(np.isfinite(np.asarray(leaf)))
    # Boxes rescaled to original coords by the per-image ratio.
    np.testing.assert_allclose(
        np.asarray(det.boxes[0, 0]), [20, 20, 100, 100], atol=1e-4
    )
    # Valid mask preserved; invalid slots have zero score.
    assert not bool(det.valid[0, 3])
    assert float(det.scores[0, 3]) == 0.0
    # Pose is a rotation matrix.
    p = np.asarray(det.pose[0, 0])
    np.testing.assert_allclose(p @ p.T, np.eye(3), atol=1e-3)


def test_full_2d_path(model_and_params):
    cfg, model, params = model_and_params
    image, K, im_hw, ratio = _batch()

    @jax.jit
    def run(params, image):
        return model.apply(params, image, K, im_hw, ratio)

    det = run(params, image)
    assert det.boxes.shape == (B, cfg.model.max_detections, 4)
    for leaf in jax.tree.leaves(det):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_training_losses(model_and_params):
    cfg, model, params = model_and_params
    image, K, im_hw, ratio = _batch()
    gt = _gt()

    @jax.jit
    def run(params, image, rng):
        return model.apply(
            params, image, K, im_hw, ratio, gt, rng,
            method=RCNN3D.compute_losses,
        )

    losses = run(params, image, jax.random.PRNGKey(3))
    expected = {
        "rpn/cls", "rpn/loc", "box/cls", "box/reg",
        "cube/loss_xy", "cube/loss_z", "cube/loss_dims", "cube/loss_pose",
        "cube/loss_joint", "cube/loss_uncert",
    }
    assert expected <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite"
        assert float(v) >= 0 or k.startswith("cube/loss_uncert"), k


def test_training_grads_flow(model_and_params):
    cfg, model, params = model_and_params
    image, K, im_hw, ratio = _batch()
    gt = _gt()

    def loss_fn(params):
        losses = model.apply(
            params, image, K, im_hw, ratio, gt, jax.random.PRNGKey(4),
            method=RCNN3D.compute_losses,
        )
        return sum(losses.values())

    grads = jax.jit(jax.grad(loss_fn))(params)
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # Some head grads must be nonzero.
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert total > 0


def test_cluster_z_decode_with_priors():
    """cluster_bins z decode: the assigned bin's statistics bound the depth
    (roi_heads.py:436-449, 525-546)."""
    import numpy as np
    from ovmono3d_tpu.models.rcnn3d import decode_cube

    cube = dataclasses.replace(
        tiny_config().model.cube, z_type="clusters", cluster_bins=3,
        virtual_depth=False,
    )
    n, bins = 6, 3
    outputs = {
        "deltas_2d": jnp.zeros((n, 2)),
        "dims": jnp.zeros((n, 3)),
        "pose": jnp.broadcast_to(jnp.eye(3), (n, 3, 3)),
        "z": jnp.zeros((n, bins)),  # sigmoid(0) = 0.5 -> mid of the band
        "uncert": jnp.zeros((n, 1)),
    }
    # Boxes with increasing scale: should map to bins with increasing scale
    # centers; give each bin a distinct depth band.
    sizes = jnp.array([10.0, 10, 60, 60, 300, 300])
    boxes = jnp.stack(
        [jnp.zeros(n), jnp.zeros(n), sizes, sizes], axis=1
    )
    z_scales = jnp.array([[14.14, 84.85, 424.3]])      # hypot of sizes
    z_stats = jnp.array([[[8.0, 1.0], [4.0, 0.5], [2.0, 0.25]]])
    K = jnp.broadcast_to(jnp.eye(3) * 100, (n, 3, 3)).at[:, 2, 2].set(1.0)
    dec = decode_cube(
        cube, outputs, boxes, jnp.zeros((n,), jnp.int32), K,
        jnp.full((n,), 100.0), jnp.full((n,), 100.0), jnp.ones((n,)),
        priors_z_scales=z_scales, priors_z_stats=z_stats,
    )
    z = np.asarray(dec["z"])
    # sigmoid(0) = middle of [mean-3std, mean+3std] = mean.
    np.testing.assert_allclose(z[0:2], 8.0, atol=1e-4)
    np.testing.assert_allclose(z[2:4], 4.0, atol=1e-4)
    np.testing.assert_allclose(z[4:6], 2.0, atol=1e-4)


def test_dims_priors_decode():
    import numpy as np
    from ovmono3d_tpu.models.rcnn3d import decode_cube

    cube = dataclasses.replace(
        tiny_config().model.cube, dims_priors_enabled=True,
        dims_priors_func="exp", virtual_depth=False,
    )
    n, C = 4, 5
    outputs = {
        "deltas_2d": jnp.zeros((n, C, 2)),
        "dims": jnp.zeros((n, C, 3)),  # exp(0) = 1 -> dims == prior mean
        "pose": jnp.broadcast_to(jnp.eye(3), (n, C, 3, 3)),
        "z": jnp.ones((n, C)),
        "uncert": jnp.zeros((n, C)),
    }
    priors_dims = jnp.stack(
        [jnp.full((2, 3), 0.1) * (i + 1) for i in range(C)]
    )  # class i mean = 0.1*(i+1)
    classes = jnp.array([0, 1, 2, 4], jnp.int32)
    boxes = jnp.tile(jnp.array([[0.0, 0, 10, 10]]), (n, 1))
    K = jnp.broadcast_to(jnp.eye(3) * 100, (n, 3, 3)).at[:, 2, 2].set(1.0)
    dec = decode_cube(
        cube, outputs, boxes, classes, K, jnp.full((n,), 100.0),
        jnp.full((n,), 100.0), jnp.ones((n,)), priors_dims=priors_dims,
    )
    want = np.array([0.1, 0.2, 0.3, 0.5])
    np.testing.assert_allclose(
        np.asarray(dec["dims"])[:, 0], want, rtol=1e-5
    )


def test_non_disentangled_losses(model_and_params):
    """DISENTANGLED_LOSS=False variant: delta/log-space l1 + so3 pose loss
    (roi_heads.py:630-673)."""
    cfg, model, params = model_and_params
    image, K, im_hw, ratio = _batch()
    gt = _gt()
    cube = dataclasses.replace(
        cfg.model.cube, disentangled_loss=False, chamfer_pose=False
    )
    model2 = build_model(dataclasses.replace(cfg.model, cube=cube))
    losses = jax.jit(
        lambda p, im, r: model2.apply(
            p, im, K, im_hw, ratio, gt, r, method=RCNN3D.compute_losses
        )
    )(params, image, jax.random.PRNGKey(7))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # so3 pose loss = 1 - cos in [0, 2].
    assert 0.0 <= float(losses["cube/loss_pose"]) <= 2.0


def test_cube_head_conv_stack():
    """NUM_CONV>0 conv stack before the FCs (cube_head.py config surface)."""
    from ovmono3d_tpu.models.heads import CubeHead

    head = CubeHead(num_classes=5, num_conv=2, conv_dim=16, fc_dim=32)
    pooled = jax.random.normal(jax.random.PRNGKey(0), (4, 7, 7, 8))
    params = jax.jit(head.init)(jax.random.PRNGKey(1), pooled)
    assert "conv1" in params["params"] and "conv2" in params["params"]
    out = jax.jit(head.apply)(params, pooled)
    assert out["dims"].shape == (4, 3)
    assert np.all(np.isfinite(np.asarray(out["pose"])))
