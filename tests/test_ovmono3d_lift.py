"""OVMono3DLift end-to-end integration: prompts -> GDINO 2D -> 3D cuboids,
at tiny scale with random weights (plumbing + shape + finiteness)."""
import dataclasses

import jax
import numpy as np
import pytest

from ovmono3d_tpu.models.gdino.tokenizer import BertTokenizer
from ovmono3d_tpu.models.ovmono3d import OVMono3DLift, default_focal_K

VOCAB = {
    "[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, ".": 4,
    "chair": 5, "cup": 6, "laptop": 7,
}


@pytest.fixture(scope="module")
def pipeline():
    import sys

    sys.path.insert(0, "tests")
    from test_model import tiny_config

    cfg = tiny_config()
    gdino_kwargs = dict(
        hidden_dim=32, nheads=2, enc_layers=1, dec_layers=1, num_queries=16,
        enc_points=2, dec_points=2, max_text_len=32, ffn_dim=64,
        swin_embed_dim=8, swin_depths=(1, 1, 1, 1), swin_heads=(1, 2, 4, 8),
        swin_window=4, bert_layers=1,
    )
    return OVMono3DLift.build(
        cfg, BertTokenizer(VOCAB), gdino_kwargs=gdino_kwargs, gdino_size=64
    )


def test_full_predict(pipeline):
    rng = np.random.RandomState(0)
    image = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
    K = default_focal_K(96, 128)
    det = pipeline.predict(image, K, ["chair", "cup"])
    # Every 2D slot is lifted (reference keeps every box past
    # threshold+NMS; final ranking happens on the fused score). The slot
    # count is detect_topk capped by the detector's query count.
    n = min(pipeline.detect_topk, pipeline.gdino.num_queries)
    assert det.boxes.shape == (n, 4)
    assert det.corners3d.shape == (n, 8, 3)
    for leaf in jax.tree.leaves(det):
        assert np.all(np.isfinite(np.asarray(leaf)))
    # classes land in the prompt range
    valid = np.asarray(det.valid)
    if valid.any():
        assert np.all(np.asarray(det.classes)[valid] < 2)


def test_empty_prompts(pipeline):
    rng = np.random.RandomState(1)
    image = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
    det = pipeline.predict(image, default_focal_K(96, 128), [])
    assert not np.asarray(det.valid).any()
    assert float(np.asarray(det.scores).max()) == 0.0


@pytest.fixture(scope="module")
def fused_pipeline():
    """Pipeline in the e2e configuration (detector side == square pad,
    gdino_size=None -> build() default) — the shape predict() fuses."""
    import sys

    sys.path.insert(0, "tests")
    from test_model import tiny_config

    cfg = tiny_config()
    gdino_kwargs = dict(
        hidden_dim=32, nheads=2, enc_layers=1, dec_layers=1, num_queries=16,
        enc_points=2, dec_points=2, max_text_len=32, ffn_dim=64,
        swin_embed_dim=8, swin_depths=(1, 1, 1, 1), swin_heads=(1, 2, 4, 8),
        swin_window=4, bert_layers=1,
    )
    return OVMono3DLift.build(
        cfg, BertTokenizer(VOCAB), gdino_kwargs=gdino_kwargs
    )


def test_fused_predict_matches_two_stage(fused_pipeline):
    """The single-program predict (one canvas upload, GDINO normalization
    derived in-graph) must match the two-stage path. The only numeric
    difference is resize-then-divide vs divide-then-resize on the GDINO
    content (cv2 bilinear is linear, so float-rounding only)."""
    p = fused_pipeline
    assert p._fusable()
    rng = np.random.RandomState(0)
    image = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
    K = default_focal_K(96, 128)
    cats = ["chair", "cup", "laptop"]
    det_f = p.predict(image, K, cats, fused=True)
    det_t = p.predict(image, K, cats, fused=False)
    f = jax.tree.leaves(det_f)
    t = jax.tree.leaves(det_t)
    assert len(f) == len(t)
    np.testing.assert_array_equal(
        np.asarray(det_f.valid), np.asarray(det_t.valid)
    )
    for a, b in zip(f, t):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-4, atol=1e-4,
        )


def test_fused_gdino_tensor_matches_host_prep(fused_pipeline):
    """The in-graph GDINO normalization (content (x/255-mean)/std, padding
    exactly 0) reproduces _prep_gdino_image's host canvas."""
    import jax.numpy as jnp

    p = fused_pipeline
    rng = np.random.RandomState(3)
    image = (rng.rand(60, 100, 3) * 255).astype(np.uint8)
    host, scale = p._prep_gdino_image(image)
    canvas, (nh, nw), lscale = p._prep_lift_canvas(image)
    assert lscale == pytest.approx(scale)
    S = p.gdino_size
    content = (np.arange(S)[:, None] < nh) & (np.arange(S)[None, :] < nw)
    from ovmono3d_tpu.models.ovmono3d import GDINO_MEAN, GDINO_STD

    in_graph = np.where(
        content[..., None],
        (canvas / 255.0 - GDINO_MEAN) / GDINO_STD,
        0.0,
    )
    np.testing.assert_allclose(in_graph, host[0], rtol=1e-5, atol=1e-5)


def test_predict_stream_matches_per_image():
    """The chunked-scan streaming driver must reproduce per-image fused
    predict() exactly. Images are sized so the shortest-edge resize
    scale is exactly 1 (content pixels stay integers), making the
    stream's uint8 canvas feed bit-equal to predict()'s f32 canvas —
    any residual difference would be a driver bug, not quantization.
    Covers varying per-image (hw, K) through the scan and the padded
    final partial chunk (3 images, chunk=2)."""
    import dataclasses as dc
    import sys

    sys.path.insert(0, "tests")
    from test_model import tiny_config

    cfg = tiny_config()
    cfg = dc.replace(
        cfg, input=dc.replace(cfg.input, min_size_test=112,
                              max_size_test=112))
    gdino_kwargs = dict(
        hidden_dim=32, nheads=2, enc_layers=1, dec_layers=1, num_queries=16,
        enc_points=2, dec_points=2, max_text_len=32, ffn_dim=64,
        swin_embed_dim=8, swin_depths=(1, 1, 1, 1), swin_heads=(1, 2, 4, 8),
        swin_window=4, bert_layers=1,
    )
    p = OVMono3DLift.build(cfg, BertTokenizer(VOCAB),
                           gdino_kwargs=gdino_kwargs)
    assert p._fusable()
    rng = np.random.RandomState(7)
    shapes = [(112, 112), (96, 112), (112, 80)]  # all resolve to scale 1
    items = [((rng.rand(h, w, 3) * 255).astype(np.uint8),
              default_focal_K(h, w)) for h, w in shapes]
    cats = ["chair", "cup"]

    want = [p.predict(img, K, cats, fused=True) for img, K in items]
    got = list(p.predict_stream(iter(items), cats, chunk=2))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g.valid),
                                      np.asarray(w.valid))
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(w)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-5, atol=1e-5,
            )


def test_detect_stream_matches_detect_2d(pipeline):
    """detect_2d_stream (chunked-scan detect-only driver) vs per-image
    detect_2d. Image sizes resolve to content scale 1 (gdino_size=64,
    longest-side rule), so the stream's uint8 canvas equals detect_2d's
    f32 content exactly and outputs must match. 3 images, chunk=2 covers
    the padded final chunk."""
    rng = np.random.RandomState(21)
    images = [(rng.rand(h, w, 3) * 255).astype(np.uint8)
              for h, w in [(64, 48), (48, 64), (64, 64)]]
    cats = ["chair", "cup"]
    want = [pipeline.detect_2d(img, cats) for img in images]
    got = list(pipeline.detect_2d_stream(iter(images), cats, chunk=2))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g["valid"], w["valid"])
        np.testing.assert_array_equal(g["classes"], w["classes"])
        np.testing.assert_allclose(g["scores"], w["scores"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(g["boxes"], w["boxes"],
                                   rtol=1e-5, atol=1e-4)


def test_predict_stream_fallback_paths(pipeline):
    """Empty categories / non-fusable configs degrade to per-image
    predict() (the module-scoped `pipeline` fixture has gdino_size=64 !=
    square_pad, so it is NOT fusable — the stream must still work)."""
    assert not pipeline._fusable()
    rng = np.random.RandomState(5)
    items = [((rng.rand(96, 128, 3) * 255).astype(np.uint8),
              default_focal_K(96, 128)) for _ in range(2)]
    outs = list(pipeline.predict_stream(iter(items), ["chair"], chunk=4))
    assert len(outs) == 2
    outs_empty = list(pipeline.predict_stream(iter(items), [], chunk=4))
    assert len(outs_empty) == 2
    for d in outs_empty:
        assert not np.asarray(d.valid).any()


def test_predict_stream_mesh_matches_per_image():
    """Data-parallel streaming serve (chunk sharded one image per chip
    over the data mesh, per-chip sequential scan) must reproduce
    per-image fused predict() — same scale-1 construction as the
    single-chip stream test, over a 4-device mesh with a padded final
    chunk (6 images, chunk=4)."""
    import dataclasses as dc
    import sys

    sys.path.insert(0, "tests")
    from test_model import tiny_config

    from ovmono3d_tpu.parallel.mesh import make_mesh

    cfg = tiny_config()
    cfg = dc.replace(
        cfg, input=dc.replace(cfg.input, min_size_test=112,
                              max_size_test=112))
    gdino_kwargs = dict(
        hidden_dim=32, nheads=2, enc_layers=1, dec_layers=1, num_queries=16,
        enc_points=2, dec_points=2, max_text_len=32, ffn_dim=64,
        swin_embed_dim=8, swin_depths=(1, 1, 1, 1), swin_heads=(1, 2, 4, 8),
        swin_window=4, bert_layers=1,
    )
    p = OVMono3DLift.build(cfg, BertTokenizer(VOCAB),
                           gdino_kwargs=gdino_kwargs)
    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
    rng = np.random.RandomState(11)
    shapes = [(112, 112), (96, 112), (112, 80), (112, 112), (80, 112),
              (112, 96)]
    items = [((rng.rand(h, w, 3) * 255).astype(np.uint8),
              default_focal_K(h, w)) for h, w in shapes]
    cats = ["chair", "cup"]

    want = [p.predict(img, K, cats, fused=True) for img, K in items]
    got = list(p.predict_stream(iter(items), cats, chunk=4, mesh=mesh))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g.valid),
                                      np.asarray(w.valid))
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(w)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-5, atol=1e-5,
            )


def test_default_focal_heuristic():
    K = default_focal_K(480, 640)
    # f = 4 * h / 2 (demo.py:63-76)
    assert K[0, 0] == pytest.approx(960.0)
    assert K[0, 2] == pytest.approx(320.0)


def test_prep_gdino_canvas_shortest_edge(pipeline):
    """Config-built pipelines use the detectron2 ResizeShortestEdge(min,
    max) canvas geometry the reference feeds GroundingDINO
    (roi_heads_gdino.py:147): a 480x640 frame at (532, 896) becomes
    532x709 content on the square canvas — NOT longest-side 672x896."""
    import dataclasses as dc

    # the tiny fixture carries the config's min/max test sizes
    p = dc.replace(pipeline, gdino_min_size=30, gdino_max_size=56,
                   gdino_size=64)
    im = (np.random.RandomState(0).rand(48, 64, 3) * 255).astype(np.uint8)
    tensor, scale = p._prep_gdino_image(im)
    assert tensor.shape == (1, 64, 64, 3)
    # shortest edge 48 -> 30 gives scale 0.625; longest 64*0.625=40 <= 56
    np.testing.assert_allclose(scale, 30 / 48)
    nh, nw = round(48 * scale), round(64 * scale)
    # content occupies [:nh, :nw]; padding stays at the normalized zero
    pad_val = tensor[0, -1, -1]
    assert np.abs(tensor[0, :nh, :nw] - pad_val[None, None]).max() > 0
    assert np.allclose(tensor[0, nh:], pad_val)
    assert np.allclose(tensor[0, :, nw:], pad_val)

    # max-size cap: a very wide frame hits the max_size/longest rule
    im2 = (np.random.RandomState(1).rand(20, 80, 3) * 255).astype(np.uint8)
    _, scale2 = p._prep_gdino_image(im2)
    np.testing.assert_allclose(scale2, 56 / 80)

    # 2D-only construction (no config) keeps the longest-side rule
    p3 = dc.replace(pipeline, gdino_min_size=None, gdino_max_size=None,
                    gdino_size=64)
    _, scale3 = p3._prep_gdino_image(im)
    np.testing.assert_allclose(scale3, 64 / 64)
