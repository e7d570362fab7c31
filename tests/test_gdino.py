"""GroundingDINO-JAX tests: deformable attention golden values, Swin shapes,
tokenizer/mask semantics, and a tiny end-to-end open-vocab smoke test."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ovmono3d_tpu.models.gdino.bert import (
    BertEncoder,
    build_subsentence_masks,
)
from ovmono3d_tpu.models.gdino.deformable import (
    deformable_attention_core,
    make_reference_points,
)
from ovmono3d_tpu.models.gdino.swin import SwinTransformer
from ovmono3d_tpu.models.gdino.tokenizer import (
    BertTokenizer,
    build_caption,
    phrase_token_spans,
)

VOCAB = {
    "[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, ".": 4,
    "chair": 5, "cup": 6, "cereal": 7, "box": 8, "lap": 9, "##top": 10,
    "shoes": 11,
}


def _tok():
    return BertTokenizer(VOCAB)


def test_tokenizer_wordpiece():
    tok = _tok()
    assert tok.tokenize_ids("chair") == [5]
    assert tok.tokenize_ids("laptop") == [9, 10]       # WordPiece split
    assert tok.tokenize_ids("cereal box") == [7, 8]
    assert tok.tokenize_ids("CHAIR.") == [5, 4]        # lowercase + punct
    assert tok.tokenize_ids("zzz") == [tok.unk]


def test_build_caption():
    assert build_caption(["Chair", "cereal box"]) == "chair . cereal box ."


def test_phrase_spans():
    tok = _tok()
    ids, spans = phrase_token_spans(tok, ["chair", "laptop", "cereal box"])
    # [CLS] chair . lap ##top . cereal box . [SEP]
    assert ids == [2, 5, 4, 9, 10, 4, 7, 8, 4, 3]
    assert spans == [[1], [3, 4], [6, 7]]


def test_subsentence_mask():
    tok = _tok()
    ids, _ = phrase_token_spans(tok, ["chair", "laptop"])
    arr = np.zeros((1, 12), np.int64)
    arr[0, : len(ids)] = ids
    mask, pos = build_subsentence_masks(
        arr, special_ids=(tok.cls_id, tok.sep_id, tok.period_id, tok.pad_id)
    )
    # chair (idx 1) attends to itself + its '.' (idx 2), not to laptop tokens.
    assert mask[0, 1, 1] and mask[0, 1, 2]
    assert not mask[0, 1, 3] and not mask[0, 1, 4]
    # laptop tokens (3, 4) attend to each other.
    assert mask[0, 3, 4] and mask[0, 4, 3]
    # position ids restart per span.
    assert pos[0, 3] == 0 and pos[0, 4] == 1


def test_deformable_attention_exact_center():
    # One level 4x4, one head, one point sampling exactly a cell center
    # must return that cell's value.
    B, H_, W_ = 1, 4, 4
    value = jnp.arange(H_ * W_, dtype=jnp.float32).reshape(1, H_ * W_, 1, 1)
    # sample the center of cell (row 2, col 1): normalized ((1+0.5)/4, (2+0.5)/4)
    loc = jnp.array([(1 + 0.5) / 4, (2 + 0.5) / 4]).reshape(1, 1, 1, 1, 1, 2)
    w = jnp.ones((1, 1, 1, 1, 1))
    out = deformable_attention_core(value, [(H_, W_)], loc, w)
    np.testing.assert_allclose(float(out[0, 0, 0]), 2 * 4 + 1, atol=1e-5)


def test_deformable_attention_bilinear_mix():
    value = jnp.arange(16, dtype=jnp.float32).reshape(1, 16, 1, 1)
    # halfway between cells (1,1) and (1,2): x_norm = (1.5+0.5)/4 = 0.5
    loc = jnp.array([0.5, (1 + 0.5) / 4]).reshape(1, 1, 1, 1, 1, 2)
    w = jnp.ones((1, 1, 1, 1, 1))
    out = deformable_attention_core(value, [(4, 4)], loc, w)
    np.testing.assert_allclose(float(out[0, 0, 0]), (5 + 6) / 2, atol=1e-5)


def test_deformable_outside_is_zero():
    value = jnp.ones((1, 16, 1, 1))
    loc = jnp.array([-0.5, 0.5]).reshape(1, 1, 1, 1, 1, 2)
    w = jnp.ones((1, 1, 1, 1, 1))
    out = deformable_attention_core(value, [(4, 4)], loc, w)
    np.testing.assert_allclose(float(out[0, 0, 0]), 0.0, atol=1e-6)


def test_deformable_multilevel_weights():
    v0 = jnp.full((1, 16, 1, 1), 1.0)
    v1 = jnp.full((1, 4, 1, 1), 3.0)
    value = jnp.concatenate([v0, v1], axis=1)
    loc = jnp.broadcast_to(jnp.array(0.5), (1, 1, 1, 2, 1, 2))
    w = jnp.array([0.25, 0.75]).reshape(1, 1, 1, 2, 1)
    out = deformable_attention_core(value, [(4, 4), (2, 2)], loc, w)
    np.testing.assert_allclose(float(out[0, 0, 0]), 0.25 * 1 + 0.75 * 3,
                               atol=1e-5)


def test_deformable_matmul_path_matches_gather_path():
    """The small-level separable-matmul sampler must match the window-gather
    sampler bit-tightly (both implement grid_sample align_corners=False with
    zero padding), including out-of-bounds and edge-straddling points."""
    from ovmono3d_tpu.models.gdino.deformable import (
        _bilinear_hw,
        _bilinear_matmul,
    )

    rng = np.random.RandomState(0)
    for (h, w) in ((25, 25), (13, 13), (5, 9), (1, 7)):
        # head-major internal layout: v [B, H, h, w, D]; x/y [B, H, Q, P]
        v = jnp.asarray(rng.rand(1, 2, h, w, 8), jnp.float32)
        x = jnp.asarray(rng.rand(1, 2, 300, 4) * (w * 1.2) - 0.1 * w,
                        jnp.float32)
        y = jnp.asarray(rng.rand(1, 2, 300, 4) * (h * 1.2) - 0.1 * h,
                        jnp.float32)
        got = np.asarray(jax.jit(_bilinear_matmul)(v, x, y))
        if h >= 2 and w >= 2:
            want = np.asarray(jax.jit(_bilinear_hw)(v, x, y))
        else:
            from ovmono3d_tpu.models.gdino.deformable import (
                _bilinear_hw_corners,
            )

            want = np.asarray(jax.jit(_bilinear_hw_corners)(v, x, y))
        np.testing.assert_allclose(got, want, atol=5e-7, err_msg=f"{h}x{w}")


def test_deformable_bf16_matmul_path_matches_gather():
    """The bf16 production path (value dtype bf16 -> bf16-weight one-pass
    matmul for levels <= _MATMUL_MAX_SIZE_BF16) must agree with the bf16
    window gather to value-quantization noise, and the core must route
    50^2-sized levels through it (the f32 threshold would send them to the
    gather)."""
    from ovmono3d_tpu.models.gdino.deformable import (
        _MATMUL_MAX_SIZE,
        _MATMUL_MAX_SIZE_BF16,
        _bilinear_hw,
        _bilinear_matmul,
    )

    # The production threshold covers the 50^2 level; the exact-f32 one
    # does not (probe-tuned constants — a typo here silently changes paths).
    assert _MATMUL_MAX_SIZE_BF16 >= 2500 > _MATMUL_MAX_SIZE

    rng = np.random.RandomState(1)
    for (h, w) in ((50, 50), (25, 25), (13, 13)):
        v32 = jnp.asarray(rng.rand(1, 2, h, w, 8), jnp.float32)
        v16 = v32.astype(jnp.bfloat16)
        x = jnp.asarray(rng.rand(1, 2, 300, 4) * (w * 1.2) - 0.1 * w,
                        jnp.float32)
        y = jnp.asarray(rng.rand(1, 2, 300, 4) * (h * 1.2) - 0.1 * h,
                        jnp.float32)
        got = np.asarray(jax.jit(_bilinear_matmul)(v16, x, y), np.float64)
        ref16 = np.asarray(jax.jit(_bilinear_hw)(v16, x, y), np.float64)
        ref32 = np.asarray(jax.jit(_bilinear_hw)(v32, x, y), np.float64)
        scale = np.abs(ref32).max() + 1e-9
        # vs the bf16 gather: each path applies its own independent bf16
        # weight/accumulator roundings (~2^-8 each), so they agree to a
        # couple of ulps of bf16, not exactly.
        assert np.abs(got - ref16).max() / scale < 1.5e-2, (h, w)
        # vs the exact f32 reference: bounded by bf16 value quantization.
        assert np.abs(got - ref32).max() / scale < 2e-2, (h, w)

    # End-to-end: a bf16 value tensor routes its 50^2 level through the
    # matmul path inside the core and still matches the f32 core closely.
    sh = [(50, 50)]
    val32 = jnp.asarray(rng.rand(1, 2500, 2, 8), jnp.float32)
    loc = jnp.asarray(rng.rand(1, 64, 2, 1, 4, 2), jnp.float32)
    wgt = jax.nn.softmax(
        jnp.asarray(rng.rand(1, 64, 2, 1, 4), jnp.float32), axis=-1
    )
    out32 = np.asarray(deformable_attention_core(val32, sh, loc, wgt))
    out16 = np.asarray(
        deformable_attention_core(val32.astype(jnp.bfloat16), sh, loc, wgt)
    )
    scale = np.abs(out32).max() + 1e-9
    assert np.abs(out32 - out16).max() / scale < 2e-2


def test_reference_points():
    refs = make_reference_points([(2, 2), (1, 1)])
    assert refs.shape == (5, 2, 2)
    np.testing.assert_allclose(np.asarray(refs[0, 0]), [0.25, 0.25], atol=1e-6)
    np.testing.assert_allclose(np.asarray(refs[4, 0]), [0.5, 0.5], atol=1e-6)


def test_swin_tiny_shapes():
    model = SwinTransformer(
        embed_dim=16, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8), window=4
    )
    img = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    out = jax.jit(model.apply)(params, img)
    assert out["s1"].shape == (1, 8, 8, 32)    # stride 8
    assert out["s2"].shape == (1, 4, 4, 64)    # stride 16
    assert out["s3"].shape == (1, 2, 2, 128)   # stride 32
    for v in out.values():
        assert np.all(np.isfinite(np.asarray(v)))


def test_swin_hoisted_bias_bit_identical():
    """expand_rel_pos_biases fast path == in-graph table expansion, bit for
    bit (stages down to the effective-window fallback at the 2x2 map)."""
    from ovmono3d_tpu.models.gdino.swin import expand_rel_pos_biases

    model = SwinTransformer(
        embed_dim=16, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8), window=4
    )
    img = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    base = jax.jit(model.apply)(params, img)
    biases = expand_rel_pos_biases(params["params"], window=4)
    assert len(biases) == 5  # every block got a table
    hoisted = jax.jit(model.apply)(params, img, biases)
    for k in base:
        np.testing.assert_array_equal(np.asarray(base[k]),
                                      np.asarray(hoisted[k]))


def test_swin_patch_embed_matches_conv():
    """The space-to-depth patch embed == the stride-4 nn.Conv it replaced,
    on the SAME params (kernel HWIO [4, 4, 3, C] + bias — converter layout
    unchanged). f32 compute so the comparison is exact up to accumulation
    order; bf16 end-to-end numerics stay covered by the HF crossval tests."""
    import flax.linen as nn

    from ovmono3d_tpu.models.vit import PatchEmbed

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    pe = PatchEmbed(4, 24, dtype=jnp.float32)
    params = pe.init(jax.random.PRNGKey(1), img)
    conv = nn.Conv(24, (4, 4), strides=(4, 4), dtype=jnp.float32)
    ref = conv.apply(params, img)   # identical param tree {kernel, bias}
    got = pe.apply(params, img)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref).reshape(2, 16, 24), rtol=1e-5,
        atol=1e-5,
    )


def test_bert_mask_isolation():
    model = BertEncoder(vocab_size=32, hidden=16, layers=1, heads=2,
                        intermediate=32, max_position=16)
    ids = jnp.array([[2, 5, 4, 9, 10, 4, 3, 0]])
    mask2d, _ = build_subsentence_masks(
        np.asarray(ids), special_ids=(2, 3, 4, 0)
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), ids, jnp.asarray(mask2d)
    )
    out1 = model.apply(params, ids, jnp.asarray(mask2d))
    # Changing the 'laptop' tokens must NOT change 'chair' output (isolated
    # by the sub-sentence mask).
    ids2 = ids.at[0, 3].set(11)
    out2 = model.apply(params, ids2, jnp.asarray(mask2d))
    np.testing.assert_allclose(
        np.asarray(out1[0, 1]), np.asarray(out2[0, 1]), atol=1e-5
    )
    assert not np.allclose(np.asarray(out1[0, 3]), np.asarray(out2[0, 3]))


def test_gdino_end_to_end_tiny():
    from ovmono3d_tpu.models.gdino.inference import (
        build_text_inputs,
        postprocess_grounding,
    )
    from ovmono3d_tpu.models.gdino.model import GroundingDINO

    model = GroundingDINO(
        hidden_dim=32, nheads=2, enc_layers=1, dec_layers=1, num_queries=20,
        enc_points=2, dec_points=2, max_text_len=32, ffn_dim=64,
        swin_embed_dim=8, swin_depths=(1, 1, 1, 1), swin_heads=(1, 2, 4, 8),
        swin_window=4, bert_layers=1,
    )
    tok = _tok()
    text = build_text_inputs(tok, ["chair", "laptop"], max_len=32,
                             max_phrases=8)
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(1), img,
        jnp.asarray(text["input_ids"][:, :32]),
        jnp.asarray(text["text_mask"][:, :32]),
        jnp.asarray(text["text_self_mask"][:, :32, :32]),
    )
    out = jax.jit(model.apply)(
        params, img,
        jnp.asarray(text["input_ids"][:, :32]),
        jnp.asarray(text["text_mask"][:, :32]),
        jnp.asarray(text["text_self_mask"][:, :32, :32]),
    )
    assert out["pred_logits"].shape == (1, 20, 32)
    assert out["pred_boxes"].shape == (1, 20, 4)
    b = np.asarray(out["pred_boxes"])
    assert np.all((b >= 0) & (b <= 1))
    boxes, scores, classes, valid = postprocess_grounding(
        out["pred_logits"][0], out["pred_boxes"][0],
        jnp.asarray(text["span_matrix"][:, :32]),
        jnp.asarray(text["span_valid"]),
        jnp.asarray([64.0, 64.0]), topk=10,
    )
    assert boxes.shape == (10, 4)
    assert np.all(np.asarray(classes)[np.asarray(valid)] < 2)
    assert np.all(np.isfinite(np.asarray(boxes)))


def test_deformable_levels_restriction():
    """The `levels` ablation knob: restricting to a subset must equal the
    full core with the skipped levels' attention weights zeroed."""
    rng = np.random.RandomState(3)
    shapes = [(4, 4), (2, 2)]
    value = jnp.asarray(rng.rand(1, 20, 2, 4), jnp.float32)
    loc = jnp.asarray(rng.rand(1, 6, 2, 2, 3, 2), jnp.float32)
    w = jnp.asarray(rng.rand(1, 6, 2, 2, 3), jnp.float32)
    only0 = deformable_attention_core(value, shapes, loc, w, levels=(0,))
    w_zeroed = w.at[:, :, :, 1, :].set(0.0)
    want = deformable_attention_core(value, shapes, loc, w_zeroed)
    np.testing.assert_allclose(np.asarray(only0), np.asarray(want),
                               atol=1e-6)
