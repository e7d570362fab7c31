"""Multi-chip GDINO serving: data-parallel batch vs per-image parity."""
import jax
import jax.numpy as jnp
import numpy as np

from ovmono3d_tpu.models.gdino.inference import detect_open_vocabulary
from ovmono3d_tpu.models.gdino.model import GroundingDINO
from ovmono3d_tpu.models.gdino.tokenizer import BertTokenizer
from ovmono3d_tpu.parallel.mesh import make_mesh
from ovmono3d_tpu.parallel.serve import detect_open_vocabulary_batch


def _tok():
    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, ".": 4,
             "chair": 5, "laptop": 6, "?": 7}
    return BertTokenizer(vocab)


def test_gdino_dp_serving_matches_per_image():
    model = GroundingDINO(
        hidden_dim=32, nheads=2, enc_layers=1, dec_layers=1, num_queries=16,
        enc_points=2, dec_points=2, max_text_len=32, ffn_dim=64,
        swin_embed_dim=8, swin_depths=(1, 1, 1, 1), swin_heads=(1, 2, 4, 8),
        swin_window=4, bert_layers=1, compute_dtype=jnp.float32,
    )
    tok = _tok()
    cats = ["chair", "laptop"]
    rng = np.random.RandomState(0)
    images = rng.rand(5, 64, 64, 3).astype(np.float32)

    from ovmono3d_tpu.models.gdino.inference import build_text_inputs

    text = build_text_inputs(tok, cats, max_len=32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(1),
        jnp.asarray(images[:1]),
        jnp.asarray(text["input_ids"]),
        jnp.asarray(text["text_mask"]),
        jnp.asarray(text["text_self_mask"]),
        jnp.asarray(text["position_ids"]),
    )

    mesh = make_mesh(n_data=8, n_model=1)
    got = detect_open_vocabulary_batch(
        model, params, images, tok, cats, mesh, topk=10
    )
    assert got["boxes"].shape == (5, 10, 4)

    for i in range(5):
        # build_text_inputs defaults to max_len=256; mirror the serving
        # path's 32-token budget by calling the model directly
        one = detect_open_vocabulary_one(model, params, images[i], text,
                                         topk=10)
        np.testing.assert_allclose(got["boxes"][i], one["boxes"],
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(got["scores"][i], one["scores"],
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_array_equal(got["valid"][i], one["valid"])


def detect_open_vocabulary_one(model, params, image, text, topk):
    """Single-image path with a fixed text budget (mirrors
    inference.detect_open_vocabulary with precomputed text inputs)."""
    from ovmono3d_tpu.models.gdino.inference import postprocess_grounding

    out = model.apply(
        params, jnp.asarray(image)[None],
        jnp.asarray(text["input_ids"]),
        jnp.asarray(text["text_mask"]),
        jnp.asarray(text["text_self_mask"]),
        jnp.asarray(text["position_ids"]),
    )
    h, w = image.shape[:2]
    boxes, scores, classes, valid = postprocess_grounding(
        out["pred_logits"][0], out["pred_boxes"][0],
        jnp.asarray(text["span_matrix"]),
        jnp.asarray(text["span_valid"]),
        jnp.asarray([h, w], jnp.float32), topk=topk,
    )
    return {
        "boxes": np.asarray(boxes), "scores": np.asarray(scores),
        "classes": np.asarray(classes), "valid": np.asarray(valid),
    }


def test_gather_objects_roundtrip():
    """Cross-host eval gather: the pack/pad/unpack pipeline reassembles
    per-host object lists exactly (single-process gather_objects is the
    identity; the multi-host payload path is exercised via its helpers)."""
    from ovmono3d_tpu.parallel.mesh import (
        _pack_objects,
        _unpack_objects,
        gather_objects,
    )

    items = [{"a": np.arange(5), "s": "x"}, (1, 2.5)]
    assert gather_objects(items) == gather_objects(items)
    assert len(gather_objects(items)) == 2

    # simulate 3 hosts with different payload sizes
    per_host = [items, [], [{"b": np.ones((2, 2))}]]
    payloads = [_pack_objects(h) for h in per_host]
    sizes = np.array([[p.size] for p in payloads])
    m = int(sizes.max())
    rows = np.zeros((3, m), np.uint8)
    for i, p in enumerate(payloads):
        rows[i, : p.size] = p
    out = _unpack_objects(sizes, rows)
    assert len(out) == 3
    np.testing.assert_array_equal(out[0]["a"], np.arange(5))
    np.testing.assert_array_equal(out[2]["b"], np.ones((2, 2)))
