"""GroundingDINO open-vocab inference glue: prompts -> padded 2D detections.

Re-design of the reference's grounding_dino_inference_detector +
get_grounding_output + phrase logit pooling (roi_heads_gdino.py:174-294):

  caption = ' . '.join(categories) -> tokenize -> model -> sigmoid token
  logits (Q, 256) -> per-phrase logits by SUMMING token logits over each
  phrase's token span -> max over phrases = score/class -> box_threshold
  filter -> cxcywh -> xyxy -> class-agnostic NMS @ 0.5 -> top-k.

All device work is fixed-shape; the host side only builds token ids/spans.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ovmono3d_tpu.models.gdino.bert import build_subsentence_masks
from ovmono3d_tpu.models.gdino.tokenizer import (
    BertTokenizer,
    phrase_token_spans,
)
from ovmono3d_tpu.ops.nms import nms_mask_parallel

BOX_THRESHOLD = 0.001   # roi_heads_gdino.py:148
NMS_THRESHOLD = 0.5     # roi_heads_gdino.py:254


def build_text_inputs(
    tok: BertTokenizer,
    categories: list[str],
    max_len: int = 256,
    max_phrases: int = 64,
):
    """Host-side prompt prep. Returns dict of numpy arrays:
    input_ids [1, T], text_mask [1, T], text_self_mask [1, T, T],
    span_matrix [P, T] (row c = indicator of category c's token span),
    span_valid [P].
    """
    if len(categories) > max_phrases:
        raise ValueError(
            f"{len(categories)} categories > max_phrases={max_phrases}; "
            "pass max_phrases=len(categories) (silently dropping the rest "
            "would zero their detections)"
        )
    ids, spans = phrase_token_spans(tok, categories, max_len)
    n = len(ids)
    input_ids = np.full((1, max_len), tok.pad_id, np.int32)
    input_ids[0, :n] = ids
    text_mask = np.zeros((1, max_len), bool)
    text_mask[0, :n] = True
    self_mask, position_ids = build_subsentence_masks(
        input_ids,
        special_ids=(tok.cls_id, tok.sep_id, tok.period_id,
                     tok.question_id),
    )
    span_matrix = np.zeros((max_phrases, max_len), np.float32)
    span_valid = np.zeros((max_phrases,), bool)
    for c, span in enumerate(spans[:max_phrases]):
        span_matrix[c, span] = 1.0
        span_valid[c] = len(span) > 0
    return {
        "input_ids": input_ids,
        "text_mask": text_mask,
        "text_self_mask": self_mask,
        "position_ids": position_ids,
        "span_matrix": span_matrix,
        "span_valid": span_valid,
    }


@partial(jax.jit, static_argnames=("topk",))
def postprocess_grounding(
    pred_logits: jax.Array,   # [Q, 256] raw
    pred_boxes: jax.Array,    # [Q, 4] cxcywh normalized
    span_matrix: jax.Array,   # [P, 256]
    span_valid: jax.Array,    # [P]
    im_hw: jax.Array,         # [2] (h, w) of the image the boxes refer to
    topk: int = 100,
    box_threshold: float = BOX_THRESHOLD,
    nms_threshold: float = NMS_THRESHOLD,
):
    """Token logits -> per-category detections (fixed shape).

    Returns (boxes [topk, 4] xyxy in pixels, scores [topk], classes [topk],
    valid [topk]).
    """
    probs = jax.nn.sigmoid(pred_logits)                     # (Q, 256)
    # HIGHEST precision: default f32 matmul uses bf16 passes on TPU and the
    # ~0.4% score error would flip detections at the 0.001 threshold; the
    # [Q, 256] x [256, P] dot is tiny so exactness is free.
    phrase_logits = jnp.matmul(
        probs, span_matrix.T, precision=jax.lax.Precision.HIGHEST
    )                                                       # (Q, P) sums
    phrase_logits = jnp.where(span_valid[None, :], phrase_logits, -1e9)
    scores = jnp.max(phrase_logits, axis=1)                 # (Q,)
    classes = jnp.argmax(phrase_logits, axis=1).astype(jnp.int32)

    h, w = im_hw[0], im_hw[1]
    cx, cy, bw, bh = (pred_boxes[:, 0] * w, pred_boxes[:, 1] * h,
                      pred_boxes[:, 2] * w, pred_boxes[:, 3] * h)
    boxes = jnp.stack(
        [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=-1
    )
    valid = scores > box_threshold
    # class-agnostic NMS (torchvision.ops.nms in the reference); the
    # parallel fixpoint form is bit-identical to the serial scan
    # (tests/test_nms.py) and converges in a few dense rounds instead of a
    # Q-step sequential fori_loop.
    keep = nms_mask_parallel(boxes, scores, nms_threshold, valid)
    neg_inf = jnp.finfo(scores.dtype).min
    masked = jnp.where(keep, scores, neg_inf)
    topk = min(topk, masked.shape[0])  # fewer queries than output slots
    top_scores, idx = jax.lax.top_k(masked, topk)
    out_valid = top_scores > box_threshold
    return (
        boxes[idx],
        jnp.where(out_valid, top_scores, 0.0),
        classes[idx],
        out_valid,
    )


def detect_open_vocabulary(
    model,
    params,
    image: jax.Array,        # [H, W, 3] normalized (ImageNet stats)
    tok: BertTokenizer,
    categories: list[str],
    topk: int = 100,
    swin_rel_biases: dict | None = None,
):
    """End-to-end open-vocab detection for one image; returns padded numpy
    detections in pixel coords of `image`. Pass
    swin.expand_rel_pos_biases(params['params']['backbone']) as
    `swin_rel_biases` (computed once per loaded checkpoint) to hoist the
    Swin bias gathers out of the forward (bit-identical)."""
    text = build_text_inputs(tok, categories)
    out = model.apply(
        params,
        image[None],
        jnp.asarray(text["input_ids"]),
        jnp.asarray(text["text_mask"]),
        jnp.asarray(text["text_self_mask"]),
        jnp.asarray(text["position_ids"]),
        swin_rel_biases,
    )
    h, w = image.shape[:2]
    boxes, scores, classes, valid = postprocess_grounding(
        out["pred_logits"][0],
        out["pred_boxes"][0],
        jnp.asarray(text["span_matrix"]),
        jnp.asarray(text["span_valid"]),
        jnp.asarray([h, w], jnp.float32),
        topk=topk,
    )
    return {
        "boxes": np.asarray(boxes),
        "scores": np.asarray(scores),
        "classes": np.asarray(classes),
        "valid": np.asarray(valid),
    }
