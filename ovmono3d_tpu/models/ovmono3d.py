"""OVMono3D-LIFT full open-vocabulary pipeline: text prompts -> 3D cuboids.

Orchestrates the two models the way the reference's ROIHeads3DGDINO does at
inference (roi_heads_gdino.py:93-171; SURVEY.md §3.3):

  1. GroundingDINO on the (ImageNet-normalized) image with the
     ' . '-joined category caption -> open-vocab 2D boxes/classes/scores.
  2. The RCNN3D cube branch on those boxes (the oracle path) -> camera-space
     cuboids, with score fusion sqrt(s2d * conf).

Host code only builds prompts and resizes; all heavy work is two jitted
device programs. Empty prompts / no detections degrade to all-invalid
padded outputs (reference empty-Instances fallback, roi_heads_gdino.py:
134-139).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ovmono3d_tpu.config import Config
from ovmono3d_tpu.models.gdino.inference import (
    build_text_inputs,
    postprocess_grounding,
)
from ovmono3d_tpu.models.gdino.model import GroundingDINO
from ovmono3d_tpu.models.gdino.tokenizer import BertTokenizer
from ovmono3d_tpu.models.rcnn3d import RCNN3D, build_model
from ovmono3d_tpu.structures import Detections

# GroundingDINO preprocessing (ImageNet stats on 0-1 images).
GDINO_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
GDINO_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _init_gdino(tokenizer: "BertTokenizer", rng: jax.Array,
                gdino_kwargs: dict | None, gdino_size: int):
    """Init a GroundingDINO + params at the detector input size."""
    gdino = GroundingDINO(**(gdino_kwargs or {}))
    text = build_text_inputs(tokenizer, ["thing"],
                             max_len=gdino.max_text_len)
    gdino_params = jax.jit(gdino.init)(
        rng,
        jnp.zeros((1, gdino_size, gdino_size, 3)),
        jnp.asarray(text["input_ids"][:, : gdino.max_text_len]),
        jnp.asarray(text["text_mask"][:, : gdino.max_text_len]),
        jnp.asarray(
            text["text_self_mask"][:, : gdino.max_text_len,
                                   : gdino.max_text_len]
        ),
    )
    return gdino, gdino_params


@dataclasses.dataclass
class OVMono3DLift:
    """Bundles the two models + params for end-to-end inference."""

    cfg: Config
    rcnn: RCNN3D
    rcnn_params: dict
    gdino: GroundingDINO
    gdino_params: dict
    tokenizer: BertTokenizer
    gdino_size: int = 800   # square input side for the detector
    # Shortest-edge resize rule for the content placed on the square canvas
    # (detectron2 ResizeShortestEdge(MIN_SIZE_TEST, MAX_SIZE_TEST) — the
    # reference feeds GroundingDINO the SAME canvas the RCNN sees,
    # roi_heads_gdino.py:147). None = legacy longest-side-to-canvas rule.
    gdino_min_size: int | None = None
    gdino_max_size: int | None = None
    # 2D-stage slots: the reference keeps EVERY box passing threshold+NMS
    # (roi_heads_gdino.py:252-257, no cap); 300 slots let the final ranking
    # happen on the fused sqrt(s2d*conf) score downstream instead of
    # pre-truncating by 2D score at 100.
    detect_topk: int = 300
    _jit_cache: dict = dataclasses.field(default_factory=dict)

    def _jitted(self, name: str, fn):
        """Cache jitted callables — re-wrapping apply in jax.jit per call
        would recompile every invocation."""
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]

    def _swin_rel_biases(self):
        """Precomputed Swin rel-pos biases for the current gdino_params
        (swin.expand_rel_pos_biases — bit-identical frozen-trunk fast
        path), recomputed if the params object is swapped (ckpt load)."""
        from ovmono3d_tpu.models.gdino.swin import expand_rel_pos_biases

        cached = self._jit_cache.get("_rel_biases")
        # `is` on the stored params object (NOT id(): holding only an int
        # key would let CPython reuse the address after a ckpt swap and
        # silently serve checkpoint A's biases with checkpoint B).
        if cached is None or cached[0] is not self.gdino_params:
            biases = jax.tree.map(
                jnp.asarray,  # commit to device ONCE, reuse across calls
                expand_rel_pos_biases(
                    self.gdino_params["params"]["backbone"],
                    window=self.gdino.swin_window,
                ),
            )
            self._jit_cache["_rel_biases"] = (self.gdino_params, biases)
            return biases
        return cached[1]

    @classmethod
    def build(cls, cfg: Config, tokenizer: BertTokenizer,
              rng: jax.Array | None = None, gdino_kwargs: dict | None = None,
              gdino_size: int | None = None, priors: dict | None = None):
        """Construct with freshly-initialized params (converters fill real
        weights via utils.checkpoint_convert; `priors` as produced by
        utils.priors.compute_priors or utils.lift_convert.extract_priors
        enables the dims-priors / cluster-z decodes).

        `gdino_size` defaults to the RCNN square pad: the reference feeds
        GroundingDINO the SAME preprocessed square canvas as the cube model
        (roi_heads_gdino.py:147 passes images[0] channel-swapped), so
        open-vocab detection runs at cfg.model.backbone.square_pad (896
        for the flagship config), not a separate resolution.

        Known reference defect NOT replicated: the [2,1,0] channel swap at
        roi_heads_gdino.py:147 assumes detectron2's default BGR input, but
        every ViT config sets INPUT.FORMAT=RGB — the reference therefore
        feeds GroundingDINO BGR images. We feed RGB (the detector's
        training colorspace)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if gdino_size is None:
            gdino_size = cfg.model.backbone.square_pad
        rcnn = build_model(cfg.model, priors=priors)
        S = cfg.model.backbone.square_pad
        k1, k2 = jax.random.split(rng)
        rcnn_params = jax.jit(rcnn.init)(
            k1,
            jnp.zeros((1, S, S, 3)),
            jnp.eye(3)[None],
            jnp.full((1, 2), S, jnp.int32),
            jnp.ones((1,)),
        )
        gdino, gdino_params = _init_gdino(tokenizer, k2, gdino_kwargs,
                                          gdino_size)
        return cls(cfg, rcnn, rcnn_params, gdino, gdino_params, tokenizer,
                   gdino_size=gdino_size,
                   gdino_min_size=cfg.input.min_size_test,
                   gdino_max_size=cfg.input.max_size_test)

    @classmethod
    def build_2d_only(cls, tokenizer: BertTokenizer,
                      rng: jax.Array | None = None,
                      gdino_kwargs: dict | None = None,
                      gdino_size: int = 800):
        """Detector-only construction (no cube model): serves `detect_2d`
        for tools that just need open-vocab 2D boxes, e.g. generating the
        oracle-2D detection JSONs the eval protocol consumes (the
        reference's precomputed ORACLE2D_FILES, config.py:41-76)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        gdino, gdino_params = _init_gdino(tokenizer, rng, gdino_kwargs,
                                          gdino_size)
        return cls(None, None, None, gdino, gdino_params, tokenizer,
                   gdino_size=gdino_size)

    # -- stages ---------------------------------------------------------------

    def _gdino_content_geometry(self, h: int, w: int):
        """(nh, nw, scale) of the content placed on the GDINO canvas.

        With gdino_min_size set, detectron2's ResizeShortestEdge(min, max)
        rule — the EXACT canvas geometry the reference feeds GroundingDINO
        (roi_heads_gdino.py:147 passes the detectron2-preprocessed
        square-pad image, so e.g. a 480x640 frame becomes 532x709 content
        on the 896 canvas, NOT 672x896). Without it, falls back to
        longest-side-to-canvas. Rounds half-UP like detectron2's
        int(x + 0.5) (and the mapper's resize_shortest_edge) — Python's
        banker's round() disagrees at exact .5 products, shifting the
        canvas content by a pixel."""
        S = self.gdino_size
        if self.gdino_min_size:
            scale = self.gdino_min_size / min(h, w)
            max_size = self.gdino_max_size or S
            if max(h, w) * scale > max_size:
                scale = max_size / max(h, w)
            # content can never exceed the canvas (real configs have
            # max_size == square_pad == S; tiny test configs may not)
            scale = min(scale, S / max(h, w))
        else:
            scale = S / max(h, w)
        nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
        return min(nh, S), min(nw, S), scale

    def _prep_gdino_image(self, image: np.ndarray):
        """Place the resized content on the square canvas, normalize.
        Returns (tensor [1, S, S, 3], scale original->tensor)."""
        import cv2

        S = self.gdino_size
        h, w = image.shape[:2]
        nh, nw, scale = self._gdino_content_geometry(h, w)
        resized = cv2.resize(image.astype(np.float32) / 255.0, (nw, nh))
        canvas = np.zeros((S, S, 3), np.float32)
        canvas[:nh, :nw] = (resized - GDINO_MEAN) / GDINO_STD
        return canvas[None], scale

    def detect_2d(self, image: np.ndarray, categories: list[str]):
        """Open-vocab 2D detection; boxes in ORIGINAL image pixels."""
        if not categories:
            z = np.zeros((self.detect_topk,))
            return {
                "boxes": np.zeros((self.detect_topk, 4), np.float32),
                "scores": z.astype(np.float32),
                "classes": np.zeros((self.detect_topk,), np.int32),
                "valid": np.zeros((self.detect_topk,), bool),
            }
        dev, scale = self._detect_2d_device(image, categories)
        return {
            "boxes": np.asarray(dev["boxes"]) / scale,
            "scores": np.asarray(dev["scores"]),
            "classes": np.asarray(dev["classes"]),
            "valid": np.asarray(dev["valid"]),
        }

    def _detect_fn(self, params, tensor, input_ids, text_mask, self_mask,
                   pos_ids, biases, span_matrix, span_valid):
        """Forward + postprocess as ONE jittable graph: running
        postprocess_grounding eagerly dispatched each op over the tunnel
        (the parallel-NMS while_loop alone is dozens of round-trips) and
        cost ~300 ms/image of the e2e pipeline (tools/bench_lift.py found
        it).

        pred_logits are padded to max_text_len by the model; the span
        matrix is already full-length (token positions beyond the text
        bucket are masked to -1e9 logits -> sigmoid ~ 0, and their span
        entries are zero anyway). pred_boxes are normalized to the PADDED
        square; rescaled here with the padded size — division by the
        content resize scale to original pixels happens on host."""
        out = self.gdino.apply(
            params, tensor, input_ids, text_mask, self_mask, pos_ids,
            biases,
        )
        return postprocess_grounding(
            out["pred_logits"][0],
            out["pred_boxes"][0],
            span_matrix,
            span_valid,
            jnp.asarray([self.gdino_size, self.gdino_size], jnp.float32),
            topk=self.detect_topk,
        )

    def _detect_2d_device(self, image: np.ndarray, categories: list[str]):
        """detect_2d, but the outputs stay ON DEVICE (boxes in gdino-canvas
        pixels) so predict() can feed them straight to the lift graph
        without a host round trip — on the tunneled TPU the detect->lift
        host sync costs a full readback+upload+dispatch-latency cycle.
        Returns (dict of device arrays, gdino content scale)."""
        if not categories:
            z = jnp.zeros((self.detect_topk,))
            return {
                "boxes": jnp.zeros((self.detect_topk, 4), jnp.float32),
                "scores": z.astype(jnp.float32),
                "classes": jnp.zeros((self.detect_topk,), jnp.int32),
                "valid": jnp.zeros((self.detect_topk,), bool),
            }, 1.0
        tensor, scale = self._prep_gdino_image(image)
        (input_ids, text_mask, self_mask, pos_ids, span_matrix,
         span_valid) = self._text_device_inputs(categories)
        boxes, scores, classes, valid = self._jitted("gdino_detect",
                                                     self._detect_fn)(
            self.gdino_params,
            jnp.asarray(tensor),
            input_ids, text_mask, self_mask, pos_ids,
            self._swin_rel_biases(),
            span_matrix, span_valid,
        )
        return {"boxes": boxes, "scores": scores, "classes": classes,
                "valid": valid}, scale

    def _detect_stream_fn(self, params, canvases, hws, input_ids,
                          text_mask, self_mask, pos_ids, biases,
                          span_matrix, span_valid):
        """Chunked detect-only serve (the predict_stream design minus the
        cube lift): one lax.scan dispatch per chunk of uint8 canvases,
        in-graph content normalization, one small readback. Drives
        generate_oracle2d's dataset sweeps — the reference's ORACLE2D
        JSONs are exactly such a whole-dataset GDINO pass
        (/root/reference/cubercnn/config/config.py:41-76)."""
        S = self.gdino_size

        def body(carry, x):
            canvas, hw = x
            tensor = self._gdino_normalize(
                canvas[None].astype(jnp.float32), hw[None]
            )
            out = self.gdino.apply(
                params, tensor, input_ids, text_mask, self_mask, pos_ids,
                biases,
            )
            res = postprocess_grounding(
                out["pred_logits"][0], out["pred_boxes"][0],
                span_matrix, span_valid,
                jnp.asarray([S, S], jnp.float32), topk=self.detect_topk,
            )
            return carry, res

        _, res = jax.lax.scan(body, 0, (canvases, hws))
        return res

    def detect_2d_stream(self, images, categories: list[str],
                         chunk: int = 8):
        """Sustained open-vocab 2D detection: generator over images
        yielding detect_2d-shaped dicts (boxes in ORIGINAL pixels).
        Same submit-ahead chunked-scan driver as predict_stream; works on
        build_2d_only pipelines (no cube model needed). Content pixels
        are quantized to uint8 on the canvas (reference preprocessing
        resizes uint8 images; 4x fewer upload bytes)."""
        import cv2

        if not categories:
            for image in images:
                yield self.detect_2d(image, [])
            return
        (input_ids, text_mask, self_mask, pos_ids, span_matrix,
         span_valid) = self._text_device_inputs(categories)
        biases = self._swin_rel_biases()
        fn = self._jitted(f"detect_stream_{chunk}", self._detect_stream_fn)
        S = self.gdino_size

        def prep(image):
            h, w = image.shape[:2]
            nh, nw, scale = self._gdino_content_geometry(h, w)
            resized = cv2.resize(image.astype(np.float32), (nw, nh))
            canvas = np.zeros((S, S, 3), np.uint8)
            canvas[:nh, :nw] = np.clip(np.rint(resized), 0, 255)
            return (canvas, np.array([nh, nw], np.int32),
                    np.float32(scale))

        def dispatch(cols, count):
            canv, hws, scales = cols
            res = fn(
                self.gdino_params, jnp.asarray(canv),
                jnp.asarray(hws, jnp.int32), input_ids, text_mask,
                self_mask, pos_ids, biases, span_matrix, span_valid,
            )
            return res, count, scales

        def emit(entry):
            res, count, scales = entry
            boxes, scores, classes, valid = jax.device_get(res)
            for i in range(count):
                yield {
                    "boxes": boxes[i] / scales[i],
                    "scores": scores[i],
                    "classes": classes[i],
                    "valid": valid[i],
                }

        yield from self._stream_drive(images, prep, dispatch, emit, chunk)

    def _gdino_normalize(self, canvas, hw):
        """In-graph GDINO canvas normalization, batched: content pixels
        get (x/255 - mean)/std, padding stays exactly 0 (matching
        _prep_gdino_image's zero-padded host canvas). canvas [B, S, S, 3]
        raw-pixel float, hw [B, 2] content (nh, nw)."""
        S = self.gdino_size
        rows = jnp.arange(S)[None, :, None] < hw[:, 0][:, None, None]
        cols = jnp.arange(S)[None, None, :] < hw[:, 1][:, None, None]
        content = rows & cols
        mean = jnp.asarray(GDINO_MEAN)
        std = jnp.asarray(GDINO_STD)
        return jnp.where(
            content[..., None], (canvas / 255.0 - mean) / std, 0.0
        )

    def _stream_drive(self, items, prep, dispatch, emit, chunk: int):
        """Shared submit-ahead chunked-stream driver (predict_stream /
        detect_2d_stream). prep(item) -> per-item tuple of arrays;
        dispatch(stacked_columns, count) -> in-flight handle (device
        work already dispatched); emit(handle) -> iterator of per-image
        results. Keeps exactly ONE chunk in flight: while the device
        runs chunk i the host preps chunk i+1 and only then fetches
        chunk i-1, so host work and relay latency hide behind device
        execution. The final partial chunk is padded with its last row
        (dispatch receives the real `count`)."""
        bufs: list[tuple] = []
        pending = None

        def _go():
            count = len(bufs)
            rows = bufs + [bufs[-1]] * (chunk - count)
            cols = [np.stack(c) for c in zip(*rows)]
            return dispatch(cols, count)

        for item in items:
            bufs.append(prep(item))
            if len(bufs) == chunk:
                done, pending = pending, _go()
                bufs.clear()
                if done is not None:
                    yield from emit(done)
        if bufs:
            done, pending = pending, _go()
            if done is not None:
                yield from emit(done)
        if pending is not None:
            yield from emit(pending)

    def _fusable(self) -> bool:
        """True when detect and lift consume the SAME square canvas, so
        predict() can run both stages as one jitted program fed by one
        upload. That requires the full pipeline (cube model present), the
        detector input side == the RCNN square pad, and the same
        ResizeShortestEdge(min,max) content rule on both canvases (build()
        sets exactly this — roi_heads_gdino.py:147 feeds GroundingDINO the
        RCNN's preprocessed canvas, so the e2e configuration is always
        fusable)."""
        return (
            self.rcnn is not None
            and self.cfg is not None
            and self.gdino_size == self.cfg.model.backbone.square_pad
            and self.gdino_min_size == self.cfg.input.min_size_test
            and self.gdino_max_size == self.cfg.input.max_size_test
        )

    def _fused_fn(self, gdino_params, rcnn_params, canvas, K, hw, ratio,
                  depth, input_ids, text_mask, self_mask, pos_ids, biases,
                  span_matrix, span_valid):
        """Detect + postprocess + lift as ONE XLA program fed by ONE
        raw-pixel canvas upload (round-4 perf item: the two-dispatch
        predict() paid two multi-MB canvas uploads + two relay sync
        latencies per image; both stages consume the same square canvas
        in the e2e configuration, roi_heads_gdino.py:147).

        The GDINO tensor is derived in-graph (_gdino_normalize: content
        pixels get (x/255 - mean)/std, padding stays exactly 0 —
        matching _prep_gdino_image's zero-padded canvas, NOT normalized
        zeros). Boxes come out of postprocess in canvas pixels —
        box_scale is 1 by construction, so they feed the cube branch
        directly."""
        S = self.gdino_size
        tensor = self._gdino_normalize(canvas, hw)
        out = self.gdino.apply(
            gdino_params, tensor, input_ids, text_mask, self_mask, pos_ids,
            biases,
        )
        boxes, scores, classes, valid = postprocess_grounding(
            out["pred_logits"][0],
            out["pred_boxes"][0],
            span_matrix,
            span_valid,
            jnp.asarray([S, S], jnp.float32),
            topk=self.detect_topk,
        )
        return self.rcnn.apply(
            rcnn_params, canvas, K, hw, ratio, depth,
            oracle_boxes=boxes[None],
            oracle_classes=classes[None],
            oracle_scores=scores[None],
            oracle_valid=valid[None],
        )

    def _fused_fn_batch(self, gdino_params, rcnn_params, canvas, K, hw,
                        ratio, input_ids, text_mask, self_mask, pos_ids,
                        biases, span_matrix, span_valid):
        """_fused_fn over a BATCH of images (per-image content masks,
        vmapped postprocess — serve.py's pattern). Exists for the
        data-parallel streaming path where the batch is sharded one image
        per chip over the mesh's data axis: on-chip batching of GDINO is
        counterproductive (b4 = 6.18 img/s vs 4 chips x 12.05,
        tools/bench_gdino.py), but across chips each image's program is
        independent — no collectives in the hot path."""
        S = self.gdino_size
        B = canvas.shape[0]
        tensor = self._gdino_normalize(canvas, hw)
        out = self.gdino.apply(
            gdino_params, tensor,
            jnp.broadcast_to(input_ids, (B,) + input_ids.shape[1:]),
            jnp.broadcast_to(text_mask, (B,) + text_mask.shape[1:]),
            jnp.broadcast_to(self_mask, (B,) + self_mask.shape[1:]),
            jnp.broadcast_to(pos_ids, (B,) + pos_ids.shape[1:]),
            biases,
        )
        boxes, scores, classes, valid = jax.vmap(
            lambda lg, bx: postprocess_grounding(
                lg, bx, span_matrix, span_valid,
                jnp.asarray([S, S], jnp.float32), topk=self.detect_topk,
            )
        )(out["pred_logits"], out["pred_boxes"])
        return self.rcnn.apply(
            rcnn_params, canvas, K, hw, ratio, None,
            oracle_boxes=boxes,
            oracle_classes=classes,
            oracle_scores=scores,
            oracle_valid=valid,
        )

    def _text_device_inputs(self, categories: list[str]):
        """Tokenize once at full max_text_len, bucket to the smallest
        power-of-two >= the caption length (one jit specialization per
        bucket — mirrors the reference's actual-caption-length execution,
        roi_heads_gdino.py:176-181). Returns the jit-ready text arrays."""
        full = self.gdino.max_text_len
        text = build_text_inputs(self.tokenizer, categories, max_len=full,
                                 max_phrases=max(64, len(categories)))
        n_tok = int(text["text_mask"][0].sum())
        T = 32
        while T < n_tok and T < full:
            T *= 2
        T = min(T, full)
        return (
            jnp.asarray(text["input_ids"][:, :T]),
            jnp.asarray(text["text_mask"][:, :T]),
            jnp.asarray(text["text_self_mask"][:, :T, :T]),
            jnp.asarray(text["position_ids"][:, :T]),
            jnp.asarray(text["span_matrix"]),
            jnp.asarray(text["span_valid"]),
        )

    def _prep_lift_canvas(self, image: np.ndarray):
        """Shortest-edge resize + top-left square pad for the cube model.
        Returns (canvas [S, S, 3] f32 raw-pixel, (nh, nw), scale)."""
        from ovmono3d_tpu.data.mapper import resize_shortest_edge

        import cv2

        S = self.cfg.model.backbone.square_pad
        h, w = image.shape[:2]
        nh, nw, scale = resize_shortest_edge(
            (h, w), self.cfg.input.min_size_test,
            min(self.cfg.input.max_size_test, S),
        )
        resized = cv2.resize(image.astype(np.float32), (nw, nh))
        canvas = np.zeros((S, S, 3), np.float32)
        canvas[:nh, :nw] = resized
        return canvas, (nh, nw), scale

    def _lift_fn(self, params, canvas, K, hw, ratio, depth, boxes,
                 classes, scores, valid, box_scale):
        """Jittable lift graph; `boxes * box_scale` happens IN-GRAPH so
        detect outputs can flow device-to-device (predict() never syncs
        between the two stages — on the tunneled TPU the intermediate
        readback+upload+dispatch cycle is pure latency)."""
        return self.rcnn.apply(
            params, canvas, K, hw, ratio, depth,
            oracle_boxes=boxes[None] * box_scale,
            oracle_classes=classes[None],
            oracle_scores=scores[None],
            oracle_valid=valid[None],
        )

    def _lift_canvas_det(self, canvas, hw, scale, K, boxes, classes,
                         scores, valid, box_scale,
                         depth: np.ndarray | None = None) -> Detections:
        """Run the jitted lift graph on a prepared canvas. `boxes` may be
        device arrays (fused predict path) or numpy; coordinates are
        boxes * box_scale in CANVAS pixels.

        Lifts EVERY 2D slot (the reference keeps every box passing
        threshold+NMS, roi_heads_gdino.py:252-257 — no cap): truncating
        to max_detections here would pre-rank by 2D score and drop boxes
        whose fused sqrt(s2d*conf) score belongs in the final ranking,
        defeating detect_topk's purpose (see its field comment)."""
        nh, nw = hw
        depth_t = None
        if depth is not None:
            depth_t = jnp.asarray(depth, jnp.float32)[None, ..., None]
        det = self._jitted("rcnn_lift", self._lift_fn)(
            self.rcnn_params,
            jnp.asarray(canvas)[None],
            jnp.asarray(K, jnp.float32)[None],
            jnp.asarray([[nh, nw]], jnp.int32),
            jnp.asarray([1.0 / scale], jnp.float32),
            depth_t,
            jnp.asarray(boxes, jnp.float32),
            jnp.asarray(classes, jnp.int32),
            jnp.asarray(scores, jnp.float32),
            jnp.asarray(valid, bool),
            jnp.asarray(box_scale, jnp.float32),
        )
        return jax.tree.map(lambda x: x[0] if x is not None else None, det,
                            is_leaf=lambda x: x is None)

    def lift_3d(
        self,
        image: np.ndarray,
        K: np.ndarray,
        det2d: dict,
        depth: np.ndarray | None = None,
    ) -> Detections:
        """Cube-branch lifting of given 2D detections (original px coords)."""
        canvas, hw, scale = self._prep_lift_canvas(image)
        return self._lift_canvas_det(
            canvas, hw, scale, K,
            np.asarray(det2d["boxes"], np.float32),
            np.asarray(det2d["classes"], np.int32),
            np.asarray(det2d["scores"], np.float32),
            np.asarray(det2d["valid"], bool),
            box_scale=scale, depth=depth,
        )

    def _stream_fn(self, gdino_params, rcnn_params, canvases, Ks, hws,
                   ratios, input_ids, text_mask, self_mask, pos_ids,
                   biases, span_matrix, span_valid):
        """Chunked streaming serve: ONE dispatch runs the fused
        detect+postprocess+lift program over a stacked chunk of images
        via lax.scan. Images run SEQUENTIALLY on device (the per-image
        b1 optimum — batching the GDINO encoder measured SLOWER on-chip,
        b4 = 6.18 img/s vs b1 = 12.05, tools/bench_gdino.py), while the
        host pays one upload + one completion sync + one small readback
        per CHUNK instead of per image — on the tunneled link the
        per-sync relay latency (30-250 ms tails, growing over sustained
        runs) was the entire gap between blocking p50 (301 ms) and the
        chained device floor (123 ms), so amortizing it 1/chunk is the
        whole point. Canvases ride uint8 (4x fewer upload bytes; the
        reference's detectron2 preprocessing resizes uint8 images, so
        integer canvases are the faithful feed,
        /root/reference/cubercnn/data/dataset_mapper.py:61-77)."""

        def body(carry, x):
            canvas, K, hw, ratio = x
            det = self._fused_fn(
                gdino_params, rcnn_params,
                canvas[None].astype(jnp.float32), K[None], hw[None],
                ratio[None], None, input_ids, text_mask, self_mask,
                pos_ids, biases, span_matrix, span_valid,
            )
            return carry, jax.tree.map(lambda l: l[0], det)

        _, dets = jax.lax.scan(body, 0, (canvases, Ks, hws, ratios))
        return dets

    def predict_stream(self, items, categories: list[str], chunk: int = 8,
                       mesh=None):
        """Sustained-throughput serving driver: generator over
        (image, K) pairs yielding one HOST Detections per image.

        Submit-ahead pipeline, depth = one chunk: while the device runs
        chunk i, the host preps chunk i+1's canvases (cv2 resize, ~14
        ms/img) and only then fetches chunk i-1's results, so host work
        and relay latency hide behind device execution. The reference's
        own throughput protocol is exactly such a sustained loop, not
        per-image blocking (/root/reference/cubercnn/evaluation/
        omni3d_evaluation.py:626-715).

        With `mesh`, the chunk (must divide by the mesh's data size) is
        sharded one image per chip and each chip scans its share
        sequentially (parallel/serve.py make_lift_stream_fn) — chunk
        throughput ≈ n_data x single-chip. Depth prompts are not plumbed
        here (use predict(); the GEO/demo paths need per-image depth
        anyway); non-fusable configurations degrade to per-image
        predict()."""
        if not (categories and self._fusable()):
            for image, K in items:
                yield self.predict(image, K, categories)
            return
        text = self._text_device_inputs(categories)
        biases = self._swin_rel_biases()
        if mesh is not None:
            from ovmono3d_tpu.parallel.mesh import replicated
            from ovmono3d_tpu.parallel.serve import make_lift_stream_fn

            n_data = mesh.shape["data"]
            assert chunk % n_data == 0, (chunk, n_data)
            # Cache keyed on the mesh OBJECT (`is`, not id() — CPython
            # reuses addresses after GC; same rationale as
            # _swin_rel_biases), holding the compiled fn AND the
            # mesh-replicated param trees so repeated streams don't
            # re-upload hundreds of MB of weights per call.
            key = f"stream_mesh_{chunk}"
            cached = self._jit_cache.get(key)
            if (cached is None or cached[0] is not mesh
                    or cached[1] is not self.gdino_params
                    or cached[2] is not self.rcnn_params):
                repl = replicated(mesh)
                cached = (
                    mesh, self.gdino_params, self.rcnn_params,
                    make_lift_stream_fn(self, mesh, chunk // n_data),
                    jax.device_put(self.gdino_params, repl),
                    jax.device_put(self.rcnn_params, repl),
                )
                self._jit_cache[key] = cached
            mesh_fn, gparams, rparams = cached[3], cached[4], cached[5]
            repl = replicated(mesh)
            text_r = jax.device_put(tuple(text), repl)
            biases_r = jax.device_put(biases, repl)
        fn = (None if mesh is not None
              else self._jitted(f"stream_{chunk}", self._stream_fn))

        def prep(item):
            image, K = item
            canvas, (nh, nw), scale = self._prep_lift_canvas(image)
            return (
                np.clip(np.rint(canvas), 0, 255).astype(np.uint8),
                np.asarray(K, np.float32),
                np.array([nh, nw], np.int32),
                np.float32(1.0 / scale),
            )

        def dispatch(cols, count):
            canv, Ks, hws, rats = cols
            if mesh is not None:
                dets = mesh_fn(
                    gparams, rparams,
                    canv, Ks.astype(np.float32), hws.astype(np.int32),
                    rats.astype(np.float32), text_r, biases_r,
                )
                return dets, count
            dets = fn(
                self.gdino_params, self.rcnn_params,
                jnp.asarray(canv), jnp.asarray(Ks, jnp.float32),
                jnp.asarray(hws, jnp.int32), jnp.asarray(rats, jnp.float32),
                text[0], text[1], text[2], text[3], biases,
                text[4], text[5],
            )
            return dets, count

        def emit(entry):
            dets, count = entry
            host = jax.device_get(dets)
            for i in range(count):
                yield jax.tree.map(lambda x: x[i], host)

        yield from self._stream_drive(items, prep, dispatch, emit, chunk)

    def predict(
        self,
        image: np.ndarray,
        K: np.ndarray,
        categories: list[str],
        depth: np.ndarray | None = None,
        fused: bool | None = None,
    ) -> Detections:
        """Full pipeline: prompts -> 2D open-vocab boxes -> 3D cuboids.

        In the e2e configuration (detector side == square pad, same
        resize rule — always true via build()) this runs detect +
        postprocess + lift as ONE jitted program fed by ONE raw-canvas
        upload (`_fused_fn`): one dispatch, one relay sync, half the
        per-image feed bytes of the two-stage path. `fused=False` forces
        the two-stage path (detect outputs stay on device and feed the
        lift graph directly — still no intermediate host sync); the
        parity test pins both paths equal."""
        if fused is None:
            fused = self._fusable()
        if fused and categories:
            canvas, (nh, nw), scale = self._prep_lift_canvas(image)
            (input_ids, text_mask, self_mask, pos_ids, span_matrix,
             span_valid) = self._text_device_inputs(categories)
            depth_t = None
            if depth is not None:
                depth_t = jnp.asarray(depth, jnp.float32)[None, ..., None]
            det = self._jitted("fused_predict", self._fused_fn)(
                self.gdino_params,
                self.rcnn_params,
                jnp.asarray(canvas)[None],
                jnp.asarray(K, jnp.float32)[None],
                jnp.asarray([[nh, nw]], jnp.int32),
                jnp.asarray([1.0 / scale], jnp.float32),
                depth_t,
                input_ids, text_mask, self_mask, pos_ids,
                self._swin_rel_biases(),
                span_matrix, span_valid,
            )
            return jax.tree.map(
                lambda x: x[0] if x is not None else None, det,
                is_leaf=lambda x: x is None,
            )
        dev, gscale = self._detect_2d_device(image, categories)
        canvas, hw, lscale = self._prep_lift_canvas(image)
        return self._lift_canvas_det(
            canvas, hw, lscale, K,
            dev["boxes"], dev["classes"], dev["scores"], dev["valid"],
            box_scale=lscale / gscale, depth=depth,
        )


def default_focal_K(h: int, w: int) -> np.ndarray:
    """The demo's intrinsics heuristic when none are given: f = 4*h/2 NDC
    (demo/demo.py:63-76)."""
    f = 4.0 * h / 2.0
    return np.array(
        [[f, 0, w / 2.0], [0, f, h / 2.0], [0, 0, 1.0]], np.float32
    )
