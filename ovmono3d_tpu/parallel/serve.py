"""Multi-chip open-vocabulary serving: GDINO data-parallel over the mesh.

On-chip batching of GroundingDINO is counterproductive (the 800² encoder
saturates a v5e at batch 1 — b4 benches 647 ms/step vs 4x84 ms; see
CLAUDE.md perf notes), so the scaling strategy for multi-image serving is
DATA parallelism: one image per chip, params replicated, batch sharded over
the mesh's `data` axis. The reference has no inference parallelism at all
(demo.py runs image-at-a-time on one GPU; SURVEY.md §2.2).

`make_gdino_serving_fn` builds one jitted function whose inputs carry
explicit NamedShardings — XLA compiles a fully parallel program with no
cross-chip collectives in the hot path (each image's decode + NMS is
independent).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ovmono3d_tpu.models.gdino.inference import (
    BOX_THRESHOLD,
    NMS_THRESHOLD,
    build_text_inputs,
    postprocess_grounding,
)
from ovmono3d_tpu.models.gdino.swin import expand_rel_pos_biases
from ovmono3d_tpu.parallel.mesh import batch_sharding, replicated


def make_gdino_serving_fn(model, mesh, topk: int = 100):
    """Returns run(params, images, text, im_hw) -> padded detections.

    images: [N, S, S, 3] with N a multiple of the mesh's data size;
    text: the dict from build_text_inputs (leading axis 1, tiled inside);
    im_hw: [N, 2] per-image (h, w) the boxes should be scaled to.
    Outputs: boxes [N, topk, 4] xyxy, scores/classes/valid [N, topk].
    """
    data = batch_sharding(mesh)
    repl = replicated(mesh)

    @partial(
        jax.jit,
        static_argnames=(),
        in_shardings=(repl, data, (repl, repl, repl, repl, repl, repl),
                      data, repl),
        out_shardings=(data, data, data, data),
    )
    def run(params, images, text, im_hw, rel_biases):
        (input_ids, text_mask, self_mask, pos_ids, span_matrix,
         span_valid) = text
        B = images.shape[0]
        out = model.apply(
            params, images,
            jnp.broadcast_to(input_ids, (B,) + input_ids.shape[1:]),
            jnp.broadcast_to(text_mask, (B,) + text_mask.shape[1:]),
            jnp.broadcast_to(self_mask, (B,) + self_mask.shape[1:]),
            jnp.broadcast_to(pos_ids, (B,) + pos_ids.shape[1:]),
            rel_biases,
        )
        return jax.vmap(
            lambda lg, bx, hw: postprocess_grounding(
                lg, bx, span_matrix, span_valid, hw, topk=topk,
                box_threshold=BOX_THRESHOLD, nms_threshold=NMS_THRESHOLD,
            )
        )(out["pred_logits"], out["pred_boxes"],
          im_hw.astype(jnp.float32))

    return run


def make_lift_stream_fn(pipe, mesh, per_device: int):
    """Data-parallel streaming e2e serve: one jitted program runs the
    FULL fused detect+postprocess+lift pipeline over a chunk of
    n_data * per_device images — the chunk is sharded one image per chip
    over the mesh's `data` axis, and each chip scans its per_device
    images sequentially (the per-chip b1 optimum; module docstring).
    One dispatch + one sync per chunk, n_data images in flight at every
    scan step: chunk throughput ≈ n_data x the single-chip streaming
    rate. The reference has no inference parallelism at all
    (/root/reference/demo/demo.py runs image-at-a-time on one GPU).

    Returns run(gdino_params, rcnn_params, canvases, Ks, hws, ratios,
    text6, biases) -> Detections with leading dim n_data * per_device
    (input order preserved: position p runs on chip p // per_device)."""
    import jax.numpy as jnp

    data = batch_sharding(mesh)
    repl = replicated(mesh)
    n_data = mesh.shape["data"]

    @partial(
        jax.jit,
        in_shardings=(repl, repl, data, data, data, data, repl, repl),
        out_shardings=data,
    )
    def run(gdino_params, rcnn_params, canvases, Ks, hws, ratios, text,
            biases):
        (input_ids, text_mask, self_mask, pos_ids, span_matrix,
         span_valid) = text

        def to_scan(x):
            x = x.reshape((n_data, per_device) + x.shape[1:])
            return jnp.swapaxes(x, 0, 1)       # [per_dev, n_data, ...]

        def body(carry, xs):
            canvas, K, hw, ratio = xs
            det = pipe._fused_fn_batch(
                gdino_params, rcnn_params, canvas.astype(jnp.float32),
                K, hw, ratio, input_ids, text_mask, self_mask, pos_ids,
                biases, span_matrix, span_valid,
            )
            return carry, det

        _, dets = jax.lax.scan(
            body, 0,
            (to_scan(canvases), to_scan(Ks), to_scan(hws),
             to_scan(ratios)),
        )
        return jax.tree.map(
            lambda l: jnp.swapaxes(l, 0, 1).reshape(
                (n_data * per_device,) + l.shape[2:]),
            dets,
        )

    return run


def detect_open_vocabulary_batch(
    model,
    params,
    images: np.ndarray,      # [N, S, S, 3] normalized
    tok,
    categories: list[str],
    mesh,
    topk: int = 100,
    run=None,
    rel_biases=None,
):
    """Host-facing batched open-vocab detection over the mesh.

    Pads N to a multiple of the data-axis size, shards, runs the jitted
    program, unpads. Pass `run` (from make_gdino_serving_fn) to reuse the
    compiled function across calls, and `rel_biases`
    (expand_rel_pos_biases(params['params']['backbone']), device_put
    replicated) to reuse the precomputed Swin biases — recomputing them
    per call re-uploads ~31 MB through the tunnel, dwarfing the in-graph
    gathers they replace."""
    n_data = mesh.shape["data"]
    N, S = images.shape[0], images.shape[1]
    pad = (-N) % n_data
    if pad:
        images = np.concatenate(
            [images, np.zeros((pad,) + images.shape[1:], images.dtype)]
        )
    text = build_text_inputs(tok, categories, max_len=model.max_text_len,
                             max_phrases=max(64, len(categories)))
    text_args = tuple(
        jnp.asarray(text[k])
        for k in ("input_ids", "text_mask", "text_self_mask",
                  "position_ids", "span_matrix", "span_valid")
    )
    im_hw = np.full((N + pad, 2), S, np.float32)

    if run is None:
        run = make_gdino_serving_fn(model, mesh, topk=topk)
    data = batch_sharding(mesh)
    if rel_biases is None:
        # Hoist the frozen Swin trunk's rel-pos bias expansion out of the
        # forward (bit-identical; swin.expand_rel_pos_biases docstring).
        # Callers looping over batches should precompute + device_put this
        # once and pass it in.
        rel_biases = jax.device_put(
            expand_rel_pos_biases(
                params["params"]["backbone"], window=model.swin_window
            ),
            replicated(mesh),
        )
    # device_put on the HOST arrays: each shard splits host-side and
    # uploads once — jnp.asarray first would commit the whole multi-MB
    # feed to device 0 and then reshard (two tunnel transfers).
    boxes, scores, classes, valid = run(
        jax.device_put(params, replicated(mesh)),
        jax.device_put(np.asarray(images), data),
        text_args,
        jax.device_put(im_hw, data),
        rel_biases,
    )
    return {
        "boxes": np.asarray(boxes)[:N],
        "scores": np.asarray(scores)[:N],
        "classes": np.asarray(classes)[:N],
        "valid": np.asarray(valid)[:N],
    }
