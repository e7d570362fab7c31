#!/usr/bin/env python
"""Capture a device trace of the flagship oracle forward; print top ops.

Same protocol as tools/profile_gdino.py (perfetto trace -> per-op slice
aggregation over device tracks) but for the headline bench path: DINOv2
ViT-B/14 @896^2 + SFP + cube head + lifting (bench.py feed).
Usage: python tools/profile_oracle.py [logdir].
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")


def report(logdir: str, iters: int):
    """Aggregate the newest perfetto trace under logdir (profile_gdino.py
    aggregation: skip host tracks, strip op numbering)."""
    traces = sorted(glob.glob(f"{logdir}/**/*perfetto*", recursive=True))
    if not traces:
        print("no perfetto trace found under", logdir)
        return
    opener = gzip.open if traces[-1].endswith(".gz") else open
    with opener(traces[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data

    track = {}
    for ev in events:
        if isinstance(ev, dict) and ev.get("ph") == "M" \
                and ev.get("name") == "thread_name":
            track[(ev.get("pid"), ev.get("tid"))] = (
                ev.get("args", {}).get("name", "")
            )

    agg = collections.Counter()
    tops = collections.Counter()
    for ev in events:
        if not isinstance(ev, dict) or ev.get("ph") != "X":
            continue
        tname = track.get((ev.get("pid"), ev.get("tid")), "")
        if "python" in tname.lower() or "Framework" in tname:
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0)
        if not name or dur <= 0 or name.startswith("$"):
            continue
        args = ev.get("args", {})
        meta = args.get("long_name") or args.get("tf_op") or ""
        base = re.sub(r"[.\d]+$", "", name)
        agg[base] += dur
        tops[f"{name} | {str(meta)[:120]}"] += dur
    total = sum(agg.values())
    print(f"\ntrace: {traces[-1]}  total slice time {total/1e3:.1f} ms "
          f"({iters} iters, device tracks)")
    print("--- by op class ---")
    for name, dur in agg.most_common(20):
        print(f"  {dur/1e3/iters:9.3f} ms/iter  {name[:80]}")
    print("--- top individual ops ---")
    for name, dur in tops.most_common(45):
        print(f"  {dur/1e3/iters:9.3f} ms/iter  {name[:150]}")


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/oracle_trace"
    from __graft_entry__ import _flagship_config
    from ovmono3d_tpu.models.rcnn3d import build_model

    cfg = _flagship_config(square_pad=896)
    model = build_model(cfg.model)

    B = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    S, N = 896, 64
    key = jax.random.PRNGKey(0)
    image = jax.random.uniform(key, (B, S, S, 3), jnp.float32) * 255.0
    K = jnp.broadcast_to(
        jnp.array([[1000.0, 0, S / 2], [0, 1000.0, S / 2], [0, 0, 1]]),
        (B, 3, 3),
    )
    im_hw = jnp.full((B, 2), S, jnp.int32)
    ratio = jnp.ones((B,), jnp.float32)
    boxes = jnp.tile(
        jnp.array([[50.0, 50.0, 400.0, 400.0]]), (B, N, 1)
    ) + jnp.arange(N, dtype=jnp.float32)[None, :, None]
    classes = jnp.zeros((B, N), jnp.int32)
    scores = jnp.full((B, N), 0.9, jnp.float32)
    valid = jnp.ones((B, N), bool)

    kw = dict(oracle_boxes=boxes, oracle_classes=classes,
              oracle_scores=scores, oracle_valid=valid)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), image, K, im_hw,
                                 ratio, **kw)
    fn = jax.jit(lambda p, img: model.apply(p, img, K, im_hw, ratio, **kw))
    out = fn(params, image)
    float(np.asarray(out.scores[0, 0]))  # warm

    ITERS = 5
    # Host/python tracer off (see profile_train.py: python frames flood
    # the 1M-event perfetto cap and device tracks get truncated).
    opts = jax.profiler.ProfileOptions()
    opts.host_tracer_level = 0
    opts.python_tracer_level = 0
    with jax.profiler.trace(logdir, create_perfetto_trace=True,
                            profiler_options=opts):
        for _ in range(ITERS):
            out = fn(params, image)
        float(np.asarray(out.scores[0, 0]))
    report(logdir, ITERS)


if __name__ == "__main__":
    main()
