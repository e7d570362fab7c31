#!/usr/bin/env python
"""Capture a device trace of the GDINO forward and print the top ops.

Writes a jax.profiler perfetto trace of a few full forwards, then
aggregates slice durations by (sanitized) op name — the op-level view the
stage bench can't give. Usage: python tools/profile_gdino.py [logdir].
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

S, T = 800, 24


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gdino_trace"
    from ovmono3d_tpu.models.gdino.model import GroundingDINO

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, S, S, 3), jnp.float32)
    ids = jnp.ones((1, T), jnp.int32)
    mask = jnp.ones((1, T), bool)

    model = GroundingDINO()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img, ids, mask)
    fn = jax.jit(model.apply)
    out = fn(params, img, ids, mask)
    float(np.asarray(out["pred_logits"][0, 0, 0]))  # warm

    with jax.profiler.trace(logdir, create_perfetto_trace=True):
        for _ in range(3):
            out = fn(params, img, ids, mask)
        float(np.asarray(out["pred_logits"][0, 0, 0]))

    traces = sorted(glob.glob(f"{logdir}/**/*perfetto*", recursive=True))
    if not traces:
        print("no perfetto trace found under", logdir)
        return
    opener = gzip.open if traces[-1].endswith(".gz") else open
    with opener(traces[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data

    # Track (pid, tid) names so host python slices can be filtered out.
    track = {}
    for ev in events:
        if isinstance(ev, dict) and ev.get("ph") == "M" \
                and ev.get("name") == "thread_name":
            track[(ev.get("pid"), ev.get("tid"))] = (
                ev.get("args", {}).get("name", "")
            )

    agg = collections.Counter()          # by sanitized name
    tops = collections.Counter()         # by full name + metadata
    for ev in events:
        if not isinstance(ev, dict) or ev.get("ph") != "X":
            continue
        tname = track.get((ev.get("pid"), ev.get("tid")), "")
        if "python" in tname.lower() or "Framework" in tname:
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0)  # microseconds
        if not name or dur <= 0 or name.startswith("$"):
            continue
        args = ev.get("args", {})
        meta = args.get("long_name") or args.get("tf_op") or ""
        base = re.sub(r"[.\d]+$", "", name)        # strip op numbering
        agg[base] += dur
        tops[f"{name} | {str(meta)[:120]}"] += dur
    total = sum(agg.values())
    print(f"\ntrace: {traces[-1]}  total slice time {total/1e3:.1f} ms "
          "(3 iters, device tracks)")
    print("--- by op class ---")
    for name, dur in agg.most_common(20):
        print(f"  {dur/1e3/3:9.3f} ms/iter  {name[:80]}")
    print("--- top individual ops ---")
    for name, dur in tops.most_common(45):
        print(f"  {dur/1e3/3:9.3f} ms/iter  {name[:150]}")


if __name__ == "__main__":
    main()
