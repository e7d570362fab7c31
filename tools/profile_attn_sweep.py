#!/usr/bin/env python
"""Device-profile sweep of flash kernel variants (trace-parsed, noise-free).
Variant knobs via env-free args: softmax dtype x block_q."""
import functools, sys, os, glob, gzip, json, collections
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")

_NEG_INF = -1e30


def make_kernel(sm_f32: bool):
    def kern(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale, block_k):
        in_dtype = q_ref.dtype
        sdt = jnp.float32 if sm_f32 else in_dtype
        q = (q_ref[0].astype(jnp.float32) * scale).astype(in_dtype)
        n_kv = k_ref.shape[1]
        bq, d = q.shape
        nb = n_kv // block_k

        def body(i, carry):
            acc, m_prev, l_prev = carry
            k_blk = k_ref[0, pl.ds(i * block_k, block_k), :]
            v_blk = v_ref[0, pl.ds(i * block_k, block_k), :]
            s = jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(sdt)
            s = s + mask_ref[0, pl.ds(i * block_k, block_k)][None, :]
            m_cur = jnp.max(s, -1, keepdims=True).astype(jnp.float32)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new.astype(sdt))
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, -1, keepdims=True,
                                             dtype=jnp.float32)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(in_dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc, m_new, l_new
        acc, _, l = jax.lax.fori_loop(
            0, nb, body,
            (jnp.zeros((bq, d), jnp.float32),
             jnp.full((bq, 1), _NEG_INF, jnp.float32),
             jnp.zeros((bq, 1), jnp.float32)))
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    return kern


def flash(q, k, v, block_q, block_k, sm_f32):
    b, n, h, d = q.shape
    scale = 1.0 / (d ** 0.5)
    n_q = -(-n // block_q) * block_q
    n_kv = -(-n // block_k) * block_k
    qp = jnp.pad(q, ((0, 0), (0, n_q - n), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, n_kv - n), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, n_kv - n), (0, 0), (0, 0)))
    to_bh = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, -1, d)
    qb, kb, vb = to_bh(qp), to_bh(kp), to_bh(vp)
    mdt = jnp.float32 if sm_f32 else q.dtype
    mask = jnp.where(jnp.arange(n_kv) < n, 0.0, _NEG_INF).astype(mdt)[None]
    out = pl.pallas_call(
        functools.partial(make_kernel(sm_f32), scale=scale, block_k=block_k),
        grid=(b * h, n_q // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, n_kv, d), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, n_kv, d), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, n_kv), lambda bh, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n_q, d), q.dtype),
    )(qb, kb, vb, mask)
    return out.reshape(b, h, n_q, d).transpose(0, 2, 1, 3)[:, :n]


rng = np.random.RandomState(0)
q = jnp.asarray(rng.rand(1, 4097, 12, 64), jnp.bfloat16)
k = jnp.asarray(rng.rand(1, 4097, 12, 64), jnp.bfloat16)
v = jnp.asarray(rng.rand(1, 4097, 12, 64), jnp.bfloat16)

VARIANTS = {
    "f32 bq256 bk4608": (256, 4608, True),
    "f32 bq128 bk4352": (128, 4352, True),
    "f32 bq512 bk4608": (512, 4608, True),
    "f32 bq256 bk1152": (256, 1152, True),
    "bf16 bq256 bk4608": (256, 4608, False),
    "f32 bq1024 bk4608": (1024, 4608, True),
}
fns = {}
for name, (bq, bk, f32) in VARIANTS.items():
    fn = jax.jit(functools.partial(flash, block_q=bq, block_k=bk,
                                   sm_f32=f32))
    try:
        o = fn(q, k, v); float(np.asarray(o[0, 0, 0, 0]))
        fns[name] = fn
    except Exception as e:
        print(f"{name}: COMPILE FAILED {str(e).splitlines()[0][:80]}",
              flush=True)

os.system("rm -rf /tmp/trace_sweep")
with jax.profiler.trace("/tmp/trace_sweep"):
    for name, fn in fns.items():
        x = q
        for _ in range(8):
            o = fn(x, k, v); x = q + o[0, 0, 0, 0] * 0
        float(np.asarray(o[0, 0, 0, 0]))

f = glob.glob("/tmp/trace_sweep/**/*.trace.json.gz", recursive=True)[0]
with gzip.open(f) as fh: data = json.load(fh)
pids = {e["pid"]: e["args"].get("name", "") for e in data["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"}
import collections as C
allname = C.Counter()
for e in data["traceEvents"]:
    if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
        allname[e["name"].split(".")[0]] += e.get("dur", 0)
print("top device ops:", allname.most_common(6))
evs = [e for e in data["traceEvents"]
       if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), "")
       and ("kern" in e["name"] or "flash" in e["name"])]
evs.sort(key=lambda e: e["ts"])
per = len(evs) // len(fns)
names = list(fns)
for i, name in enumerate(names):
    chunk = evs[i * per:(i + 1) * per]
    tot = sum(e["dur"] for e in chunk) / len(chunk)
    print(f"{name}: {tot/1e3:.3f} ms/call  (x{len(chunk)})")
