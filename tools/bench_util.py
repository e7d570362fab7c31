"""Shared TPU timing helper: in-graph chained iterations.

The tunneled TPU adds multi-ms host dispatch latency per call, and EAGER
chaining ops (o[0,0,0] * 1e-9 + feed) each pay it too — measured to add
>100 ms/iter of pure noise (tools/probe_level_costs.py history). The honest
protocol (same as bench.py): chain N iterations through a data dependency
INSIDE one jitted fori_loop so per-round overhead is a single dispatch +
one forced host read.

IMPORTANT: model parameters (and any other large arrays) MUST be passed via
`args`, not closed over in `fn` — jit inlines closed-over arrays as HLO
literals, and a literal-laden program overflows the axon relay's
remote-compile upload limit (HTTP 413) on any compile-cache miss.

TWO MEASUREMENT PITFALLS (discovered round 2 — both produced bogus probe
numbers before being understood):

1. DEAD CODE ELIMINATION. The only consumer of fn's output is `probe`; if
   probe slices (e.g. `o[0,0,0]`) and fn is an elementwise/gather/reshape
   pipeline, XLA narrows the whole computation to the sliced element and
   you time nothing (a [32776,768] add "ran" at 1430 GB/s). Slicing probes
   are ONLY safe when the probed element depends on the full input through
   a dot/conv/custom-call (XLA does not narrow those) — true for model
   outputs (scores/pred_logits), false for kernel micro-probes. For
   elementwise/gather probes use `lambda o: jnp.sum(o)` (costs one extra
   BW pass; measure it separately and subtract if it matters).

2. FIXED PER-ROUND DISPATCH COST. One loop dispatch + scalar read through
   the axon tunnel costs ~5-30 ms regardless of compute. At iters=10 this
   silently adds up to ~3 ms/iter to sub-ms ops (the flash-attention
   single-call "2.4 ms" was really 0.58 ms — trace-confirmed). Use
   iters >= 100 for sub-ms ops; comparisons under an identical protocol
   mostly cancel it.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def bench_loop(fn: Callable, feed: jax.Array, probe: Callable,
               iters: int = 20, rounds: int = 4, label: str = "",
               args: tuple = ()) -> float:
    """Best-of-`rounds` per-iteration seconds for fn(feed, *args).

    fn: (feed-array, *args) -> pytree output. Pass params/tables through
    `args` (see module docstring); only close over genuinely small inputs.
    probe: output -> scalar array (the data dependency carried between
    iterations; also the forced host read at the end of a round).
    """

    # The loop carries and returns only a SCALAR: returning the feed-sized
    # carry makes every round pay a multi-MB host readback through the
    # tunnel (measured: +15 ms/iter on a 19 MB feed at iters=10), which
    # silently inflates the number. The scalar still chains iterations
    # (input i+1 = feed * (1 + eps * scalar_i)).
    @jax.jit
    def loop(x, *a):
        def body(i, s):
            o = fn(x * (1.0 + s * 1e-12).astype(x.dtype), *a)
            return probe(o).astype(jnp.float32).reshape(())

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    if label:
        print(f"[compiling] {label}", flush=True)
    try:
        float(np.asarray(loop(feed, *args)).ravel()[0])   # compile + warm
    except jax.errors.JaxRuntimeError as e:
        # Very large programs can still overflow the axon remote-compile
        # upload when wrapped in the fori_loop. Fall back to host-side
        # enqueue chaining: each step is one jitted dispatch returning the
        # next feed ON DEVICE, so steps queue back-to-back and only the
        # final host read synchronizes.
        print(f"[bench_loop] in-graph loop failed ({e}); "
              "falling back to enqueue-chained steps", flush=True)

        @jax.jit
        def step(s, x, *a):
            o = fn(x * (1.0 + s * 1e-12).astype(x.dtype), *a)
            return probe(o).astype(jnp.float32).reshape(())

        def run_chain():
            s = jnp.zeros((), jnp.float32)
            for _ in range(iters):
                s = step(s, feed, *args)
            float(np.asarray(s))

        run_chain()  # compile + warm

        def rt():
            t0 = time.perf_counter()
            run_chain()
            return (time.perf_counter() - t0) / iters

        best = min(rt() for _ in range(rounds))
        if label:
            print(f"{label}: {best*1e3:.3f} ms", flush=True)
        return best

    def rt():
        t0 = time.perf_counter()
        float(np.asarray(loop(feed, *args)).ravel()[0])
        return (time.perf_counter() - t0) / iters

    best = min(rt() for _ in range(rounds))
    if label:
        print(f"{label}: {best*1e3:.3f} ms", flush=True)
    return best
