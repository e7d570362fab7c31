"""Shared TPU timing helper: in-graph chained iterations.

The tunneled TPU adds multi-ms host dispatch latency per call, and EAGER
chaining ops (o[0,0,0] * 1e-9 + feed) each pay it too — measured to add
>100 ms/iter of pure noise (tools/probe_level_costs.py history). The honest
protocol (same as bench.py): chain N iterations through a data dependency
INSIDE one jitted fori_loop so per-round overhead is a single dispatch +
one forced host read.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def bench_loop(fn: Callable, feed: jax.Array, probe: Callable,
               iters: int = 20, rounds: int = 4, label: str = "") -> float:
    """Best-of-`rounds` per-iteration seconds for fn(feed).

    fn: feed-array -> pytree output (close over other inputs).
    probe: output -> scalar array (the data dependency carried between
    iterations; also the forced host read at the end of a round).
    """

    @jax.jit
    def loop(x):
        def body(i, carry):
            o = fn(carry)
            return x * (1.0 + probe(o).astype(x.dtype) * 1e-12)

        return jax.lax.fori_loop(0, iters, body, x)

    if label:
        print(f"[compiling] {label}", flush=True)
    float(np.asarray(loop(feed)).ravel()[0])   # compile + warm

    def rt():
        t0 = time.perf_counter()
        float(np.asarray(loop(feed)).ravel()[0])
        return (time.perf_counter() - t0) / iters

    best = min(rt() for _ in range(rounds))
    if label:
        print(f"{label}: {best*1e3:.3f} ms", flush=True)
    return best
