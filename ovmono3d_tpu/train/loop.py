"""Host-side training loop with stabilization restarts.

Re-design of the reference train loop (tools/train_net.py:140-473;
SURVEY.md §3.1 and §5 "failure detection"): the per-step skip logic is
in-graph (parallel/train_step.py); this loop adds the outer layer — if the
fraction of skipped updates since the last checkpoint exceeds
MODEL.STABILIZE, tear down and restart from the last checkpoint, up to
`max_training_attempts` times.
"""
from __future__ import annotations

import logging
import time
from typing import Callable, Iterable, Iterator

import jax
import numpy as np

from ovmono3d_tpu.config import Config
from ovmono3d_tpu.train.checkpoint import SingleCheckpointer

logger = logging.getLogger(__name__)


def train(
    cfg: Config,
    state,
    step_fn: Callable,
    data_iter: Iterator,
    checkpointer: SingleCheckpointer | None = None,
    hooks: list[Callable] | None = None,
    eval_fn: Callable | None = None,
    data_iter_factory: Callable[[int], Iterator] | None = None,
):
    """Run up to cfg.solver.max_iter steps with restart-on-divergence.

    `data_iter` yields sharded batch dicts. Returns the final state.
    Restart semantics (train_net.py:296-325, 426-473 — full teardown): if
    the skipped-update fraction since the last checkpoint >=
    cfg.model.stabilize after at least half a checkpoint period, reload
    `model_recent` — or, when no checkpoint exists yet, restore the INITIAL
    state (the reference re-enters do_train, which resume_or_load()s back to
    the pretrain weights) — and rebuild the data stream via
    `data_iter_factory(attempt)` so the retry sees a fresh shuffle order
    (the reference rebuilds the loader + worker processes).
    `eval_fn(state) -> dict` runs every cfg.test.eval_period steps (periodic
    in-train evaluation, reference train_net.py:329-339).
    """
    solver = cfg.solver
    attempts = 0
    period = max(solver.checkpoint_period, 1)
    eval_period = getattr(cfg.test, "eval_period", 0)
    # Step/skipped are tracked HOST-SIDE: int(state.step) every iteration
    # would block on the step result and serialize dispatch (multi-ms
    # exposed latency per step on the tunneled TPU). state.step advances by
    # exactly 1 per step_fn call; `skipped` is only materialized at the
    # stabilization-check cadence below.
    step = int(state.step)
    last_ckpt_step = step
    last_ckpt_skipped = int(state.skipped)
    # At most every 20 steps (bounded restart-detection delay), but never
    # sparser than the half-checkpoint-period gate that arms the check.
    stab_check_every = max(1, min(20, period // 2))
    # Host copy of the entry state: the restart target until the first
    # checkpoint lands (only needed when stabilization is on).
    init_host_state = (
        jax.device_get(state) if cfg.model.stabilize > 0 else None
    )

    while step < solver.max_iter:
        t0 = time.time()
        batch = next(data_iter)
        state, metrics = step_fn(state, batch)
        step += 1

        if hooks:
            for hook in hooks:
                # hooks take (step, state, metrics, **kw); batch lets
                # visualization hooks render training samples.
                hook(step, state, metrics, batch=batch)

        since_ckpt = step - last_ckpt_step
        check_stab = (
            cfg.model.stabilize > 0
            and since_ckpt >= period // 2
            and step % stab_check_every == 0
        )
        skipped_since = (
            int(state.skipped) - last_ckpt_skipped if check_stab else 0
        )
        if (
            check_stab
            and skipped_since / max(since_ckpt, 1) >= cfg.model.stabilize
        ):
            attempts += 1
            logger.warning(
                "divergence: %d/%d skipped since last ckpt; restart %d/%d",
                skipped_since, since_ckpt, attempts,
                solver.max_training_attempts,
            )
            if attempts >= solver.max_training_attempts:
                raise RuntimeError("exceeded max training attempts")
            if checkpointer is not None and checkpointer.has():
                state = checkpointer.load(state)
            elif init_host_state is not None:
                # No checkpoint yet: back to the initial weights/optimizer,
                # not the diverged ones (reference do_train re-entry). Host
                # arrays re-shard on the next jitted step like a restore.
                state = init_host_state
            if data_iter_factory is not None:
                data_iter = data_iter_factory(attempts)
            step = int(state.step)  # resync host counter after restore
            last_ckpt_step = step
            last_ckpt_skipped = int(state.skipped)
            continue

        # Current-step divergence flag (in-graph skip decision), only
        # materialized at the sparse eval/checkpoint steps — reading it
        # every iteration would serialize dispatch (see `step` note above).
        def diverged_now() -> bool:
            if cfg.model.stabilize <= 0:
                return False
            return float(metrics.get("skipped", 0.0)) > 0

        if (eval_fn is not None and eval_period > 0
                and step % eval_period == 0 and not diverged_now()):
            # The reference evaluates only when the loss is not diverging
            # (train_net.py:329-330).
            results = eval_fn(state)
            logger.info(
                "in-train eval @ iter %d: %s", step,
                {k: round(float(v), 2) for k, v in results.items()
                 if isinstance(v, (int, float))},
            )

        if checkpointer is not None and step % period == 0:
            # "Do not bother checkpointing if there is potential for a
            # diverging model" (train_net.py:346-349): skip the periodic
            # save when the current step diverged or the skip fraction
            # since the last checkpoint reached 0.5*STABILIZE — otherwise
            # a restart could reload a poisoned checkpoint.
            skipped_now = int(state.skipped) if cfg.model.stabilize > 0 else 0
            frac = (
                (skipped_now - last_ckpt_skipped)
                / max(step - last_ckpt_step, 1)
            )
            if not diverged_now() and (
                cfg.model.stabilize <= 0
                or frac < 0.5 * cfg.model.stabilize
            ):
                checkpointer.save(jax.device_get(state))
                last_ckpt_step = step
                last_ckpt_skipped = skipped_now

        if step % 20 == 0:
            loss = float(metrics["total_loss"])
            logger.info(
                "iter %d loss %.4f (%.3fs/it)", step, loss, time.time() - t0
            )

    if checkpointer is not None:
        checkpointer.save(jax.device_get(state), name="model_final")
    # Release hook resources (flush trailing metrics, stop an open
    # profiler trace window when max_iter < stop).
    for hook in hooks or ():
        if hasattr(hook, "close"):
            hook.close()
    return state
