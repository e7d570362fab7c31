"""Sharded train/eval steps with in-graph stabilization.

Replaces the reference's DDP hot loop (tools/train_net.py:199-354;
SURVEY.md §2.2, §5):
- data parallelism: batch sharded over the mesh `data` axis, params
  replicated; XLA inserts the gradient all-reduce (the NCCL
  `allreduce_dict` equivalent) over ICI.
- stabilization: the reference skips the optimizer step when the batch loss
  explodes (> tolerance x rolling mean) or any grad is non-finite, with the
  decision all-reduced so ranks stay in lockstep (train_net.py:187-292).
  Here the skip decision is computed IN-GRAPH from the globally-reduced loss
  and gradient finiteness — a sharded computation is already consistent
  across devices, so no separate flag collective is needed. The rolling loss
  mean lives in `TrainState.loss_ema`.
"""
from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from ovmono3d_tpu.models.rcnn3d import RCNN3D
from ovmono3d_tpu.structures import GroundTruth

TOLERANCE = 4.0  # loss-spike multiplier (train_net.py:178-250)
GAMMA = 0.02     # rolling-average gain (train_net.py:189, ~50-step window)


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array
    loss_ema: jax.Array        # rolling mean of the total loss
    skipped: jax.Array         # cumulative skipped-update count
    rng: jax.Array


def create_train_state(params, tx, rng) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        loss_ema=jnp.full((), -1.0),
        skipped=jnp.zeros((), jnp.int32),
        rng=rng,
    )


def make_train_step(model: RCNN3D, tx: optax.GradientTransformation,
                    stabilize: float = 0.01, trainable_mask=None):
    """Returns train_step(state, batch) -> (state, metrics), jittable and
    shardable (batch leading axis over `data`).

    `trainable_mask` (True = trainable, e.g. optim.freeze_backbone_mask):
    frozen leaves get stop_gradient, the reference's `requires_grad=False`
    (train_net.py:431-434). Beyond making the zero-update explicit, this
    lets XLA dead-code-eliminate the whole trunk backward pass and free its
    activations — apply_freeze alone still pays for computing the unused
    trunk gradients.
    """

    def loss_fn(params, batch, rng):
        if trainable_mask is not None:
            params = jax.tree.map(
                lambda p, t: p if t else jax.lax.stop_gradient(p),
                params, trainable_mask,
            )
        gt = GroundTruth(
            boxes=batch["gt_boxes"],
            classes=batch["gt_classes"],
            boxes3d=batch["gt_boxes3d"],
            poses=batch["gt_poses"],
            valid=batch["gt_valid"],
        )
        losses = model.apply(
            params,
            batch["image"],
            batch["K"],
            batch["im_hw"],
            batch["im_scale_ratio"],
            gt,
            rng,
            batch.get("depth"),
            method=RCNN3D.compute_losses,
        )
        total = sum(losses.values())
        return total, losses

    def train_step(state: TrainState, batch):
        rng, step_rng = jax.random.split(state.rng)
        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, batch, step_rng)

        # --- stabilization (in-graph, globally consistent) ---
        grads_finite = jnp.all(
            jnp.asarray(
                [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]
            )
        )
        loss_finite = jnp.isfinite(total)
        # Rolling mean exactly as the reference (train_net.py:231-250):
        # initialized to 2x the first loss, and FROZEN on diverging steps —
        # folding an exploded loss in would raise the bar and let the next
        # diverged step slip through.
        safe_total = jnp.where(loss_finite, total, 0.0)
        # Do NOT initialize the EMA from a non-finite first loss: ema would
        # become 0 (losing the -1 'uninitialized' sentinel), and since the
        # EMA is frozen on skipped steps, every later finite step would
        # trip `total > 4 * 0.02 * L` and training would silently skip
        # forever. Keep the sentinel until a finite loss initializes it.
        ema = jnp.where(
            (state.loss_ema < 0) & loss_finite,
            2.0 * safe_total,
            state.loss_ema,
        )
        exploded = (ema > 0) & (total > TOLERANCE * ema)
        skip = (~grads_finite) | (~loss_finite) | (
            exploded if stabilize > 0 else jnp.zeros((), bool)
        )

        updates, new_opt_state = tx.update(
            jax.tree.map(lambda g: jnp.where(skip, 0.0, g), grads),
            state.opt_state,
            state.params,
        )
        new_params = optax.apply_updates(state.params, updates)
        # On skip keep everything unchanged.
        new_params = jax.tree.map(
            lambda new, old: jnp.where(skip, old, new),
            new_params, state.params,
        )
        new_opt_state = jax.tree.map(
            lambda new, old: jnp.where(skip, old, new),
            new_opt_state, state.opt_state,
        )

        new_ema = jnp.where(
            skip, ema, ema * (1.0 - GAMMA) + safe_total * GAMMA
        )
        new_state = TrainState(
            params=new_params,
            opt_state=new_opt_state,
            step=state.step + 1,
            loss_ema=new_ema,
            skipped=state.skipped + skip.astype(jnp.int32),
            rng=rng,
        )
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["skipped"] = skip.astype(jnp.float32)
        return new_state, metrics

    return train_step


def shard_train_step(train_step, mesh, donate: bool = True,
                     infer_state_sharding: bool = False):
    """jit the step with the batch sharded over `data`.

    Default: params/state replicated (pure DP). With
    `infer_state_sharding=True` the state's committed shardings are
    respected — used for tensor-parallel params placed by
    parallel.sharding_rules.apply_tp over the `model` axis.

    `donate=True` donates the input TrainState buffers (halves peak HBM);
    pass False when the caller keeps references to the old state (tests).
    """
    data = NamedSharding(mesh, P("data"))
    if infer_state_sharding:
        return jax.jit(
            train_step,
            in_shardings=(None, data),
            donate_argnums=(0,) if donate else (),
        )
    repl = NamedSharding(mesh, P())
    return jax.jit(
        train_step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model: RCNN3D):
    """Oracle-mode eval step (the reference's eval protocol, SURVEY.md §3.2)."""

    def eval_step(params, batch):
        return model.apply(
            params,
            batch["image"],
            batch["K"],
            batch["im_hw"],
            batch["im_scale_ratio"],
            batch.get("depth"),
            oracle_boxes=batch["oracle_boxes"],
            oracle_classes=batch["oracle_classes"],
            oracle_scores=batch["oracle_scores"],
            oracle_valid=batch["oracle_valid"],
        )

    return eval_step


def shard_eval_step(eval_step, mesh):
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(eval_step, in_shardings=(repl, data), out_shardings=data)
