"""Optimizer construction: per-param LR/WD groups + warmup-multistep schedule.

Re-design of cubercnn/solver/build.py (SURVEY.md §2.1 #21): SGD / Adam /
AdamW(+amsgrad) with detectron2-style parameter groups — bias LR factor,
zero weight decay for norm-layer params and biases — and the
WarmupMultiStepLR schedule, as one optax chain.
"""
from __future__ import annotations

from typing import Any

import jax
import optax

from ovmono3d_tpu.config import SolverConfig

NORM_KEYWORDS = ("norm", "layernorm", "ln", "bn")


def warmup_multistep(
    base_lr: float,
    steps: tuple[int, ...],
    gamma: float,
    warmup_iters: int,
    warmup_factor: float,
) -> optax.Schedule:
    """detectron2 WarmupMultiStepLR: linear warmup then step decay."""

    def schedule(count):
        import jax.numpy as jnp

        warmup = jnp.where(
            count < warmup_iters,
            warmup_factor + (1 - warmup_factor) * count / max(warmup_iters, 1),
            1.0,
        )
        decay = gamma ** sum(
            (count >= s).astype(count.dtype) for s in
            [jnp.asarray(s) for s in steps]
        ) if steps else 1.0
        return base_lr * warmup * decay

    return schedule


def _is_norm_or_bias(path: tuple) -> tuple[bool, bool]:
    keys = [getattr(p, "key", str(p)).lower() for p in path]
    is_bias = keys[-1] == "bias"
    # 'gamma' (DINOv2 LayerScale, models/vit.py) is deliberately NOT a norm
    # key: the reference groups by module type (solver/build.py:33-35,
    # isinstance(module, norm_module_types)) and LayerScale is a plain
    # parameter there — it receives full WEIGHT_DECAY.
    is_norm = any(
        any(kw in k for kw in NORM_KEYWORDS) for k in keys[:-1]
    ) or keys[-1] == "scale"
    return is_norm, is_bias


def param_group_labels(params) -> Any:
    """Label tree: 'default' | 'bias' | 'norm' (solver/build.py:20-46)."""

    def label(path, _):
        is_norm, is_bias = _is_norm_or_bias(path)
        if is_norm:
            return "norm"
        if is_bias:
            return "bias"
        return "default"

    return jax.tree_util.tree_map_with_path(label, params)


def _sgd(lr_schedule, momentum, weight_decay):
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else
        optax.identity(),
        optax.sgd(lr_schedule, momentum=momentum),
    )


def _adam_like(kind, lr_schedule, weight_decay, eps: float = 1e-2):
    """adam | adam+amsgrad | adamw | adamw+amsgrad (SOLVER.TYPE values,
    solver/build.py:49-66 — all torch variants there pass eps=1e-02).

    Adam variants use COUPLED L2 (decay added to the gradient before the
    moment normalizer, torch.optim.Adam semantics); AdamW variants use
    DECOUPLED decay (added after normalization, scaled by lr,
    torch.optim.AdamW semantics)."""
    amsgrad = kind.endswith("+amsgrad")
    if kind.startswith("adamw"):
        if amsgrad:
            return optax.chain(
                optax.scale_by_amsgrad(eps=eps),
                optax.add_decayed_weights(weight_decay) if weight_decay
                else optax.identity(),
                optax.scale_by_learning_rate(lr_schedule),
            )
        return optax.adamw(lr_schedule, eps=eps, weight_decay=weight_decay)
    base = (optax.amsgrad(lr_schedule, eps=eps) if amsgrad
            else optax.adam(lr_schedule, eps=eps))
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else
        optax.identity(),
        base,
    )


def build_optimizer(cfg: SolverConfig, params) -> optax.GradientTransformation:
    """Optimizer with param groups; `params` provides the label structure."""
    sched = warmup_multistep(
        cfg.base_lr, cfg.steps, cfg.gamma, cfg.warmup_iters, cfg.warmup_factor
    )
    bias_sched = warmup_multistep(
        cfg.base_lr * cfg.bias_lr_factor, cfg.steps, cfg.gamma,
        cfg.warmup_iters, cfg.warmup_factor,
    )

    def make(kind, lr, wd):
        if kind == "sgd":
            return _sgd(lr, cfg.momentum, wd)
        return _adam_like(kind, lr, wd, eps=cfg.adam_eps)

    kind = cfg.type
    # Biases follow WEIGHT_DECAY unless WEIGHT_DECAY_BIAS overrides
    # (detectron2 default None = follow; solver/build.py:36-40).
    wd_bias = (cfg.weight_decay if cfg.weight_decay_bias is None
               else cfg.weight_decay_bias)
    tx = optax.multi_transform(
        {
            "default": make(kind, sched, cfg.weight_decay),
            "bias": make(kind, bias_sched, wd_bias),
            "norm": make(kind, sched, cfg.weight_decay_norm),
        },
        param_group_labels(params),
    )
    if cfg.clip_gradients > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.clip_gradients), tx)
    return tx


def freeze_backbone_mask(params) -> Any:
    """True = trainable. Freezes the backbone TRUNK only (reference
    train_net.py:431-434 freezes `backbone.net` — the ViT/CNN trunk inside
    the pyramid wrapper; the SFP/FPN and all heads stay trainable)."""

    def label(path, _):
        keys = [getattr(p, "key", str(p)) for p in path]
        in_trunk = (
            len(keys) > 2
            and keys[1] == "backbone"
            and keys[2] not in ("sfp", "fpn")
        )
        return not in_trunk

    return jax.tree_util.tree_map_with_path(label, params)


def apply_freeze(tx: optax.GradientTransformation, trainable_mask):
    """Route frozen params to a zero update (no decay, no momentum state)."""
    labels = jax.tree.map(
        lambda t: "train" if t else "frozen", trainable_mask
    )
    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, labels
    )


def with_grad_accum(tx: optax.GradientTransformation, k: int):
    """Accumulate gradients over `k` micro-steps per optimizer update
    (solver.grad_accum_steps): micro-gradients are AVERAGED, so k micro
    batches of size n reproduce the update of one batch of k*n — the
    TPU-native route to the reference's 8-GPU x 64 large-batch recipe
    (run.sh:1-15) on few chips. Composes with the in-graph stabilization
    skip: a skipped micro-step reverts the whole optimizer state, so the
    poisoned micro-gradient never enters the accumulator
    (parallel/train_step.py)."""
    return optax.MultiSteps(tx, every_k_schedule=k) if k > 1 else tx
