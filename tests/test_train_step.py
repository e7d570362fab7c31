"""Sharded train-step tests on the virtual 8-device CPU mesh."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ovmono3d_tpu.parallel.mesh import make_mesh, shard_batch
from ovmono3d_tpu.parallel.train_step import (
    create_train_state,
    make_train_step,
    shard_train_step,
)
from ovmono3d_tpu.train.optim import (
    apply_freeze,
    build_optimizer,
    freeze_backbone_mask,
    warmup_multistep,
)
from test_model import tiny_config, _gt, _batch, B, M, S


def _train_batch(b=8):
    key = jax.random.PRNGKey(0)
    image = jax.random.uniform(key, (b, S, S, 3)) * 255.0
    K = jnp.broadcast_to(
        jnp.array([[100.0, 0, 56], [0, 100.0, 56], [0, 0, 1]]), (b, 3, 3)
    )
    gt = _gt()
    reps = b // B
    return {
        "image": image,
        "K": K,
        "im_hw": jnp.tile(jnp.array([[112, 112], [98, 84]], jnp.int32), (reps, 1)),
        "im_scale_ratio": jnp.tile(jnp.array([2.0, 1.5]), (reps,)),
        "gt_boxes": jnp.tile(gt.boxes, (reps, 1, 1)),
        "gt_classes": jnp.tile(gt.classes, (reps, 1)),
        "gt_boxes3d": jnp.tile(gt.boxes3d, (reps, 1, 1)),
        "gt_poses": jnp.tile(gt.poses, (reps, 1, 1, 1)),
        "gt_valid": jnp.tile(gt.valid, (reps, 1)),
    }


def test_warmup_multistep_schedule():
    sched = warmup_multistep(1.0, (100, 200), 0.1, 10, 0.1)
    np.testing.assert_allclose(float(sched(jnp.asarray(0))), 0.1, atol=1e-6)
    np.testing.assert_allclose(float(sched(jnp.asarray(10))), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(sched(jnp.asarray(150))), 0.1, atol=1e-6)
    np.testing.assert_allclose(float(sched(jnp.asarray(250))), 0.01, atol=1e-6)


@pytest.fixture(scope="module")
def setup():
    from ovmono3d_tpu.models.rcnn3d import build_model

    cfg = tiny_config()
    solver = dataclasses.replace(
        cfg.solver, base_lr=0.01, warmup_iters=0, steps=()
    )
    cfg = dataclasses.replace(cfg, solver=solver)
    model = build_model(cfg.model)
    batch = _train_batch()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(1),
        batch["image"][:2], batch["K"][:2], batch["im_hw"][:2],
        batch["im_scale_ratio"][:2],
    )
    tx = apply_freeze(
        build_optimizer(cfg.solver, params), freeze_backbone_mask(params)
    )
    return cfg, model, params, tx, batch


def test_sharded_train_step_runs_and_updates(setup):
    cfg, model, params, tx, batch = setup
    mesh = make_mesh()
    assert mesh.shape["data"] == 8

    step_fn = shard_train_step(
        make_train_step(model, tx, cfg.model.stabilize,
                        trainable_mask=freeze_backbone_mask(params)),
        mesh, donate=False
    )
    state = create_train_state(params, tx, jax.random.PRNGKey(2))
    sbatch = shard_batch(mesh, batch)

    state1, metrics1 = step_fn(state, sbatch)
    assert np.isfinite(float(metrics1["total_loss"]))
    assert float(metrics1["skipped"]) == 0.0

    # Frozen ViT TRUNK params unchanged; SFP and head params changed
    # (reference freezes backbone.net only, train_net.py:431-434).
    old_vit = params["params"]["backbone"]["vit"]
    new_vit = state1.params["params"]["backbone"]["vit"]
    for a, b in zip(jax.tree.leaves(old_vit), jax.tree.leaves(new_vit)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for group in ("backbone", "cube_head"):
        sub = (("sfp",) if group == "backbone" else ())
        old_t = params["params"][group]
        new_t = state1.params["params"][group]
        for k in sub:
            old_t, new_t = old_t[k], new_t[k]
        changed = sum(
            float(jnp.sum(jnp.abs(a - b)))
            for a, b in zip(jax.tree.leaves(old_t), jax.tree.leaves(new_t))
        )
        assert changed > 0, f"{group} did not train"

    state2, metrics2 = step_fn(state1, sbatch)
    assert int(state2.step) == 2


def test_frozen_trunk_stop_gradient_matches_apply_freeze(setup):
    """The stop_gradient freeze (requires_grad=False semantics) must yield
    the same updated params as apply_freeze alone — it only removes dead
    backward work, never changes trainable gradients."""
    cfg, model, params, tx, batch = setup
    mesh = make_mesh()
    mask = freeze_backbone_mask(params)
    sbatch = shard_batch(mesh, batch)

    outs = []
    for m in (None, mask):
        step_fn = shard_train_step(
            make_train_step(model, tx, cfg.model.stabilize,
                            trainable_mask=m), mesh, donate=False
        )
        state = create_train_state(params, tx, jax.random.PRNGKey(7))
        s1, met = step_fn(state, sbatch)
        outs.append((s1, met))
    (s_a, m_a), (s_b, m_b) = outs
    np.testing.assert_allclose(
        float(m_a["total_loss"]), float(m_b["total_loss"]), rtol=1e-6
    )
    for a, b in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            rtol=2e-5, atol=2e-6,
        )


def test_skip_on_nonfinite_batch(setup):
    cfg, model, params, tx, batch = setup
    mesh = make_mesh()
    step_fn = shard_train_step(
        make_train_step(model, tx, cfg.model.stabilize), mesh, donate=False
    )
    state = create_train_state(params, tx, jax.random.PRNGKey(3))
    bad = dict(batch)
    # NaN pixels poison the whole forward -> non-finite loss -> skip.
    bad["image"] = batch["image"].at[0, 0, 0, 0].set(jnp.nan)
    sbatch = shard_batch(mesh, bad)
    state1, metrics = step_fn(state, sbatch)
    assert float(metrics["skipped"]) == 1.0
    # Params unchanged on skip.
    for a, b in zip(
        jax.tree.leaves(params), jax.tree.leaves(state1.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nan_first_step_does_not_poison_ema(setup):
    """A non-finite loss on the FIRST step must leave the EMA at the -1
    'uninitialized' sentinel: initializing it to 0 would make every later
    finite loss trip `total > 4 * ema` (and, with the EMA frozen on
    skipped steps, training would silently skip forever)."""
    cfg, model, params, tx, batch = setup
    mesh = make_mesh()
    step_fn = shard_train_step(
        make_train_step(model, tx, cfg.model.stabilize), mesh, donate=False
    )
    state = create_train_state(params, tx, jax.random.PRNGKey(5))
    bad = dict(batch)
    bad["image"] = batch["image"].at[0, 0, 0, 0].set(jnp.nan)
    state1, m1 = step_fn(state, shard_batch(mesh, bad))
    assert float(m1["skipped"]) == 1.0
    assert float(state1.loss_ema) < 0  # sentinel preserved

    # The next FINITE step must train normally (not be flagged exploded).
    state2, m2 = step_fn(state1, shard_batch(mesh, batch))
    assert float(m2["skipped"]) == 0.0
    assert float(state2.loss_ema) > 0
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state1.params),
                        jax.tree.leaves(state2.params))
    )
    assert changed


def test_restart_restores_initial_state_and_rebuilds_iterator():
    """Divergence before any checkpoint must restore the INITIAL state (not
    keep diverged weights) and pull a fresh data stream
    (reference train_net.py:296-325 full teardown)."""
    import itertools

    from ovmono3d_tpu.config import Config, load_config
    from ovmono3d_tpu.train.loop import train

    cfg = load_config(None, overrides=[
        "model.stabilize=0.5", "solver.max_iter=6",
        "solver.checkpoint_period=2", "solver.max_training_attempts=5",
        "test.eval_period=0",
    ])

    from flax import struct

    @struct.dataclass
    class S:
        params: jax.Array
        step: jax.Array
        skipped: jax.Array

    state0 = S(params=jnp.zeros(()), step=jnp.zeros((), jnp.int32),
               skipped=jnp.zeros((), jnp.int32))
    made_iters = []

    def factory(attempt):
        made_iters.append(attempt)
        return itertools.count()

    calls = {"n": 0}

    def step_fn(state, batch):
        calls["n"] += 1
        diverge = calls["n"] <= 2   # first two steps skip -> restart
        return S(
            params=state.params + 1.0,          # drift to detect restore
            step=state.step + 1,
            skipped=state.skipped + jnp.int32(diverge),
        ), {"total_loss": jnp.zeros(())}

    final = train(cfg, state0, step_fn, iter(itertools.count()),
                  checkpointer=None, data_iter_factory=factory)
    # One restart happened (2 skipped of first 2 >= 0.5 after period//2=1).
    assert made_iters, "data_iter_factory never invoked on restart"
    # After restore, training re-ran max_iter steps from the initial state:
    # params counts only post-restart steps.
    assert int(final.step) == 6
    assert float(final.params) == 6.0 - 0.0  # restored to 0 then +1 per step


def test_optimizer_types():
    import jax.numpy as jnp

    from ovmono3d_tpu.config import SolverConfig
    from ovmono3d_tpu.train.optim import build_optimizer

    params = {"params": {"dense": {"kernel": jnp.ones((4, 4)),
                                   "bias": jnp.zeros(4)}}}
    grads = jax.tree.map(jnp.ones_like, params)
    for kind in ("sgd", "adam", "adamw", "adam+amsgrad", "adamw+amsgrad"):
        tx = build_optimizer(SolverConfig(type=kind, warmup_iters=0), params)
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        for u in jax.tree.leaves(updates):
            assert np.all(np.isfinite(np.asarray(u))), kind


def test_repeated_steps_reduce_loss(setup):
    """Overfit signal: ~20 sharded steps on one fixed batch must cut the
    total loss — catches decode/loss sign errors and optimizer plumbing
    that single-step update tests cannot (reference training sanity:
    losses fall from the first iterations, train_net.py:199-250)."""
    cfg, model, params, tx, batch = setup
    mesh = make_mesh()
    step_fn = shard_train_step(
        make_train_step(model, tx, cfg.model.stabilize,
                        trainable_mask=freeze_backbone_mask(params)),
        mesh, donate=False,
    )
    state = create_train_state(params, tx, jax.random.PRNGKey(2))
    sbatch = shard_batch(mesh, batch)
    losses = []
    for _ in range(20):
        state, metrics = step_fn(state, sbatch)
        losses.append(float(metrics["total_loss"]))
        assert float(metrics["skipped"]) == 0.0
    first = np.mean(losses[:3])
    last = np.mean(losses[-3:])
    assert np.isfinite(last)
    assert last < 0.85 * first, (first, last, losses)


def test_grad_accumulation_matches_single_step(setup):
    """with_grad_accum(k=2): two micro-steps on the SAME batch (rng pinned)
    reproduce exactly one un-accumulated SGD step — micro-gradients are
    averaged — and the first micro-step changes no parameters."""
    from ovmono3d_tpu.train.optim import with_grad_accum

    cfg, model, params, tx, batch = setup
    micro = {k: v[:2] for k, v in batch.items()}

    step_plain = jax.jit(make_train_step(model, tx, cfg.model.stabilize))
    tx_acc = with_grad_accum(tx, 2)
    step_acc = jax.jit(make_train_step(model, tx_acc, cfg.model.stabilize))

    rng = jax.random.PRNGKey(7)
    ref_state = create_train_state(params, tx, rng)
    ref_state, _ = step_plain(ref_state, micro)

    acc_state = create_train_state(params, tx_acc, rng)
    acc_state, _ = step_acc(acc_state, micro)
    # k=2: no parameter change after the first micro-step
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        acc_state.params, params,
    )
    # pin the rng so the second micro-step sees the identical gradient
    acc_state = acc_state.replace(rng=rng)
    acc_state, _ = step_acc(acc_state, micro)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6,
            rtol=1e-5,
        ),
        acc_state.params, ref_state.params,
    )


def test_loss_ema_reference_semantics(setup):
    """The stabilization rolling mean matches the reference exactly
    (train_net.py:231-250): initialized to 2x the first loss, updated with
    GAMMA=0.02 only on NON-diverging steps, and frozen on skips — folding
    an exploded loss in would mask subsequent divergence."""
    from ovmono3d_tpu.parallel.train_step import GAMMA, TOLERANCE

    cfg, model, params, tx, batch = setup
    mesh = make_mesh()
    step_fn = shard_train_step(
        make_train_step(model, tx, cfg.model.stabilize), mesh, donate=False
    )
    state = create_train_state(params, tx, jax.random.PRNGKey(4))
    sbatch = shard_batch(mesh, batch)

    # step 1: ema = (2*loss)*(1-g) + loss*g
    state, m1 = step_fn(state, sbatch)
    loss1 = float(m1["total_loss"])
    want = 2.0 * loss1 * (1 - GAMMA) + loss1 * GAMMA
    np.testing.assert_allclose(float(state.loss_ema), want, rtol=1e-5)

    # poisoned step: skip + ema FROZEN
    ema_before = float(state.loss_ema)
    bad = dict(batch)
    bad["image"] = batch["image"].at[0, 0, 0, 0].set(jnp.nan)
    state, m2 = step_fn(state, shard_batch(mesh, bad))
    assert float(m2["skipped"]) == float(m1["skipped"]) + 1.0 or float(
        state.skipped
    ) >= 1.0
    np.testing.assert_allclose(float(state.loss_ema), ema_before, rtol=0)

    # normal step: ema moves by the reference's gain
    state, m3 = step_fn(state, sbatch)
    loss3 = float(m3["total_loss"])
    if np.isfinite(loss3) and loss3 <= TOLERANCE * ema_before:
        want = ema_before * (1 - GAMMA) + loss3 * GAMMA
        np.testing.assert_allclose(float(state.loss_ema), want, rtol=1e-5)
