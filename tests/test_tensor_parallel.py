"""Tensor-parallel sharding over a (data=4, model=2) mesh."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ovmono3d_tpu.parallel.mesh import make_mesh, shard_batch
from ovmono3d_tpu.parallel.sharding_rules import (
    apply_tp,
    tp_param_shardings,
)
from ovmono3d_tpu.parallel.train_step import (
    create_train_state,
    make_train_step,
    shard_train_step,
)
from ovmono3d_tpu.train.optim import build_optimizer


def test_tp_sharding_specs():
    from test_model import tiny_config
    from ovmono3d_tpu.models.rcnn3d import build_model

    cfg = tiny_config()
    model = build_model(cfg.model)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 112, 112, 3)), jnp.eye(3)[None],
        jnp.full((1, 2), 112, jnp.int32), jnp.ones((1,)),
    )
    mesh = make_mesh(n_data=4, n_model=2)
    sh = tp_param_shardings(params, mesh)
    blk = sh["params"]["backbone"]["vit"]["block0"]
    # fc1/qkv column-parallel, fc2/proj row-parallel.
    assert blk["mlp"]["fc1"]["kernel"].spec == jax.sharding.PartitionSpec(
        None, "model"
    )
    assert blk["mlp"]["fc2"]["kernel"].spec == jax.sharding.PartitionSpec(
        "model", None
    )
    assert blk["attn"]["qkv"]["kernel"].spec == jax.sharding.PartitionSpec(
        None, "model"
    )
    # LayerNorms replicated.
    assert blk["norm1"]["scale"].spec == jax.sharding.PartitionSpec()


def test_tp_train_step_runs():
    import sys

    sys.path.insert(0, "tests")
    from test_model import tiny_config
    from test_train_step import _train_batch
    from ovmono3d_tpu.models.rcnn3d import build_model

    cfg = tiny_config()
    solver = dataclasses.replace(
        cfg.solver, base_lr=0.01, warmup_iters=0, steps=()
    )
    model = build_model(cfg.model)
    batch = _train_batch(8)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(1),
        batch["image"][:2], batch["K"][:2], batch["im_hw"][:2],
        batch["im_scale_ratio"][:2],
    )
    mesh = make_mesh(n_data=4, n_model=2)
    params = apply_tp(params, mesh)
    tx = build_optimizer(solver, params)
    state = create_train_state(params, tx, jax.random.PRNGKey(2))
    step_fn = shard_train_step(
        make_train_step(model, tx, 0.01), mesh, donate=False,
        infer_state_sharding=True,
    )
    # Batch sharded over data (replicated over model implicitly).
    sbatch = shard_batch(mesh, batch)
    state1, metrics = step_fn(state, sbatch)
    assert np.isfinite(float(metrics["total_loss"]))
    # TP shardings preserved through the update.
    k = state1.params["params"]["backbone"]["vit"]["block0"]["mlp"]["fc1"][
        "kernel"
    ]
    assert "model" in str(k.sharding.spec)
    state2, metrics2 = step_fn(state1, sbatch)
    assert np.isfinite(float(metrics2["total_loss"]))
