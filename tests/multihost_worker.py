"""Worker process for tests/test_multihost.py (2-process jax.distributed).

Run as: python tests/multihost_worker.py <coordinator> <process_id> \
            <num_processes> <out_json>

Env must pin JAX_PLATFORMS=cpu BEFORE the interpreter starts (the axon
sitecustomize force-registers the tunneled TPU; a second process probing
it deadlocks the relay — CLAUDE.md). This worker re-pins via
jax.config.update as well, the same belt-and-braces as tests/conftest.py.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_tiny_train_setup():
    """Deterministic tiny model + optimizer + global batch, shared by the
    2-process worker AND the single-process reference computation in
    test_multihost.py — both sides must construct bit-identical inputs."""
    import dataclasses

    import jax
    import numpy as np

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from test_model import tiny_config
    from test_train_step import _train_batch

    from ovmono3d_tpu.models.rcnn3d import build_model
    from ovmono3d_tpu.train.optim import (
        apply_freeze,
        build_optimizer,
        freeze_backbone_mask,
    )

    cfg = tiny_config()
    solver = dataclasses.replace(
        cfg.solver, base_lr=0.01, warmup_iters=0, steps=()
    )
    cfg = dataclasses.replace(cfg, solver=solver)
    model = build_model(cfg.model)
    batch = jax.tree.map(np.asarray, _train_batch(8))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(1),
        batch["image"][:2], batch["K"][:2], batch["im_hw"][:2],
        batch["im_scale_ratio"][:2],
    )
    mask = freeze_backbone_mask(params)
    tx = apply_freeze(build_optimizer(cfg.solver, params), mask)
    return cfg, model, params, tx, mask, batch


def params_digest(params) -> str:
    """Order-stable sha256 over every leaf's raw bytes — bit-match proof."""
    import hashlib

    import jax
    import numpy as np

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    flat = sorted(flat, key=lambda kv: jax.tree_util.keystr(kv[0]))
    h = hashlib.sha256()
    for path, leaf in flat:
        h.update(np.asarray(leaf).tobytes())
    return h.hexdigest()


def run_sharded_train_steps(mesh, n_steps: int = 2):
    """The PRODUCTION sharded train step (parallel/train_step.py: params
    replicated, batch sharded over `data`, in-graph stabilization) on the
    given mesh — single- or multi-process. Returns (losses, skipped,
    host_params after n_steps)."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ovmono3d_tpu.parallel.train_step import (
        create_train_state,
        make_train_step,
        shard_train_step,
    )

    cfg, model, params, tx, mask, batch = build_tiny_train_setup()
    step_fn = shard_train_step(
        make_train_step(model, tx, cfg.model.stabilize,
                        trainable_mask=mask),
        mesh, donate=False,
    )
    state = create_train_state(params, tx, jax.random.PRNGKey(2))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    # Global placement that works in BOTH topologies: every process holds
    # the full host batch/state and contributes its addressable shards.
    state = jax.tree.map(
        lambda x: jax.make_array_from_callback(
            np.shape(x), repl, lambda idx, x=x: np.asarray(x)[idx]
        ),
        state,
    )
    sbatch = {
        k: jax.make_array_from_callback(
            v.shape, data, lambda idx, v=v: v[idx]
        )
        for k, v in batch.items()
    }
    # AOT-compile, THEN line both processes up at a coordination-service
    # barrier before the first execution: tiny-model compiles take ~60-90 s
    # on a cold cache and gloo's cross-process rendezvous inside the step's
    # gradient psum times out at 30 s — a process that dispatches while its
    # peer is still compiling kills the run (observed: "Gloo context
    # initialization failed: GetKeyValue() timed out").
    compiled = step_fn.lower(state, sbatch).compile()
    if jax.process_count() > 1:
        from jax._src import distributed

        distributed.global_state.client.wait_at_barrier(
            "ovmono3d_train_step_compiled", 300_000
        )
    losses, skipped = [], []
    for _ in range(n_steps):
        state, metrics = compiled(state, sbatch)
        losses.append(float(np.asarray(metrics["total_loss"])))
        skipped.append(float(np.asarray(metrics["skipped"])))
    return losses, skipped, jax.device_get(state.params)


def flat_params(params) -> dict:
    """{keystr: np.ndarray} in stable order (for npz round-trips)."""
    import jax
    import numpy as np

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {
        jax.tree_util.keystr(p): np.asarray(l)
        for p, l in sorted(flat, key=lambda kv: jax.tree_util.keystr(kv[0]))
    }


def main():
    coordinator, pid, nproc, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "basic"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache"
    )

    if mode == "train":
        # The DDP-equivalent production train step across a REAL process
        # boundary (round-3 VERDICT weak item 3): gradient psum + in-graph
        # stabilization over a global 2-process mesh
        # (reference tools/train_net.py:455-460, loss all-reduce 499-505).
        import numpy as np
        from jax.sharding import Mesh

        from ovmono3d_tpu.parallel.mesh import init_multihost

        init_multihost(coordinator, num_processes=nproc, process_id=pid)
        assert jax.process_count() == nproc
        mesh = Mesh(np.array(jax.devices()), ("data",))
        losses, skipped, host_params = run_sharded_train_steps(mesh)
        np.savez(out_path + ".npz", **flat_params(host_params))
        Path(out_path).write_text(json.dumps({
            "process_id": pid,
            "n_global_devices": jax.device_count(),
            "losses": losses,
            "skipped": skipped,
            "params_digest": params_digest(host_params),
        }))
        return

    from ovmono3d_tpu.parallel.mesh import (
        gather_objects,
        init_multihost,
        process_shard,
    )

    init_multihost(coordinator, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid

    # The eval-gather flow (reference comm.gather of per-rank JSON,
    # omni3d_evaluation.py:717-723): disjoint shard -> per-host results ->
    # allgather; every host must see the full, identically-ordered list.
    records = [{"image_id": i, "ap": i * 0.5} for i in range(7)]
    shard = process_shard(records)
    local = [{"image_id": r["image_id"], "ap": r["ap"] + 100 * pid}
             for r in shard]
    gathered = gather_objects(local)

    # A cross-process collective on actual device arrays: global sum over
    # one array per process.
    import numpy as np
    from jax.experimental import multihost_utils

    rows = multihost_utils.process_allgather(
        np.full((2,), float(pid + 1), np.float32)
    )
    total = float(np.sum(rows))

    # A jitted computation over a GLOBAL mesh spanning both processes:
    # batch mean of a data-sharded array (the DP gradient-psum pattern of
    # parallel/train_step.py) — XLA inserts the cross-process collective.
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("data",))
    n_global = jax.device_count()
    local = np.arange(
        pid * 2, pid * 2 + 2, dtype=np.float32
    )[:, None] * np.ones((1, 8), np.float32)  # rows pid*2, pid*2+1
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local, (n_global, 8)
    )
    mean = jax.jit(
        lambda x: jnp.mean(x),
        in_shardings=NamedSharding(mesh, P("data")),
        out_shardings=NamedSharding(mesh, P()),
    )(garr)
    global_mean = float(jax.device_get(mean))  # rows 0..3 -> mean 1.5

    Path(out_path).write_text(json.dumps({
        "process_id": pid,
        "n_local_devices": jax.local_device_count(),
        "n_global_devices": jax.device_count(),
        "shard_ids": [r["image_id"] for r in shard],
        "gathered": gathered,
        "allgather_sum": total,
        "global_mean": global_mean,
    }))


if __name__ == "__main__":
    main()
