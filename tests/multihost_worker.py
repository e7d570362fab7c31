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


def main():
    coordinator, pid, nproc, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

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
