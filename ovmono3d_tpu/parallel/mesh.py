"""Device mesh + sharding helpers.

The reference's only parallelism is NCCL data parallelism via DDP
(SURVEY.md §2.2). TPU-native plan: a `jax.sharding.Mesh` with a `data` axis;
batches are sharded over it, params replicated, gradient psums inserted by
XLA over ICI. The mesh is 2-D (`data`, `model`) so tensor-parallel shardings
of the ViT (future large trunks) slot in without re-plumbing callers.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None, n_model: int = 1, devices=None
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis sharded over `data`, everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch dict/pytree with the batch axis over `data`."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding), batch
    )


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None):
    """Initialize jax.distributed for multi-host training (the reference's
    detectron2 `launch(num_machines, machine_rank, dist_url)` equivalent,
    SURVEY.md §2.2). No-op when no coordinator is given or when the
    distributed client is already up.

    MUST NOT probe jax.process_count() first: that initializes the backend
    and makes jax.distributed.initialize raise — and swallowing that error
    would silently run an N-host job as N independent single-host jobs
    (duplicated eval, no gradient sync). Probe the distributed client's own
    state instead, and let a too-late call FAIL loudly.

    `num_processes`/`process_id` are required for manual (non-cluster)
    launches — detectron2's launch() passes the equivalent
    num_machines/machine_rank; in managed clusters (SLURM etc.) JAX
    auto-detects them and they can stay None."""
    if coordinator is None:
        return
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_shard(records: list, process_index: int | None = None,
                  process_count: int | None = None) -> list:
    """Disjoint per-host slice of a record list (InferenceSampler semantics
    across hosts; the train iterator's weighted sampling instead uses a
    per-host RNG seed offset)."""
    import jax

    pi = process_index if process_index is not None else jax.process_index()
    pc = process_count if process_count is not None else jax.process_count()
    return records[pi::pc]


def _pack_objects(items: list) -> np.ndarray:
    """Pickle an object list into a uint8 payload array."""
    import pickle

    return np.frombuffer(pickle.dumps(items), np.uint8)


def _unpack_objects(sizes, rows) -> list:
    """Inverse of _pack_objects over gathered (per-process) padded rows."""
    import pickle

    out = []
    for size, row in zip(np.asarray(sizes).ravel(), np.asarray(rows)):
        out.extend(pickle.loads(row[: int(size)].tobytes()))
    return out


def gather_objects(items: list) -> list:
    """Concatenated per-host object lists, identical on every host.

    The reference gathers per-rank eval JSON to rank 0 with comm.gather
    (omni3d_evaluation.py:717-723); over DCN we allgather a pickled
    payload (hosts stay symmetric, so the evaluator can run anywhere).
    Single-process: identity."""
    import jax

    if jax.process_count() == 1:
        return list(items)
    from jax.experimental import multihost_utils

    payload = _pack_objects(items)
    sizes = multihost_utils.process_allgather(
        np.array([payload.size], np.int64)
    )
    padded = np.zeros(int(np.max(sizes)), np.uint8)
    padded[: payload.size] = payload
    rows = multihost_utils.process_allgather(padded)
    return _unpack_objects(sizes, rows)
