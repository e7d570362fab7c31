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
