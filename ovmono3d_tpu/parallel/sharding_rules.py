"""Tensor-parallel parameter shardings over the mesh `model` axis.

The reference has no TP (SURVEY.md §2.2: "optional pjit sharding of ViT-L").
Here: Megatron-style sharding of the transformer trunk — the MLP up
projection and fused qkv shard their OUTPUT features, the MLP down and
attention out projections shard their INPUT features, so each block needs a
single all-reduce (inserted automatically by GSPMD) per branch. Everything
else is replicated.

Usage:
    shardings = tp_param_shardings(params, mesh)
    params = jax.device_put(params, shardings)
    # jit infers from committed input shardings; the train step needs no
    # explicit in_shardings.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# module-name -> which kernel axis is sharded over 'model'
_COL_PARALLEL = ("fc1", "qkv")     # shard output features
_ROW_PARALLEL = ("fc2", "proj")    # shard input features


def _spec_for(path, leaf, axis: str) -> P:
    keys = [getattr(p, "key", str(p)) for p in path]
    if keys and keys[-1] == "kernel" and getattr(leaf, "ndim", 0) == 2:
        parent = keys[-2] if len(keys) >= 2 else ""
        if parent in _COL_PARALLEL:
            return P(None, axis)
        if parent in _ROW_PARALLEL:
            return P(axis, None)
    if keys and keys[-1] == "bias" and len(keys) >= 2 and \
            keys[-2] in _COL_PARALLEL:
        return P(axis)
    return P()


def tp_param_shardings(params, mesh: Mesh, axis: str = "model"):
    """NamedSharding tree: transformer kernels split over `axis`."""
    if mesh.shape.get(axis, 1) == 1:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)

    def rule(path, leaf):
        spec = _spec_for(path, leaf, axis)
        # Only shard when the dimension divides evenly.
        for dim, name in zip(getattr(leaf, "shape", ()), spec):
            if name is not None and dim % mesh.shape[axis] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(rule, params)


def apply_tp(params, mesh: Mesh, axis: str = "model"):
    """Commit params onto the mesh with TP shardings."""
    return jax.device_put(params, tp_param_shardings(params, mesh, axis))
