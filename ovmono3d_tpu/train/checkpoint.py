"""Checkpointing: single rolling checkpoint + terminal final (orbax).

Re-design of cubercnn/solver/checkpoint.py `PeriodicCheckpointerOnlyOne`
(SURVEY.md §5): one rolling `model_recent` overwritten every period and a
`model_final` at the end, holding params + optimizer state + step — the
recovery target for the stabilization restart loop.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp


class SingleCheckpointer:
    def __init__(self, output_dir: str | Path):
        self.dir = Path(output_dir).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self._ckpt = ocp.PyTreeCheckpointer()

    def _path(self, name: str) -> Path:
        return self.dir / name

    def save(self, state: Any, name: str = "model_recent"):
        path = self._path(name)
        self._ckpt.save(path, jax.tree.map(lambda x: x, state), force=True)

    def load(self, template: Any, name: str = "model_recent") -> Any | None:
        path = self._path(name)
        if not path.exists():
            return None
        return self._ckpt.restore(path, item=template)

    def load_subtree(self, key: str, template: Any,
                     name: str = "model_recent") -> Any | None:
        """Restore one top-level entry (e.g. 'params') of a saved
        TrainState — evaluation loads a TRAINING checkpoint without
        reconstructing its optimizer state (orbax restores strictly
        against the full structure otherwise)."""
        path = self._path(name)
        if not path.exists():
            return None
        raw = self._ckpt.restore(path)     # nested dicts, full tree
        if key not in raw:
            return None
        sub = raw[key]
        # Re-shape onto the template's pytree structure (dataclass/dict).
        leaves = jax.tree.leaves(sub)
        treedef = jax.tree.structure(template)
        return jax.tree.unflatten(treedef, leaves)

    def has(self, name: str = "model_recent") -> bool:
        return self._path(name).exists()
