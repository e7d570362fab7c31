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

    def has(self, name: str = "model_recent") -> bool:
        return self._path(name).exists()
