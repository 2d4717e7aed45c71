"""Checkpoint / resume via Orbax.

The reference has no model checkpointing (no tf.train.Saver anywhere); its
only persistence is the AdvDiff results record (scipy.io.savemat,
AdvDiff.py:500-508 — covered by utils/records.py).  Periodic parameter +
optimizer-state checkpointing with resume is the TPU-native equivalent of the
missing failure-recovery story (SURVEY.md section 5).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class Checkpointer:
    """Thin Orbax wrapper: save/restore {params, opt_state} keyed by step.

    `keep_last` bounds disk usage: older step directories are deleted after
    each save (0 = keep everything)."""

    def __init__(self, directory: str, keep_last: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep_last = keep_last
        self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}")

    def save(self, step: int, params: Any, opt_state: Any) -> None:
        tree = {"params": params, "opt_state": opt_state}
        self._ckptr.save(self._path(step), tree, force=True)
        if self.keep_last:
            self._prune()

    def _steps(self):
        return sorted(
            int(name.split("_")[1])
            for name in os.listdir(self.directory)
            if name.startswith("step_")
        )

    def _prune(self) -> None:
        import shutil

        for step in self._steps()[: -self.keep_last]:
            shutil.rmtree(self._path(step), ignore_errors=True)

    def latest_step(self) -> Optional[int]:
        steps = self._steps()
        return steps[-1] if steps else None

    def restore(self, step: Optional[int] = None, like: Any = None):
        """Restore (step, {params, opt_state}). `like` provides the target
        pytree structure/shardings (pass {"params": ..., "opt_state": ...})."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        if like is not None:
            restored = self._ckptr.restore(self._path(step), item=like)
        else:
            restored = self._ckptr.restore(self._path(step))
        return step, restored
