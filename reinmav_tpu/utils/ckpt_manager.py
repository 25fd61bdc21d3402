"""Rotating checkpoint manager: periodic saves, keep-last-N, latest-resume.

Builds on :mod:`reinmav_tpu.utils.checkpoint` (orbax pytree save/restore)
with the bookkeeping a long training run needs — the role baselines'
``save_interval`` + log-dir convention played for the reference
(``train_hovering.py:86-89``), plus crash-resume discovery.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Optional

import jax

from . import checkpoint as ckpt

_STEP_RE = re.compile(r"^step_(\d+)$")


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3, save_interval: int = 1):
        self.directory = os.path.abspath(directory)
        self.keep = keep
        self.save_interval = max(1, save_interval)
        self.is_main = jax.process_index() == 0
        if self.is_main:
            os.makedirs(self.directory, exist_ok=True)

    def _step_dirs(self):
        if not os.path.isdir(self.directory):
            return []
        out = []
        for name in os.listdir(self.directory):
            m = _STEP_RE.match(name)
            if m:
                out.append((int(m.group(1)), os.path.join(self.directory, name)))
        return sorted(out)

    def latest_step(self) -> Optional[int]:
        dirs = self._step_dirs()
        return dirs[-1][0] if dirs else None

    def save(self, step: int, tree, force: bool = False) -> bool:
        """Save if due (step % save_interval == 0) — host 0 only.  Old
        checkpoints beyond ``keep`` are deleted."""
        if not self.is_main:
            return False
        if not force and step % self.save_interval != 0:
            return False
        ckpt.save(os.path.join(self.directory, f"step_{step}"), tree)
        for s, path in self._step_dirs()[: -self.keep]:
            shutil.rmtree(path, ignore_errors=True)
        return True

    def restore_latest(self, target):
        """Restore the newest checkpoint into ``target``'s structure, or
        return ``target`` unchanged if none exist.  Returns (tree, step)."""
        step = self.latest_step()
        if step is None:
            return target, None
        return ckpt.restore(os.path.join(self.directory, f"step_{step}"), target), step
