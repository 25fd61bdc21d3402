"""Checkpoint / resume for learner + env-state pytrees.

The reference delegates checkpointing to its RL libraries (``model.save``
at MPI rank 0, ``run.py:186-188``; ``load_path`` threading,
``train_hovering.py:86-89``) and never checkpoints env state.  Here the
entire :class:`~reinmav_tpu.rl.ppo.TrainState` — params, optimiser state,
*and* the batched env states — is one array pytree, so save/restore is a
single orbax call and training resumes bitwise-identically (SURVEY.md §5).
"""

from __future__ import annotations

import os

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(path: str, tree) -> None:
    """Save a pytree checkpoint (host-0 only in multi-process runs)."""
    path = os.path.abspath(path)
    # Gather to host before writing: orbax handles sharded arrays natively,
    # but local single-host saving is the common case here.
    tree = jax.device_get(tree)
    _checkpointer().save(path, tree, force=True)


def restore(path: str, target):
    """Restore into the structure of ``target`` (dtypes/shapes preserved)."""
    path = os.path.abspath(path)
    restored = _checkpointer().restore(path, item=jax.device_get(target))
    return jax.tree.map(lambda ref, x: jax.numpy.asarray(x, getattr(ref, "dtype", None)), target, restored)
