"""Checkpoint / resume for learner + env-state pytrees.

The reference delegates checkpointing to its RL libraries (``model.save``
at MPI rank 0, ``run.py:186-188``; ``load_path`` threading,
``train_hovering.py:86-89``) and never checkpoints env state.  Here the
entire :class:`~reinmav_tpu.rl.ppo.TrainState` — params, optimiser state,
*and* the batched env states — is one array pytree, so save/restore is a
single orbax call and training resumes bitwise-identically (SURVEY.md §5).

Uses the modern ``ocp.StandardCheckpointer`` + ``ocp.args`` API (the
``PyTreeCheckpointer``/``item=`` surface is deprecated and already removed
in newer orbax).  Structure mismatches between the on-disk tree and the
restore target (e.g. a checkpoint written with different ``hidden`` or
``num_envs``) raise a clear :class:`CheckpointStructureError` instead of
an opaque orbax traceback.
"""

from __future__ import annotations

import os

import jax
import numpy as np


class CheckpointStructureError(ValueError):
    """The checkpoint's pytree structure does not match the restore target
    (different network size, env count, or TrainState layout)."""


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save(path: str, tree) -> None:
    """Save a pytree checkpoint (host-0 only in multi-process runs)."""
    path = os.path.abspath(path)
    # Gather to host before writing: orbax handles sharded arrays natively,
    # but local single-host saving is the common case here.
    tree = jax.device_get(tree)
    with _checkpointer() as cp:
        cp.save(path, tree, force=True)


def restore(path: str, target):
    """Restore into the structure of ``target`` (dtypes/shapes of the
    target are preserved; raises :class:`CheckpointStructureError` when
    the saved tree does not fit the target's treedef/shapes)."""
    path = os.path.abspath(path)
    host_target = jax.device_get(target)
    try:
        with _checkpointer() as cp:
            restored = cp.restore(path, host_target)
    except Exception as e:  # orbax raises various internal error types
        raise CheckpointStructureError(
            f"checkpoint at {path} does not match the restore target "
            f"(was it written with a different network width, num_envs, or "
            f"TrainState layout?): {type(e).__name__}: {e}"
        ) from e
    mismatches = []

    def _check(kp, ref, x):
        if np.shape(ref) != np.shape(x):
            mismatches.append(
                f"  {jax.tree_util.keystr(kp)}: target {np.shape(ref)} vs "
                f"checkpoint {np.shape(x)}"
            )
        return x

    try:
        restored = jax.tree_util.tree_map_with_path(_check, host_target, restored)
    except ValueError as e:
        raise CheckpointStructureError(
            f"checkpoint at {path} has a different pytree structure than the "
            f"restore target: {e}"
        ) from e
    if mismatches:
        raise CheckpointStructureError(
            f"checkpoint at {path} has mismatched array shapes:\n"
            + "\n".join(mismatches)
        )
    return jax.tree.map(
        lambda ref, x: jax.numpy.asarray(x, getattr(ref, "dtype", None)),
        target,
        restored,
    )
