"""Checkpoint / resume for learner + env-state pytrees.

The reference delegates checkpointing to its RL libraries (``model.save``
at MPI rank 0, ``run.py:186-188``; ``load_path`` threading,
``train_hovering.py:86-89``) and never checkpoints env state.  Here the
entire :class:`~reinmav_tpu.rl.ppo.TrainState` — params, optimiser state,
*and* the batched env states — is one array pytree, so save/restore is a
single orbax call and training resumes bitwise-identically (SURVEY.md §5).

Multi-host correctness: the reference's rank-0 ``model.save`` worked
because params were host-local; here the env batch is a *global* array
with non-addressable shards on other hosts, so **every process must call
:func:`save` and :func:`restore` collectively** — orbax writes each
host's addressable shards and barrier-syncs.  Nothing is gathered to
host 0; restore materialises arrays directly onto each target leaf's own
sharding (mesh-sharded env batch stays mesh-sharded).

Uses the modern ``ocp.StandardCheckpointer`` + ``ocp.args`` API (the
``PyTreeCheckpointer``/``item=`` surface is deprecated and already removed
in newer orbax).  Structure mismatches between the on-disk tree and the
restore target (e.g. a checkpoint written with different ``hidden`` or
``num_envs``) raise a clear :class:`CheckpointStructureError`; genuine
I/O failures (missing path, permissions) keep their real exception types.
"""

from __future__ import annotations

import os

import jax


class CheckpointStructureError(ValueError):
    """The checkpoint's pytree structure does not match the restore target
    (different network size, env count, or TrainState layout)."""


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save(path: str, tree) -> None:
    """Save a pytree checkpoint.

    Collective in multi-process runs: every process calls this with the
    same global-array pytree; orbax writes each process's addressable
    shards and synchronises.  (Do NOT gate behind ``process_index()==0``
    — a lone host-0 save of a sharded array would deadlock or drop the
    other hosts' shards.)
    """
    path = os.path.abspath(path)
    with _checkpointer() as cp:
        cp.save(path, tree, force=True)


def _abstract_leaf(x):
    """Restore template leaf: shape/dtype/sharding of the target — orbax
    materialises the restored array directly with the target's layout
    (sharded leaves come back sharded; no host gather)."""
    if isinstance(x, jax.Array):
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
    return x


def restore(path: str, target):
    """Restore into the structure/shapes/shardings of ``target``.

    Collective in multi-process runs (see :func:`save`).  Raises
    :class:`FileNotFoundError` when no checkpoint exists at ``path``,
    :class:`CheckpointStructureError` when the saved tree does not fit
    the target's treedef/shapes/dtypes, and re-raises genuine I/O errors
    unchanged.
    """
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"no checkpoint directory at {path}")
    template = jax.tree.map(_abstract_leaf, target)
    try:
        with _checkpointer() as cp:
            return cp.restore(path, template)
    except OSError:
        # Missing files / permissions / I-O failures are not structure
        # mismatches — surface them as what they are.
        raise
    except Exception as e:  # orbax raises assorted types on tree mismatch
        msg = str(e).lower()
        structural = any(
            token in msg
            for token in (
                "structure", "shape", "dtype", "mismatch", "tree",
                "does not match", "missing", "unexpected", "key",
            )
        )
        if not structural:
            raise
        raise CheckpointStructureError(
            f"checkpoint at {path} does not match the restore target "
            f"(was it written with a different network width, num_envs, or "
            f"TrainState layout?): {type(e).__name__}: {e}"
        ) from e
