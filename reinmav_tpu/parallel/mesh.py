"""Device-mesh sharding for batched environment stepping and training.

The reference's parallelism is all external (SURVEY.md §2.2): subprocess
vec-envs (baselines ``make_vec_env``, ``run.py:73-94``) for env data
parallelism, and MPI gradient averaging inside baselines for the learner.
The TPU-native replacement: a ``jax.sharding.Mesh`` with the env batch
axis sharded across every chip; steps/rollouts are jitted with sharding
constraints so XLA keeps each shard resident on its device and emits ICI
collectives only where the learner needs reductions (``psum`` of
gradients — see :mod:`reinmav_tpu.rl.ppo`).

On a multi-host pod slice the same code runs under
``jax.distributed.initialize`` — the mesh spans all processes' devices and
the batch axis is globally sharded (DCN handled by XLA across slices).
Tests exercise this on a virtual 8-device CPU mesh
(``xla_force_host_platform_device_count``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "env_batch"


def make_mesh(devices: Sequence[jax.Device] | None = None, axis_name: str = BATCH_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices with the env-batch axis.

    For rollout workloads the batch axis is the only parallel axis
    (SURVEY.md §2.2 P1/P2): dynamics are tiny elementwise math, so sharding
    envs — not model weights — is the right decomposition.
    """
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = BATCH_AXIS) -> NamedSharding:
    """Sharding for (B, ...) arrays: batch split over the mesh, features
    replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis_name: str = BATCH_AXIS):
    """Place a host pytree of (B, ...) arrays onto the mesh, batch-sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def sharded_dense_rollout(env, mesh: Mesh, states, key: jax.Array, horizon: int,
                          axis_name: str = BATCH_AXIS):
    """Batch-sharded closed-loop rollout where every device runs the
    sublane-dense (D, 8, B_local/8) scan on its own shard via
    ``shard_map`` (the plain sharded path can't use the dense view — the
    (8, B/8) reshape crosses shard boundaries; shard_map keeps it local).

    Returns ``(final_states (B, D) batch-sharded, reward_sums (B,))``.
    Reset streams fold in the device index, so results are deterministic
    per (seed, mesh) but differ from a single-device run.
    """
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    from ..envs.core import control_rollout

    def local_run(local_states, k):
        idx = jax.lax.axis_index(axis_name)
        k = jax.random.fold_in(k, idx)
        final, traj = control_rollout(
            env, local_states, k, horizon, auto_reset=True,
            collect_trajectory=False, dense8=local_states.shape[0] % 8 == 0,
        )
        return final, traj.reward.sum(axis=0)

    run = shard_map(
        local_run,
        mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=(P(axis_name), P(axis_name)),
    )
    return jax.jit(run)(states, key)


def sharded_control_rollout(env, mesh: Mesh, batch: int, horizon: int, key: jax.Array,
                            axis_name: str = BATCH_AXIS, auto_reset: bool = True):
    """Compile a closed-loop controller rollout with the env batch sharded
    over the mesh.

    Returns a jitted function ``() -> (final_states, done_count)`` plus the
    sharded initial states.  The scan body is pure elementwise math per
    shard — XLA emits zero collectives for the rollout itself (verified in
    tests by inspecting the compiled HLO).
    """
    if batch % mesh.devices.size != 0:
        raise ValueError(f"batch {batch} not divisible by mesh size {mesh.devices.size}")

    from ..envs.core import control_rollout

    keys = jax.random.split(key, batch)
    init_states = jax.jit(env.vreset, out_shardings=batch_sharding(mesh, axis_name))(keys)

    @jax.jit
    def run(states, k):
        final, traj = control_rollout(env, states, k, horizon, auto_reset=auto_reset)
        return final, jnp.sum(traj.done)

    return run, init_states
