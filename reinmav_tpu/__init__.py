"""reinmav_tpu — a TPU-native quadrotor environment + training framework.

A ground-up JAX/XLA re-design of the capabilities of
ethz-asl/reinmav-gym: batched, jitted, sharded quadrotor dynamics
(2D/3D, slung-load, 13-state controller-in-the-loop), classical
controllers as pure functions, PPO training over a device mesh, and a
gymnasium-compatible adapter for ecosystem interop.

Quick start::

    import reinmav_tpu
    env = reinmav_tpu.make("quadrotor3d-v0")
    final, traj = reinmav_tpu.control_rollout(
        env, env.vreset(jax.random.split(key, 4096)), key, horizon=400)
"""

from .envs.core import (EnvDef, StepOut, chunked_throughput_rollout,
                        control_rollout, controller_policy, rollout,
                        throughput_rollout)
from .envs.registry import make, register, registered_ids

__version__ = "0.1.0"

__all__ = [
    "EnvDef",
    "StepOut",
    "make",
    "register",
    "registered_ids",
    "rollout",
    "control_rollout",
    "controller_policy",
    "throughput_rollout",
    "chunked_throughput_rollout",
    "__version__",
]
