"""Cross-platform TPU lowering checks: `jax.export(..., platforms=["tpu"])`
runs the pallas->Mosaic lowering pipeline on the CPU host, so kernels
added without TPU access in hand still get their Mosaic lowering
validated (unsupported primitives, scalar-prefetch structure, block
specs all fail HERE rather than at first on-device compile).  The
Mosaic->TPU backend compile itself still only runs on hardware — this
is a lowering gate, not an execution gate."""

import sys

import jax
import numpy as np
import pytest

# Cross-platform export lowers the WHOLE train step (rollout scan +
# kernel) through several extra interpreter layers; under the suite's
# x64 config that overflows CPython's default 1000-frame limit.
sys.setrecursionlimit(20000)

import reinmav_tpu
from reinmav_tpu.rl import ppo

try:
    from jax import export as jax_export
except ImportError:  # pragma: no cover
    jax_export = None

pytestmark = pytest.mark.skipif(jax_export is None,
                                reason="jax.export unavailable")


def _export_train_step(cfg, env_id="quadrotor3d-v0"):
    env = reinmav_tpu.make(env_id)
    state = ppo.init_train_state(env, cfg, jax.random.PRNGKey(0))
    fn = jax.jit(lambda s: ppo.train_step(
        env, cfg, s, fused_loss=True,
        fused_update=(cfg.fused_update == "on")))
    exp = jax_export.export(fn, platforms=["tpu"])(state)
    assert len(exp.mlir_module_serialized) > 0


def test_fused_update_step_lowers_for_tpu():
    _export_train_step(ppo.PpoConfig(
        num_envs=1024, rollout_len=32, hidden=(64, 64), shuffle_tile=128,
        fused_loss="on", fused_update="on", fused_rollout="off"))


def test_fused_update_kl_mode_lowers_for_tpu():
    _export_train_step(ppo.PpoConfig(
        num_envs=1024, rollout_len=32, hidden=(64, 64), shuffle_tile=128,
        kl_target=0.01, fused_loss="on", fused_update="off",
        fused_rollout="off"))


def test_fused_update_bf16_lowers_for_tpu():
    _export_train_step(ppo.PpoConfig(
        num_envs=1024, rollout_len=32, hidden=(64, 64), shuffle_tile=128,
        compute_dtype="bfloat16", fused_loss="on", fused_update="on",
        fused_rollout="off"))


def test_fused_rollout_plus_update_lowers_for_tpu():
    """The full fast path — fused policy+env rollout kernel feeding the
    one-launch update kernel — lowers for TPU in one program."""
    _export_train_step(ppo.PpoConfig(
        num_envs=2048, rollout_len=32, hidden=(64, 64), shuffle_tile=128,
        fused_loss="on", fused_update="on", fused_rollout="on"))


@pytest.mark.parametrize("env_id", [
    "quadrotor3d-v0", "quadrotor2d-v0", "quadrotor2d-slungload-v0",
    "quadrotor3d-slungload-v0", "MujocoQuadForce-v1"])
def test_fused_fast_path_lowers_for_tpu_all_reward_envs(env_id):
    """The production fast path (fused rollout + fused update) lowers
    for TPU on EVERY reward-bearing env id.  Regression: slung3d's
    d=16 hit a zero-row pad in the update kernel's grad-plane packing
    (Mosaic rejects (0, 128) vectors) that only surfaced at lowering —
    interpret-mode differentials can't see Mosaic, and the quad3d-only
    export tests missed it (caught on-chip 2026-08-20).  Production f32
    semantics (x64 off for the trace, the throughput-test precedent) —
    the hover kernel's literals promote to f64 under the suite's x64
    config, a cast Mosaic rightly refuses."""
    with jax.enable_x64(False):
        _export_train_step(ppo.PpoConfig(
            num_envs=2048, rollout_len=32, hidden=(64, 64), shuffle_tile=128,
            fused_loss="on", fused_update="on", fused_rollout="on"),
            env_id=env_id)


def test_throughput_kernels_lower_for_tpu_all_ids():
    """Every env id's fused throughput-rollout kernel lowers for TPU
    (production f32 semantics — x64 disabled for the trace, matching
    how these kernels actually run on hardware)."""
    import jax.numpy as jnp

    from reinmav_tpu.envs.core import throughput_rollout

    with jax.enable_x64(False):
        for eid in reinmav_tpu.registered_ids():
            env = reinmav_tpu.make(eid)
            states = jnp.zeros((4096, env.state_dim), jnp.float32)
            fn = jax.jit(lambda s, k, env=env: throughput_rollout(
                env, s, k, horizon=8, backend="pallas"))
            exp = jax_export.export(fn, platforms=["tpu"])(
                states, jax.random.PRNGKey(0))
            assert len(exp.mlir_module_serialized) > 0, eid


