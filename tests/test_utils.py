"""Utils tests: checkpoint manager rotation/resume, metrics logger sinks,
NaN guard fault detection, throughput_rollout backend dispatch."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import reinmav_tpu
from reinmav_tpu.utils import CheckpointManager, MetricsLogger
from reinmav_tpu.utils.profiling import NanGuard


def test_checkpoint_manager_rotation_and_resume(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpts"), keep=2, save_interval=2)
    tree = {"w": jnp.arange(4.0), "step": jnp.asarray(0)}

    assert not mgr.save(1, tree)  # not due
    for step in (2, 4, 6):
        assert mgr.save(step, {"w": tree["w"] + step, "step": jnp.asarray(step)})
    assert mgr.latest_step() == 6
    # keep=2: step_2 evicted
    names = sorted(os.listdir(tmp_path / "ckpts"))
    assert names == ["step_4", "step_6"]

    restored, step = mgr.restore_latest(tree)
    assert step == 6
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.arange(4.0) + 6)

    empty = CheckpointManager(str(tmp_path / "none"))
    same, step = empty.restore_latest(tree)
    assert step is None and same is tree


def test_metrics_logger_sinks(tmp_path, capsys):
    logger = MetricsLogger(log_dir=str(tmp_path), stdout=True, jsonl=True, csv=True)
    logger.log(10, {"a": jnp.asarray(1.5), "b": 2})
    logger.log(20, {"a": 2.5, "b": 3})
    logger.close()

    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["step"] == 10 and lines[0]["a"] == 1.5
    assert lines[1]["b"] == 3.0
    csv_lines = open(tmp_path / "metrics.csv").read().strip().splitlines()
    assert csv_lines[0].startswith("step,wall_s,a,b")
    assert len(csv_lines) == 3
    assert json.loads(capsys.readouterr().out.splitlines()[0])["step"] == 10


def test_nan_guard():
    NanGuard.check({"x": jnp.ones(3)}, "ok")
    with pytest.raises(FloatingPointError, match="bad"):
        NanGuard.check({"x": jnp.asarray([1.0, jnp.nan])}, "bad")


def test_throughput_rollout_scan_backend():
    from reinmav_tpu.envs.core import control_rollout, throughput_rollout

    env = reinmav_tpu.make("quadrotor3d-v0")
    key = jax.random.PRNGKey(0)
    states = env.vreset(jax.random.split(key, 32))
    final, rew = throughput_rollout(env, states, key, 50, backend="scan")
    # Matches the trajectory-collecting rollout's reductions.
    final2, traj = control_rollout(env, states, key, 50)
    np.testing.assert_allclose(np.asarray(final), np.asarray(final2), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(rew), np.asarray(traj.reward.sum(axis=0)), rtol=1e-10
    )
    # auto on CPU resolves to scan
    final3, _ = throughput_rollout(env, states, key, 50, backend="auto")
    np.testing.assert_allclose(np.asarray(final3), np.asarray(final2), rtol=1e-12)


def test_profiler_trace_context(tmp_path):
    from reinmav_tpu.utils.profiling import time_fn, trace

    with trace(str(tmp_path)):
        jnp.ones(8).sum().block_until_ready()
    # a trace directory with events was written
    assert any(tmp_path.rglob("*"))

    secs, result = time_fn(jax.jit(lambda x: x * 2), jnp.ones(16), warmup=1, iters=3)
    assert secs >= 0 and float(result.sum()) == 32.0


def test_throughput_rollout_controllerless_envs():
    """Regression: envs without a classical controller (reinmav, tpuquad)
    must work through throughput_rollout (zero-action stepping)."""
    from reinmav_tpu.envs.core import throughput_rollout

    for env_id in ["reinmav-v0", "MujocoQuadForce-v1"]:
        env = reinmav_tpu.make(env_id)
        key = jax.random.PRNGKey(0)
        states = env.vreset(jax.random.split(key, 16))
        final, rew = throughput_rollout(env, states, key, 20, backend="scan")
        assert final.shape == (16, env.state_dim)
        assert np.isfinite(np.asarray(rew)).all()


def test_tpuquad_init_z_override():
    """Regression: Params.init_z must control the reset altitude."""
    from reinmav_tpu.envs import tpuquad

    env = reinmav_tpu.make("MujocoQuadForce-v1", params=tpuquad.Params(init_z=0.5))
    s = env.reset(jax.random.PRNGKey(0))
    assert float(s[2]) == 0.5


def test_save_html_animation(tmp_path):
    """Interactive HTML viewer (the vpython-live-canvas replacement):
    self-contained document, valid frame JSON, all controls present."""
    import json
    import re

    import jax

    import reinmav_tpu
    from reinmav_tpu.render import save_html

    for eid in ("quadrotor3d-v0", "quadrotor2d-slungload-v0",
                "MujocoQuadForce-v1"):
        env = reinmav_tpu.make(eid)
        s = env.reset(jax.random.PRNGKey(0))
        traj = [np.asarray(s)]
        for _ in range(20):
            a = (env.control(s) if env.control_fn
                 else np.full(env.action_dim, 0.5, np.float32))
            s = env.step(s, a).state
            traj.append(np.asarray(s))
        path = save_html(eid, np.stack(traj), str(tmp_path / eid))
        html = open(path).read()
        assert html.startswith("<!DOCTYPE html>") and "</html>" in html
        script = html.split("<script>")[1].split("</script>")[0]
        for a_, b_ in (("{", "}"), ("(", ")"), ("[", "]")):
            assert script.count(a_) == script.count(b_)
        frames = json.loads(
            re.search(r"const FRAMES = (\[.*?\]);", script).group(1))
        assert len(frames) == 21
        for el in ("c", "play", "scrub", "t", "speed"):
            assert f'id="{el}"' in html, el
        # Self-contained: no external references after the title.
        assert "http" not in html.split("</title>")[1]
