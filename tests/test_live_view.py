"""Live while-stepping viewer (render/live_view.py — r4 verdict missing
#2: the reference renders DURING the rollout via a vpython browser
canvas; ours serves the same idea from stdlib HTTP)."""

import json
import urllib.request

import jax
import numpy as np
import pytest

import reinmav_tpu
from reinmav_tpu.render import LiveViewer


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read()


def test_live_viewer_streams_frames():
    env = reinmav_tpu.make("quadrotor3d-v0")
    v = LiveViewer(env.name, port=0)
    try:
        page = _get(v.url).decode()
        assert "LIVE" in page and "frames.json" in page

        s = env.reset(jax.random.PRNGKey(0))
        for _ in range(5):
            out = env.step(s, env.control(s))
            v.push(np.asarray(out.obs))
            s = out.state
        j = json.loads(_get(v.url + "frames.json"))
        assert j["seq"] == 5 and len(j["frames"]) == 5 and not j["done"]
        f = j["frames"][-1]
        assert len(f["p"]) == 3 and len(f["R"]) == 9

        v.finish()
        j = json.loads(_get(v.url + "frames.json"))
        assert j["done"]
    finally:
        v.close()


def test_live_viewer_2d_and_slung_frames():
    v = LiveViewer("quadrotor2d-slungload-v0", port=0)
    try:
        v.push(np.array([0.1, 1.0, 0.05, 0, 0, 0.1, 0.2, 0, 0]))
        j = json.loads(_get(v.url + "frames.json"))
        f = j["frames"][0]
        assert f["p"] == [0.1, 1.0] and f["th"] == 0.05
        assert f["l"] == [0.1, 0.2]
    finally:
        v.close()


def test_live_viewer_trail_is_bounded():
    from reinmav_tpu.render import live_view

    v = LiveViewer("quadrotor3d-v0", port=0)
    try:
        s = np.zeros(10)
        s[3] = 1.0
        for i in range(live_view.MAX_FRAMES + 50):
            v.push(s)
        j = json.loads(_get(v.url + "frames.json"))
        assert j["seq"] == live_view.MAX_FRAMES + 50
        assert len(j["frames"]) == live_view.MAX_FRAMES
    finally:
        v.close()


def test_cli_play_live_smoke(capsys):
    """--play --live end-to-end through the CLI: the viewer URL is
    printed and the rollout completes with the server up."""
    from reinmav_tpu.rl import run as rl_run

    rl_run.main(["--play", "--play_steps=10", "--env=quadrotor2d-v0",
                 "--num_env=8", "--rollout_len=8", "--num_hidden=16",
                 "--live"])
    out = capsys.readouterr().out
    assert "# live view: http://" in out
    assert '"play_steps": 10' in out
