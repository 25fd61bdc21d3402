"""Native (C++) host-side components.

The reference has no in-repo native code (SURVEY.md §2: 100% Python; its
native muscle came from external MuJoCo/TF/MPI).  The TPU compute path
here is JAX/XLA; this package holds the host-side native pieces:

* ``fast_oracle`` — a batched C++ float64 implementation of the flagship
  quadrotor3d closed-loop dynamics, compiled on demand and bound via
  ctypes.  Used as a third independent implementation for differential
  testing (C++ vs NumPy oracle vs JAX kernels) and for generating large
  golden-trajectory sets orders of magnitude faster than the per-step
  Python oracle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fast_oracle.cpp")
_LIB = os.path.join(_DIR, "libfast_oracle.so")

_lib = None


def _compile() -> None:
    cmd = ["c++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC, "-lm"]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Compile (if needed) and load the shared library.  Raises
    RuntimeError when no C++ toolchain is available."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        try:
            _compile()
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            raise RuntimeError(f"cannot build fast_oracle: {e}") from e
    lib = ctypes.CDLL(_LIB)
    dp = ctypes.POINTER(ctypes.c_double)
    up = ctypes.POINTER(ctypes.c_ubyte)
    lib.quad3d_rollout.argtypes = [dp, ctypes.c_long, ctypes.c_long, dp, dp, up]
    lib.quad3d_step.argtypes = [dp, dp, ctypes.c_long, dp, dp, up]
    lib.quad3d_control.argtypes = [dp, ctypes.c_long, dp]
    _lib = lib
    return lib


def available() -> bool:
    try:
        load()
        return True
    except RuntimeError:
        return False


def _as_dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def quad3d_rollout(init_states: np.ndarray, horizon: int):
    """Closed-loop controller rollout (no auto-reset).

    Returns (traj (T, B, 10), rewards (T, B), dones (T, B) bool)."""
    lib = load()
    init = np.ascontiguousarray(init_states, dtype=np.float64)
    batch = init.shape[0]
    traj = np.empty((horizon, batch, 10), np.float64)
    rewards = np.empty((horizon, batch), np.float64)
    dones = np.empty((horizon, batch), np.uint8)
    lib.quad3d_rollout(
        _as_dp(init), batch, horizon, _as_dp(traj), _as_dp(rewards),
        dones.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return traj, rewards, dones.astype(bool)


def quad3d_step(states: np.ndarray, actions: np.ndarray):
    lib = load()
    states = np.ascontiguousarray(states, dtype=np.float64)
    actions = np.ascontiguousarray(actions, dtype=np.float64)
    batch = states.shape[0]
    next_states = np.empty((batch, 10), np.float64)
    rewards = np.empty((batch,), np.float64)
    dones = np.empty((batch,), np.uint8)
    lib.quad3d_step(
        _as_dp(states), _as_dp(actions), batch, _as_dp(next_states),
        _as_dp(rewards), dones.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return next_states, rewards, dones.astype(bool)


def quad3d_control(states: np.ndarray):
    lib = load()
    states = np.ascontiguousarray(states, dtype=np.float64)
    batch = states.shape[0]
    actions = np.empty((batch, 4), np.float64)
    lib.quad3d_control(_as_dp(states), batch, _as_dp(actions))
    return actions
