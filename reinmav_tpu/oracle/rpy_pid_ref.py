"""NumPy oracle of the reference cascaded RPY PID controller.

Ground truth for :mod:`reinmav_tpu.controllers.rpy_pid`, transcribed from
``gym_reinmav/controller/rpy_pid_controller.py:88-218`` (gains ``:12-68``,
mixer ``:70-85``).  Mutable error buffers exactly as the reference keeps
them (``:113-116``).
"""

from __future__ import annotations

import numpy as np

KP_ZRPY = np.array([2.0, 0.1, 0.1, 0.3])
KD_ZRPY = np.array([0.5, 0.1, 0.1, 0.1])
KI_ZRPY = np.array([0.01, 0.01, 0.01, 0.01])
KP_XY = np.array([0.6, 0.6])
KD_XY = np.array([0.2, 0.2])
MOTOR_C = 0.1
MOTOR_L = 0.1


def mixer() -> np.ndarray:
    a, b, c = 0.25, 1.0 / (4.0 * MOTOR_L), 1.0 / (4.0 * MOTOR_C)
    return np.array([[a, b, -b, -c], [a, -b, -b, c], [a, -b, b, -c], [a, b, b, c]])


def quat_to_rotmat(q: np.ndarray) -> np.ndarray:
    """Reference ``_quat_to_rotmat`` (rpy_pid_controller.py:197-207):
    unit-quaternion formula applied to the raw elements."""
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def quat_to_rpy(q: np.ndarray) -> np.ndarray:
    """Reference ``_quat_to_rpy`` (rpy_pid_controller.py:209-217)."""
    w, x, y, z = q
    roll = np.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = np.arcsin(2 * (w * y - z * x))
    yaw = np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return np.array([roll, pitch, yaw])


class RpyControllerOracle:
    def __init__(self, dt: float, mass: float, gravity: float = -9.81):
        self.dt = dt
        self.mass = mass
        self.gravity = gravity
        self.position_error_buff = np.zeros(2)
        self.zrpy_error_buff = np.zeros(4)
        self.zrpy_error_int = np.zeros(4)

    def control(self, position, quat, position_d=(0.0, 0.0, 0.0), yaw_d=0.0) -> np.ndarray:
        position = np.asarray(position, dtype=np.float64)
        quat = np.asarray(quat, dtype=np.float64)
        position_d = np.asarray(position_d, dtype=np.float64)

        s = position[0:2]
        rpy = quat_to_rpy(quat)
        x = np.array([position[2], rpy[0], rpy[1], rpy[2]])

        es = position_d[0:2] - s
        es_dot = (es - self.position_error_buff) / self.dt
        self.position_error_buff = es

        us = KP_XY * es + KD_XY * es_dot
        us = np.append(us, 0.0)

        rotmat_bw = np.linalg.inv(quat_to_rotmat(quat))
        x_d = np.array(
            [position_d[2], -np.matmul(rotmat_bw, us)[1], np.matmul(rotmat_bw, us)[0], yaw_d]
        )

        ex = x_d - x
        ex_dot = (ex - self.zrpy_error_buff) / self.dt
        self.zrpy_error_int = self.zrpy_error_int + ex * self.dt
        self.zrpy_error_buff = ex

        u = KP_ZRPY * ex + KD_ZRPY * ex_dot + KI_ZRPY * self.zrpy_error_int
        u[0] += -self.mass * self.gravity / (np.cos(rpy[1]) * np.cos(rpy[0]))

        return np.matmul(mixer(), u)
