"""Minimal vendored reimplementation of the pyquaternion semantics the
reference environments rely on.

pyquaternion is not installable in this environment, but the reference
native 3D envs (``gym_reinmav/envs/native/quadrotor3d.py``,
``quadrotor3d_slungload.py``) depend on subtle pyquaternion behaviours that
are load-bearing for trajectory parity (SURVEY.md Q4):

* ``Quaternion(arr)`` stores elements **unnormalised**.
* ``Quaternion.rotation_matrix`` normalises the quaternion **in place**
  (side effect!) and builds R from the two 4x4 product matrices.
* ``Quaternion.derivative(w)`` = ``0.5 * q ⊗ (0, w)`` — evaluated on the
  (possibly already in-place-normalised) stored elements.
* ``Quaternion(matrix=R)`` transposes R then applies the branchy
  euclideanspace.com matrix→quaternion algorithm; raises if R is not
  orthogonal within tolerance.
* ``conjugate`` / ``__mul__`` do **not** normalise.

This module replicates exactly those behaviours (and nothing more) so the
oracle in :mod:`reinmav_tpu.oracle.native_envs` is bit-faithful to the
reference's use of pyquaternion, including the in-place-normalisation
ordering inside ``step()`` / ``control()``.
"""

from __future__ import annotations

import numpy as np


class Quat:
    """pyquaternion-compatible quaternion, (w, x, y, z) element layout."""

    __slots__ = ("q",)

    def __init__(self, elements=None, *, matrix=None):
        if matrix is not None:
            self.q = _from_matrix(np.asarray(matrix, dtype=np.float64))
        elif isinstance(elements, Quat):
            self.q = np.array(elements.q, dtype=np.float64)
        else:
            self.q = np.asarray(elements, dtype=np.float64).reshape(4).copy()

    # -- pyquaternion behavioural replicas ---------------------------------
    def _is_unit(self, tolerance: float = 1e-14) -> bool:
        return abs(1.0 - float(np.dot(self.q, self.q))) < tolerance

    def _normalise(self) -> None:
        """In-place normalisation; no-op for zero norm (pyquaternion)."""
        if not self._is_unit():
            n = float(np.sqrt(np.dot(self.q, self.q)))
            if n > 0.0:
                self.q = self.q / n

    def _q_matrix(self) -> np.ndarray:
        w, x, y, z = self.q
        return np.array(
            [[w, -x, -y, -z], [x, w, -z, y], [y, z, w, -x], [z, -y, x, w]]
        )

    def _q_bar_matrix(self) -> np.ndarray:
        w, x, y, z = self.q
        return np.array(
            [[w, -x, -y, -z], [x, w, z, -y], [y, -z, w, x], [z, y, -x, w]]
        )

    @property
    def rotation_matrix(self) -> np.ndarray:
        """Normalises *in place*, then builds R from the product matrices.

        The in-place side effect is essential: the reference calls
        ``rotation_matrix`` before ``derivative`` within one ``step()``
        (``quadrotor3d.py:94-101``), so the derivative sees the normalised
        elements while the stored state array stays unnormalised.
        """
        self._normalise()
        product = np.dot(self._q_matrix(), self._q_bar_matrix().conj().transpose())
        return product[1:][:, 1:]

    def derivative(self, rate) -> "Quat":
        rate = np.asarray(rate, dtype=np.float64).reshape(3)
        return 0.5 * self * Quat(np.concatenate(([0.0], rate)))

    @property
    def conjugate(self) -> "Quat":
        return Quat(self.q * np.array([1.0, -1.0, -1.0, -1.0]))

    @property
    def elements(self) -> np.ndarray:
        return self.q

    def __mul__(self, other):
        if isinstance(other, Quat):
            return Quat(np.dot(self._q_matrix(), other.q))
        return Quat(self.q * other)

    def __rmul__(self, scalar):
        return Quat(self.q * scalar)


def _from_matrix(matrix: np.ndarray, rtol: float = 1e-5, atol: float = 1e-8) -> np.ndarray:
    """pyquaternion's matrix→quaternion conversion.

    Validates orthogonality (raises ValueError like pyquaternion), then
    transposes (row-vector convention) and applies the euclideanspace.com
    branchy algorithm.  Branch selection determines the quaternion sign —
    load-bearing for the geometric controller (``quadrotor3d.py:139``).
    """
    if matrix.shape != (3, 3):
        raise ValueError(f"expected 3x3 rotation matrix, got {matrix.shape}")
    if not np.allclose(np.dot(matrix, matrix.conj().transpose()), np.eye(3), rtol=rtol, atol=atol):
        raise ValueError("Matrix must be orthogonal")
    if not np.isclose(np.linalg.det(matrix), 1.0, rtol=rtol, atol=atol):
        raise ValueError("Matrix must be special orthogonal (det=1)")

    m = matrix.conj().transpose()
    if m[2, 2] < 0:
        if m[0, 0] > m[1, 1]:
            t = 1 + m[0, 0] - m[1, 1] - m[2, 2]
            q = [m[1, 2] - m[2, 1], t, m[0, 1] + m[1, 0], m[2, 0] + m[0, 2]]
        else:
            t = 1 - m[0, 0] + m[1, 1] - m[2, 2]
            q = [m[2, 0] - m[0, 2], m[0, 1] + m[1, 0], t, m[1, 2] + m[2, 1]]
    else:
        if m[0, 0] < -m[1, 1]:
            t = 1 - m[0, 0] - m[1, 1] + m[2, 2]
            q = [m[0, 1] - m[1, 0], m[2, 0] + m[0, 2], m[1, 2] + m[2, 1], t]
        else:
            t = 1 + m[0, 0] + m[1, 1] + m[2, 2]
            q = [t, m[1, 2] - m[2, 1], m[2, 0] - m[0, 2], m[0, 1] - m[1, 0]]
    q = np.array(q, dtype=np.float64)
    q *= 0.5 / np.sqrt(t)
    return q
