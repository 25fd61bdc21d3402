"""Unit tests for the quaternion/rotation kernels, cross-checked against
the vendored pyquaternion oracle semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reinmav_tpu.ops import quadmath as qm
from reinmav_tpu.oracle.pyquat import Quat


def random_quats(rng, n, unit=False):
    q = rng.uniform(-1.0, 1.0, size=(n, 4))
    if unit:
        q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    return q


def test_quat_mul_matches_oracle(rng):
    q1 = random_quats(rng, 50)
    q2 = random_quats(rng, 50)
    got = np.asarray(jax.vmap(qm.quat_mul)(jnp.asarray(q1), jnp.asarray(q2)))
    for i in range(50):
        ref = (Quat(q1[i]) * Quat(q2[i])).elements
        np.testing.assert_allclose(got[i], ref, rtol=1e-13, atol=1e-14)


def test_rotmat_matches_pyquaternion_normalised(rng):
    """quat_to_rotmat(normalised q) == pyquaternion rotation_matrix
    (which normalises in place, then uses product matrices)."""
    qs = random_quats(rng, 50)
    for q in qs:
        ref = Quat(q.copy()).rotation_matrix
        got = np.asarray(qm.quat_to_rotmat(qm.quat_normalize(jnp.asarray(q))))
        np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-13)


def test_rotmat_nonunit_scale_invariance(rng):
    """The reference quat2mat formula equals R(q/|q|) for any scale."""
    qs = random_quats(rng, 20)
    for q in qs:
        r1 = np.asarray(qm.quat_to_rotmat_nonunit(jnp.asarray(q)))
        r2 = np.asarray(qm.quat_to_rotmat_nonunit(jnp.asarray(q * 7.5)))
        np.testing.assert_allclose(r1, r2, rtol=1e-10, atol=1e-12)
        # orthonormality
        np.testing.assert_allclose(r1 @ r1.T, np.eye(3), atol=1e-12)


def test_quat_from_rotmat_roundtrip(rng):
    """matrix→quat hits all four branches and matches pyquaternion."""
    qs = random_quats(rng, 200, unit=True)
    for q in qs:
        r = np.asarray(qm.quat_to_rotmat(jnp.asarray(q)))
        ref = Quat(matrix=r).elements
        got = np.asarray(qm.quat_from_rotmat(jnp.asarray(r)))
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-10)
        # same rotation up to sign
        np.testing.assert_allclose(np.abs(np.dot(got, q)), 1.0, atol=1e-9)


def test_quat_derivative_matches_oracle(rng):
    qs = random_quats(rng, 20)
    ws = rng.uniform(-3.0, 3.0, size=(20, 3))
    for q, w in zip(qs, ws):
        ref = Quat(q.copy()).derivative(w).elements
        got = np.asarray(qm.quat_derivative(jnp.asarray(q), jnp.asarray(w)))
        np.testing.assert_allclose(got, ref, rtol=1e-13, atol=1e-15)


def test_acc2quat_orthogonality(rng):
    """acc2quat produces unit quaternions whose R has desired_acc direction
    as body z (the geometric-controller invariant)."""
    accs = rng.uniform(-1.0, 1.0, size=(50, 3)) + np.array([0.0, 0.0, 9.8])
    got = np.asarray(jax.vmap(qm.acc2quat)(jnp.asarray(accs)))
    norms = np.linalg.norm(got, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-12)
    for q, acc in zip(got, accs):
        r = np.asarray(qm.quat_to_rotmat(jnp.asarray(q)))
        zb = r[:, 2]
        np.testing.assert_allclose(zb, acc / np.linalg.norm(acc), atol=1e-10)


def test_rpy_conversions(rng):
    from reinmav_tpu.oracle import rpy_pid_ref

    qs = random_quats(rng, 50, unit=True)
    for q in qs:
        ref = rpy_pid_ref.quat_to_rpy(q)
        got = np.asarray(qm.quat_to_rpy(jnp.asarray(q)))
        np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)
