"""Unit tests for core quaternion/rotation math (L0)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde4mbrl_px4_tpu.core import quaternion as quat


def _rand_unit_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    return quat.qnormalize(q)


def test_qmul_identity(rng):
    q = _rand_unit_quats(rng, 16)
    ident = jnp.array([1.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(quat.qmul(q, ident), q, atol=1e-6)
    np.testing.assert_allclose(quat.qmul(ident, q), q, atol=1e-6)


def test_qmul_inverse(rng):
    q = _rand_unit_quats(rng, 16)
    prod = quat.qmul(q, quat.qconj(q))
    expect = jnp.tile(jnp.array([1.0, 0, 0, 0]), (16, 1))
    np.testing.assert_allclose(prod, expect, atol=1e-5)


def test_qrotate_matches_matrix(rng):
    k1, k2 = jax.random.split(rng)
    q = _rand_unit_quats(k1, 8)
    v = jax.random.normal(k2, (8, 3))
    via_quat = quat.qrotate(q, v)
    via_mat = jnp.einsum("bij,bj->bi", quat.q_to_rotmat(q), v)
    np.testing.assert_allclose(via_quat, via_mat, atol=1e-5)


def test_qrotate_inv_roundtrip(rng):
    k1, k2 = jax.random.split(rng)
    q = _rand_unit_quats(k1, 8)
    v = jax.random.normal(k2, (8, 3))
    np.testing.assert_allclose(quat.qrotate_inv(q, quat.qrotate(q, v)), v, atol=1e-5)


def test_rotmat_roundtrip(rng):
    q = _rand_unit_quats(rng, 64)
    q2 = quat.rotmat_to_q(quat.q_to_rotmat(q))
    # q and -q are the same rotation; compare rotation matrices.
    np.testing.assert_allclose(
        quat.q_to_rotmat(q2), quat.q_to_rotmat(q), atol=1e-4
    )


def test_rotmat_to_q_near_branch_boundaries():
    # Exercise all four Shepperd pivots: identity, and 180° about each axis.
    for axis in range(3):
        R = -np.eye(3)
        R[axis, axis] = 1.0
        q = quat.rotmat_to_q(jnp.asarray(R))
        np.testing.assert_allclose(quat.q_to_rotmat(q), R, atol=1e-5)
    q = quat.rotmat_to_q(jnp.eye(3))
    np.testing.assert_allclose(q, jnp.array([1.0, 0, 0, 0]), atol=1e-6)


def test_yaw_roundtrip():
    yaws = jnp.linspace(-3.0, 3.0, 13)
    np.testing.assert_allclose(quat.yaw_from_q(quat.q_from_yaw(yaws)), yaws, atol=1e-5)


def test_q_from_euler_matches_yaw():
    yaw = jnp.float32(0.7)
    np.testing.assert_allclose(
        quat.q_from_euler(jnp.float32(0), jnp.float32(0), yaw),
        quat.q_from_yaw(yaw),
        atol=1e-6,
    )


def test_acc_yaw_to_q_hover():
    # Pure vertical acceleration + zero yaw -> identity attitude.
    q = quat.acc_yaw_to_q(jnp.array([0.0, 0.0, 9.81]), jnp.float32(0.0))
    np.testing.assert_allclose(q, jnp.array([1.0, 0, 0, 0]), atol=1e-5)


def test_acc_yaw_to_q_yaw_only():
    q = quat.acc_yaw_to_q(jnp.array([0.0, 0.0, 9.81]), jnp.float32(1.0))
    np.testing.assert_allclose(q, quat.q_from_yaw(jnp.float32(1.0)), atol=1e-5)


def test_qerr_vec_zero_at_same():
    q = quat.q_from_yaw(jnp.float32(0.3))
    np.testing.assert_allclose(quat.qerr_vec(q, q), jnp.zeros(3), atol=1e-6)
    # Double cover: -q has zero error too (sign correction).
    np.testing.assert_allclose(quat.qerr_vec(-q, q), jnp.zeros(3), atol=1e-6)


def test_hat_vee_roundtrip(rng):
    v = jax.random.normal(rng, (5, 3))
    np.testing.assert_allclose(quat.vee(quat.hat(v)), v, atol=1e-6)
    # hat(v) @ w == v x w
    w = jnp.ones((5, 3))
    np.testing.assert_allclose(
        jnp.einsum("bij,bj->bi", quat.hat(v), w), jnp.cross(v, w), atol=1e-5
    )


def test_integrate_q_yaw_rate():
    # Integrating constant yaw rate from identity: small steps track q_from_yaw.
    q = jnp.array([1.0, 0, 0, 0])
    wz = 0.5
    dt = 1e-3
    for _ in range(100):
        q = quat.integrate_q(q, jnp.array([0.0, 0.0, wz]), jnp.float32(dt))
    np.testing.assert_allclose(q, quat.q_from_yaw(jnp.float32(wz * 0.1)), atol=1e-4)
