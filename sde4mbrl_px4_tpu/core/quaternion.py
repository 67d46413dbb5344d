"""Quaternion / rotation math (L0).

Pure-JAX, broadcast-friendly over arbitrary leading batch dimensions, and
safe under ``jit``/``vmap``/``grad``. Quaternions are ``(..., 4)`` arrays in
scalar-first ``[w, x, y, z]`` order — the same layout the reference uses for
the 13-state vector (``qw,qx,qy,qz`` at indices 6..9; reference
``sde4mbrl_px4/mpc_controller/sde_control.py:246``).

Semantics mirror the reference's C++ header-inline utilities
(``include/geometric_controller.h:80-172``): Hamilton product, passive
rotation matrices, the branch-based ``rot2Quaternion``, and the
differential-flatness ``acc2quaternion``. They are re-derived here (not
translated) in branch-free, vectorized forms suitable for XLA.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "qmul",
    "qconj",
    "qinv",
    "qnormalize",
    "qrotate",
    "qrotate_inv",
    "q_to_rotmat",
    "rotmat_to_q",
    "q_from_yaw",
    "q_from_euler",
    "yaw_from_q",
    "acc_yaw_to_q",
    "qerr_vec",
    "hat",
    "vee",
    "integrate_q",
]


def qmul(q: jax.Array, p: jax.Array) -> jax.Array:
    """Hamilton product ``q ⊗ p`` (both ``[w,x,y,z]``, broadcastable).

    Matches ``quatMultiplication`` (reference
    ``include/geometric_controller.h:104-109``, which computes q⊗p with its
    arguments in (q, p) order).
    """
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    pw, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    return jnp.stack(
        [
            qw * pw - qx * px - qy * py - qz * pz,
            qw * px + qx * pw + qy * pz - qz * py,
            qw * py - qx * pz + qy * pw + qz * px,
            qw * pz + qx * py - qy * px + qz * pw,
        ],
        axis=-1,
    )


def qconj(q: jax.Array) -> jax.Array:
    """Conjugate ``[w, -x, -y, -z]``."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qinv(q: jax.Array) -> jax.Array:
    """Inverse; equals conjugate for unit quaternions, general otherwise."""
    return qconj(q) / jnp.sum(q * q, axis=-1, keepdims=True)


def qnormalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize to unit norm (guarded against zero norm)."""
    n = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)
    return q / n


def qrotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector ``v`` (shape ``(...,3)``) by unit quaternion ``q``.

    Computes R(q) @ v using the expanded form 2*(t x v)+v with
    t = q_vec x v + w*v — cheaper than building the matrix (no 3x3 temp).
    """
    w = q[..., 0:1]
    u = q[..., 1:4]
    t = jnp.cross(u, v) + w * v
    return v + 2.0 * jnp.cross(u, t)


def qrotate_inv(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate ``v`` by the inverse of unit quaternion ``q`` (R(q)^T v)."""
    return qrotate(qconj(q), v)


def q_to_rotmat(q: jax.Array) -> jax.Array:
    """Unit quaternion -> rotation matrix, shape ``(..., 3, 3)``.

    Same matrix as ``quat2RotMatrix`` (reference
    ``include/geometric_controller.h:111-122``).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            w * w + x * x - y * y - z * z,
            2 * (x * y - w * z),
            2 * (w * y + x * z),
            2 * (w * z + x * y),
            w * w - x * x + y * y - z * z,
            2 * (y * z - w * x),
            2 * (x * z - w * y),
            2 * (w * x + y * z),
            w * w - x * x - y * y + z * z,
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def rotmat_to_q(R: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion, branch-free.

    The reference uses Shepperd's 4-branch method
    (``include/geometric_controller.h:124-153``); here the four candidate
    solutions are computed in parallel and the numerically largest pivot is
    selected with ``where`` masks so the op is vectorizable and
    differentiable almost everywhere.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four pivot magnitudes (4*q_i^2 - 1 + trace-combination >= 0).
    def _s(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12)) * 2.0

    s_w = _s(tr + 1.0)
    s_x = _s(1.0 + m00 - m11 - m22)
    s_y = _s(1.0 + m11 - m00 - m22)
    s_z = _s(1.0 + m22 - m00 - m11)

    q_w = jnp.stack([0.25 * s_w, (m21 - m12) / s_w, (m02 - m20) / s_w, (m10 - m01) / s_w], -1)
    q_x = jnp.stack([(m21 - m12) / s_x, 0.25 * s_x, (m01 + m10) / s_x, (m02 + m20) / s_x], -1)
    q_y = jnp.stack([(m02 - m20) / s_y, (m01 + m10) / s_y, 0.25 * s_y, (m12 + m21) / s_y], -1)
    q_z = jnp.stack([(m10 - m01) / s_z, (m02 + m20) / s_z, (m12 + m21) / s_z, 0.25 * s_z], -1)

    cond_w = tr > 0.0
    cond_x = jnp.logical_and(m00 > m11, m00 > m22)
    cond_y = m11 > m22

    q = jnp.where(
        cond_w[..., None],
        q_w,
        jnp.where(cond_x[..., None], q_x, jnp.where(cond_y[..., None], q_y, q_z)),
    )
    return qnormalize(q)


def q_from_yaw(yaw: jax.Array) -> jax.Array:
    """Pure-yaw quaternion ``[cos(y/2), 0, 0, sin(y/2)]``."""
    h = 0.5 * yaw
    z = jnp.zeros_like(yaw)
    return jnp.stack([jnp.cos(h), z, z, jnp.sin(h)], axis=-1)


def q_from_euler(roll: jax.Array, pitch: jax.Array, yaw: jax.Array) -> jax.Array:
    """ZYX (yaw-pitch-roll) Euler angles -> quaternion."""
    cr, sr = jnp.cos(0.5 * roll), jnp.sin(0.5 * roll)
    cp, sp = jnp.cos(0.5 * pitch), jnp.sin(0.5 * pitch)
    cy, sy = jnp.cos(0.5 * yaw), jnp.sin(0.5 * yaw)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def yaw_from_q(q: jax.Array) -> jax.Array:
    """Extract yaw (ZYX convention) from a quaternion."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))


def acc_yaw_to_q(acc: jax.Array, yaw: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Differential-flatness attitude: desired acceleration + yaw -> quaternion.

    Re-derivation of ``acc2quaternion`` (reference
    ``include/geometric_controller.h:155-172``): body z points along ``acc``,
    body x projects onto the yaw heading.
    """
    proj_x = jnp.stack([jnp.cos(yaw), jnp.sin(yaw), jnp.zeros_like(yaw)], axis=-1)

    def _unit(v):
        return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps)

    zb = _unit(acc)
    yb = _unit(jnp.cross(zb, proj_x))
    xb = _unit(jnp.cross(yb, zb))
    R = jnp.stack([xb, yb, zb], axis=-1)  # columns are body axes
    return rotmat_to_q(R)


def qerr_vec(q: jax.Array, q_ref: jax.Array) -> jax.Array:
    """Attitude-error 3-vector: vector part of ``q_ref^{-1} ⊗ q``.

    Sign-corrected by ``sign(w_err)`` so that q and -q represent the same
    error (the Brescianini convention the reference baseline uses at
    ``geometric_controller.cpp:384-387``).
    """
    qe = qmul(qconj(q_ref), q)
    s = jnp.sign(qe[..., 0:1])
    s = jnp.where(s == 0, 1.0, s)
    return s * qe[..., 1:4]


def hat(v: jax.Array) -> jax.Array:
    """Skew-symmetric (cross-product) matrix of a 3-vector.

    ``matrix_hat`` in the reference (``include/geometric_controller.h:80-85``).
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def vee(m: jax.Array) -> jax.Array:
    """Inverse of :func:`hat` (``matrix_hat_inv``,
    ``include/geometric_controller.h:87-92``)."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def integrate_q(q: jax.Array, omega_body: jax.Array, dt: jax.Array) -> jax.Array:
    """One-step quaternion kinematics update, renormalized.

    q_{k+1} = normalize(q_k + dt * 0.5 * q_k ⊗ [0, ω]) — the Euler update
    used by the SDE rollout (quaternion treated as Euclidean drift state,
    projected back to S^3 each step).
    """
    omega_q = jnp.concatenate([jnp.zeros_like(omega_body[..., :1]), omega_body], axis=-1)
    dq = 0.5 * qmul(q, omega_q)
    dt = jnp.asarray(dt)
    dtb = dt[..., None] if dt.ndim else dt
    return qnormalize(q + dtb * dq)
