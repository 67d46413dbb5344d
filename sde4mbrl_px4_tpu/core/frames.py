"""ENU <-> NED frame conversion for the 13-dim vehicle state (L0).

The reference imports ``enu2ned`` from the external library
(``sde4mbrl_px4/mpc_controller/sde_control.py:13``) and applies it to full
13-states (``sde_control.py:400``): FCU states arrive in NED
(``sde_control.py:228``) while ROS-side setpoints are ENU
(``sde_control.py:186-192``). We re-derive the standard mavros convention:

- world frame: ENU ``(x_e, y_n, z_up)`` <-> NED ``(x_n, y_e, z_down)``,
  i.e. ``(x, y, z)_ned = (y, x, -z)_enu`` (an involution);
- body frame: FLU (forward-left-up, ROS) <-> FRD (forward-right-down, PX4),
  a π rotation about body-x;
- attitude quaternion q maps body->world, so
  ``q_ned_frd = q_NE ⊗ q_enu_flu ⊗ q_LF`` with the two fixed frame
  quaternions below;
- body angular rate: FLU->FRD flips sign of y and z components.

State layout (reference ``sde_control.py:246``):
``[x,y,z, vx,vy,vz, qw,qx,qy,qz, wx,wy,wz]``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sde4mbrl_px4_tpu.core.quaternion import qmul, qnormalize

__all__ = ["enu2ned", "ned2enu", "enu2ned_pos", "ned2enu_pos", "Q_NED_ENU", "Q_FLU_FRD"]

# World ENU->NED: swap x/y and flip z. As a rotation quaternion (w,x,y,z):
# R = [[0,1,0],[1,0,0],[0,0,-1]] = 180° rotation about the (1,1,0)/√2 axis.
# (numpy constants, converted at use sites: importing the library must not
# initialize a JAX backend — jax.distributed.initialize() comes first in
# multi-host programs, parallel/distributed.py.)
_SQ2 = 0.7071067811865476
Q_NED_ENU = np.array([0.0, _SQ2, _SQ2, 0.0])  # also its own inverse (w=0)
# Body FLU->FRD: 180° about body-x.
Q_FLU_FRD = np.array([0.0, 1.0, 0.0, 0.0])


def _swap_flip(v: jax.Array) -> jax.Array:
    """(x,y,z) -> (y,x,-z); involutive, used for pos and vel in both directions."""
    return jnp.stack([v[..., 1], v[..., 0], -v[..., 2]], axis=-1)


def enu2ned_pos(p: jax.Array) -> jax.Array:
    return _swap_flip(p)


def ned2enu_pos(p: jax.Array) -> jax.Array:
    return _swap_flip(p)


def _convert_state(x: jax.Array) -> jax.Array:
    """Shared ENU<->NED 13-state conversion (the transform is an involution)."""
    pos = _swap_flip(x[..., 0:3])
    vel = _swap_flip(x[..., 3:6])
    q = x[..., 6:10]
    # q' = Q_NED_ENU ⊗ q ⊗ Q_FLU_FRD ; both fixed quaternions are unit with
    # w=0, so the composite transform is also involutive.
    q_new = qnormalize(qmul(qmul(jnp.asarray(Q_NED_ENU, x.dtype), q), jnp.asarray(Q_FLU_FRD, x.dtype)))
    w = x[..., 10:13]
    w_new = jnp.stack([w[..., 0], -w[..., 1], -w[..., 2]], axis=-1)
    return jnp.concatenate([pos, vel, q_new, w_new], axis=-1)


def enu2ned(x: jax.Array, _np_mod=None) -> jax.Array:
    """Full 13-state ENU(world)/FLU(body) -> NED(world)/FRD(body).

    The ``_np_mod`` argument mirrors the reference call signature
    ``enu2ned(curr_state, np)`` (``sde_control.py:400``) and is ignored —
    everything here is jnp and works on numpy inputs via JAX's coercion.
    """
    return _convert_state(jnp.asarray(x))


def ned2enu(x: jax.Array, _np_mod=None) -> jax.Array:
    """Full 13-state NED/FRD -> ENU/FLU (inverse of :func:`enu2ned`)."""
    return _convert_state(jnp.asarray(x))
