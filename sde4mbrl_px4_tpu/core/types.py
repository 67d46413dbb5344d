"""Canonical state/control layout and small typed containers (L0).

State is 13-dimensional, exactly the reference layout
(``sde4mbrl_px4/mpc_controller/sde_control.py:246,745-747``):

    [x, y, z, vx, vy, vz, qw, qx, qy, qz, wx, wy, wz]

Controls are per-motor normalized thrusts in ``[1e-4, 1.0]`` — 4 motors for
the iris (``launch/iris_sitl_traj_mpc.yaml:10-11``), 6 for the hexa
(``launch/hexa_traj_mpc.yaml:11-12``).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

STATE_DIM = 13
# Index slices into the 13-state.
POS = slice(0, 3)
VEL = slice(3, 6)
QUAT = slice(6, 10)
OMEGA = slice(10, 13)

# Control-automata states (reference ``sde_control.py:46``).
CONTROL_STATES = {"none": 0, "reset": 1, "test": 2, "pos": 3, "idle": 4, "traj": 5}
CONTROL_STATE_NAMES = {v: k for k, v in CONTROL_STATES.items()}

# FollowTraj service mode constants (reference ``srv/FollowTraj.srv:1-6``).
CTRL_INACTIVE = 0
CTRL_TRAJ_ACTIVE = 1
CTRL_TRAJ_IDLE = 2
CTRL_POSE_ACTIVE = 3
CTRL_TEST = 4


def hover_state(dtype=jnp.float32) -> jax.Array:
    """Canonical 13-dim hover/identity state (reference ``sde_control.py:745-747``)."""
    x = np.zeros((STATE_DIM,), dtype=np.float32)
    x[6] = 1.0
    return jnp.asarray(x, dtype=dtype)


class MPCSolution(NamedTuple):
    """One receding-horizon solve result.

    Mirrors the reference solver return
    ``(uopt[H,n_u], opt_state', rng', x_evol[H+1,13])`` (``sde_control.py:412``).
    """

    u_opt: jax.Array        # (H, n_u) optimal control sequence
    opt_state: object       # warm-start / stats pytree (solver.apg.APGState)
    rng: jax.Array          # advanced PRNG key
    x_evol: jax.Array       # (H+1, 13) predicted mean state trajectory
