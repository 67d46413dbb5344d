"""Analytic reference-trajectory generators (L1).

The reference consumes trajectory CSVs produced offline by its external
library (circle / lemniscate files named in configs, e.g.
``fast2_lemn.csv`` at ``launch/iris_sitl_traj_mpc.yaml:6``) with header
``t,x,y,z,vx,vy,vz,ax,ay,az,yaw`` in ENU
(``geometric_controller.cpp:463``). These generators produce the same file
format from closed-form circle / lemniscate primitives with exact
velocities and accelerations.
"""
from __future__ import annotations

import io
import os

import numpy as np

__all__ = ["circle_trajectory", "lemniscate_trajectory", "write_trajectory_csv"]

_HEADER = "t,x,y,z,vx,vy,vz,ax,ay,az,yaw"


def _pack(t, p, v, a, yaw) -> np.ndarray:
    return np.concatenate([t[:, None], p, v, a, yaw[:, None]], axis=1)


def circle_trajectory(radius: float = 1.0, period: float = 6.0, z: float = 1.5,
                      n_laps: float = 2.0, dt: float = 0.02,
                      yaw_follow: bool = True) -> np.ndarray:
    """ENU circle at constant altitude, exact derivatives."""
    t = np.arange(0.0, n_laps * period + dt, dt)
    w = 2 * np.pi / period
    c, s = np.cos(w * t), np.sin(w * t)
    p = np.stack([radius * c, radius * s, np.full_like(t, z)], 1)
    v = np.stack([-radius * w * s, radius * w * c, np.zeros_like(t)], 1)
    a = np.stack([-radius * w * w * c, -radius * w * w * s, np.zeros_like(t)], 1)
    yaw = np.arctan2(v[:, 1], v[:, 0]) if yaw_follow else np.zeros_like(t)
    return _pack(t, p, v, a, yaw)


def lemniscate_trajectory(scale: float = 1.5, period: float = 8.0, z: float = 1.5,
                          n_laps: float = 2.0, dt: float = 0.02) -> np.ndarray:
    """Figure-eight (Gerono lemniscate) in ENU: x = A sin(wt), y = A sin(wt)cos(wt)."""
    t = np.arange(0.0, n_laps * period + dt, dt)
    w = 2 * np.pi / period
    s, c = np.sin(w * t), np.cos(w * t)
    x = scale * s
    y = scale * s * c
    vx = scale * w * c
    vy = scale * w * (c * c - s * s)
    ax = -scale * w * w * s
    ay = -4 * scale * w * w * s * c
    p = np.stack([x, y, np.full_like(t, z)], 1)
    v = np.stack([vx, vy, np.zeros_like(t)], 1)
    a = np.stack([ax, ay, np.zeros_like(t)], 1)
    yaw = np.zeros_like(t)
    return _pack(t, p, v, a, yaw)


def write_trajectory_csv(path: str, rows: np.ndarray) -> None:
    path = os.path.expanduser(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    buf = io.StringIO()
    np.savetxt(buf, rows, delimiter=",", header=_HEADER, comments="", fmt="%.9g")
    with open(path, "w") as f:
        f.write(buf.getvalue())
