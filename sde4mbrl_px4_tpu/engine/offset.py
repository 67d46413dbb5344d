"""Host-side disturbance-offset adaptation (opt-in) — integral action
for unmodeled steady disturbances.

A finite-horizon MPC with no integral action holds a steady OFFSET under
constant model mismatch (unmodeled payload, battery sag, wind): the
mismatch sweep (``examples/mismatch_sweep.py``) measures 0.17–0.46 m of
hover bias at mass ±20%. The classic fix is reference shaping: integrate
the position error and command a target shifted PAST the true target so
the biased closed loop settles ON it.

This estimator is deliberately host-side and solver-agnostic — it wraps
ANY of the solver families without touching their compiled programs (no
retrace, no golden churn; everything stays OFF by default):

    est = DisturbanceEstimator(gain=..., limit=...)
    target_shifted = est.update(x_ned, target_enu)   # per control tick

Anti-windup: the integrator clamps at ``limit`` meters and only
integrates when the error is within ``capture`` (far from the target the
transient would wind the integrator up and cause overshoot).

Engine wiring: ``RecedingHorizonController(..., offset_adaptation=
{"gain": 0.4, "limit": 1.0})`` applies it to the pos/setpoint modes
(reference automata target path). Trajectory mode is out of scope: its
reference comes from the time-indexed window, not ``target_x``
(``sde_control.py:412``).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["DisturbanceEstimator"]


class DisturbanceEstimator:
    """Integral reference-shaping on the position target (ENU in/out,
    integration in NED where the plant state lives)."""

    def __init__(self, gain: float = 0.4, limit: float = 1.0,
                 dt: float = 0.05, capture: float = 2.0,
                 leak: float = 0.0):
        self.gain = float(gain)
        self.limit = float(limit)
        self.dt = float(dt)
        self.capture = float(capture)
        self.leak = float(leak)
        self.offset_ned = np.zeros(3)

    def reset(self) -> None:
        self.offset_ned[:] = 0.0

    @staticmethod
    def _enu2ned_pos(p):
        return np.array([p[1], p[0], -p[2]], np.float64)

    @staticmethod
    def _ned2enu_pos(p):
        return np.array([p[1], p[0], -p[2]], np.float64)

    def update(self, x_ned: np.ndarray, target_enu: np.ndarray) -> np.ndarray:
        """One control tick: integrate the NED position error and return
        the SHIFTED 13-dim ENU target to hand the solver."""
        target_enu = np.asarray(target_enu, np.float32)
        tgt_ned = self._enu2ned_pos(target_enu[:3])
        err = tgt_ned - np.asarray(x_ned[:3], np.float64)
        if np.linalg.norm(err) < self.capture:
            self.offset_ned *= (1.0 - self.leak * self.dt)
            self.offset_ned += self.gain * self.dt * err
            np.clip(self.offset_ned, -self.limit, self.limit,
                    out=self.offset_ned)
        out = target_enu.copy()
        out[:3] = (target_enu[:3].astype(np.float64)
                   + self._ned2enu_pos(self.offset_ned)).astype(np.float32)
        return out
