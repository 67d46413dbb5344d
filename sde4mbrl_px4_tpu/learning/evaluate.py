"""Model evaluation: k-step prediction error and uncertainty calibration.

The reference flies a learned model but ships no way to quantify it — model
quality is judged by closed-loop flight (SURVEY.md §4). This module closes
that loop offline, the natural counterpart of ``learning/trainer.py``:

- :func:`kstep_errors` — open-loop k-step-ahead prediction RMSE of the
  mean dynamics against a recorded state/control sequence, per state group
  (position, velocity, attitude angle, body rate). This is the standard
  model-predictive-quality metric for the MPC horizon (k·dt lookahead vs
  the horizon the solver actually uses).
- :func:`calibration` — does the diffusion term mean anything? Empirical
  coverage of the Monte-Carlo particle ensemble at k steps vs the nominal
  central-interval probability, plus the spread ratio (ensemble std /
  realized error). Coverage ≪ nominal ⇒ overconfident model (uncertainty
  cost under-penalizes); ≫ ⇒ inflated noise.

All sweeps are vmapped over prediction windows; shapes are static so the
whole evaluation jits once.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sde4mbrl_px4_tpu.models.sde_model import NeuralSDE
from sde4mbrl_px4_tpu.ops.rollout import rollout_mean, rollout_sde

__all__ = ["kstep_errors", "calibration", "evaluate_model"]


def _windows(n: int, k: int, max_windows: int) -> np.ndarray:
    """Evenly-spaced window start indices: every window fits k steps."""
    last = n - k - 1
    if last < 0:
        raise ValueError(f"sequence of {n} samples is too short for k={k}")
    count = min(last + 1, max_windows)
    return np.unique(np.linspace(0, last, count).astype(np.int64))


def _quat_angle(qa: jax.Array, qb: jax.Array) -> jax.Array:
    """Geodesic attitude angle [rad] between unit quaternions (sign-free)."""
    d = jnp.clip(jnp.abs(jnp.sum(qa * qb, axis=-1)), 0.0, 1.0)
    return 2.0 * jnp.arccos(d)


def kstep_errors(
    model: NeuralSDE,
    params: Dict[str, Any],
    t: np.ndarray,
    x: np.ndarray,
    u: np.ndarray,
    ks: Sequence[int] = (1, 5, 10, 20),
    max_windows: int = 256,
) -> Dict[str, Dict[str, float]]:
    """Open-loop k-step mean-dynamics prediction errors.

    Args:
        t: (N,) sample times (uniform spacing assumed; dt taken from median).
        x: (N, 13) measured states, u: (N, n_u) applied controls (u[i] acts
           over [t[i], t[i+1]]).

    Returns ``{f"k{k}": {"horizon_s", "pos_rmse_m", "vel_rmse_mps",
    "att_err_rad", "rate_rmse_radps"}}``.
    """
    t = np.asarray(t, np.float64)
    x = jnp.asarray(x, jnp.float32)
    u = jnp.asarray(u, jnp.float32)
    dt = float(np.median(np.diff(t)))
    out: Dict[str, Dict[str, float]] = {}

    for k in ks:
        idx = jnp.asarray(_windows(x.shape[0], int(k), max_windows))
        ts = jnp.full((int(k),), dt, jnp.float32)

        def one(i, k=int(k), ts=ts):
            x0 = x[i]
            useq = jax.lax.dynamic_slice_in_dim(u, i, k, axis=0)
            xs = rollout_mean(model, params, x0, useq, ts)
            return xs[-1]

        xp = jax.jit(jax.vmap(one))(idx)
        xt = x[idx + int(k)]
        pos = jnp.sqrt(jnp.mean(jnp.sum((xp[:, 0:3] - xt[:, 0:3]) ** 2, -1)))
        vel = jnp.sqrt(jnp.mean(jnp.sum((xp[:, 3:6] - xt[:, 3:6]) ** 2, -1)))
        att = jnp.mean(_quat_angle(xp[:, 6:10], xt[:, 6:10]))
        rate = jnp.sqrt(jnp.mean(jnp.sum((xp[:, 10:13] - xt[:, 10:13]) ** 2, -1)))
        out[f"k{k}"] = {
            "horizon_s": round(k * dt, 4),
            "pos_rmse_m": float(pos),
            "vel_rmse_mps": float(vel),
            "att_err_rad": float(att),
            "rate_rmse_radps": float(rate),
            "windows": int(idx.shape[0]),
        }
    return out


def calibration(
    model: NeuralSDE,
    params: Dict[str, Any],
    t: np.ndarray,
    x: np.ndarray,
    u: np.ndarray,
    k: int = 10,
    num_particles: int = 128,
    levels: Sequence[float] = (0.5, 0.9),
    max_windows: int = 64,
    seed: int = 0,
) -> Dict[str, Any]:
    """Ensemble calibration at k steps ahead.

    For each window, P stochastic EM paths are rolled; at the k-th step the
    measured state is scored against the per-dimension particle ensemble
    over the Euclidean dims (pos+vel+rate, 9 dims):

    - ``coverage[q]``: fraction of (window, dim) pairs where the truth lies
      inside the central q-interval of the ensemble (well-calibrated ⇒ ≈ q);
    - ``spread_ratio``: median over dims of ensemble std / RMS realized
      error (≈ 1 when the noise scale matches reality).
    """
    t = np.asarray(t, np.float64)
    x = jnp.asarray(x, jnp.float32)
    u = jnp.asarray(u, jnp.float32)
    dt = float(np.median(np.diff(t)))
    idx = jnp.asarray(_windows(x.shape[0], int(k), max_windows))
    ts = jnp.full((int(k),), dt, jnp.float32)
    rngs = jax.random.split(jax.random.PRNGKey(seed), idx.shape[0])
    eu = jnp.asarray([0, 1, 2, 3, 4, 5, 10, 11, 12])  # Euclidean state dims

    def one(i, rng):
        useq = jax.lax.dynamic_slice_in_dim(u, i, int(k), axis=0)
        paths, _ = rollout_sde(model, params, x[i], useq, ts, rng,
                               num_particles=num_particles)
        return paths[:, -1, :][:, eu]                  # (P, 9)

    samples = jax.jit(jax.vmap(one))(idx, rngs)        # (W, P, 9)
    truth = x[idx + int(k)][:, eu]                     # (W, 9)

    report: Dict[str, Any] = {"k": int(k), "horizon_s": round(k * dt, 4),
                              "num_particles": int(num_particles),
                              "windows": int(idx.shape[0]), "coverage": {}}
    for q in levels:
        lo = jnp.quantile(samples, 0.5 - q / 2, axis=1)   # (W, 9)
        hi = jnp.quantile(samples, 0.5 + q / 2, axis=1)
        inside = (truth >= lo) & (truth <= hi)
        report["coverage"][f"{q:.2f}"] = float(jnp.mean(inside))
    spread = jnp.std(samples, axis=1)                     # (W, 9)
    err = jnp.abs(truth - jnp.mean(samples, axis=1))      # (W, 9)
    rms_err = jnp.sqrt(jnp.mean(err**2, axis=0))          # (9,)
    rms_spread = jnp.sqrt(jnp.mean(spread**2, axis=0))
    report["spread_ratio"] = float(jnp.median(rms_spread / (rms_err + 1e-9)))
    return report


def evaluate_model(
    model: NeuralSDE,
    params: Dict[str, Any],
    t: np.ndarray,
    x: np.ndarray,
    u: np.ndarray,
    ks: Sequence[int] = (1, 5, 10, 20),
    calib_k: int = 10,
    num_particles: int = 128,
) -> Dict[str, Any]:
    """Full report: k-step errors + calibration (see module docstring)."""
    return {
        "kstep": kstep_errors(model, params, t, x, u, ks=ks),
        "calibration": calibration(model, params, t, x, u, k=calib_k,
                                   num_particles=num_particles),
    }
