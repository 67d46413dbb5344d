"""MPC cost assembly (L3).

Implements the full ``cost_params`` schema of the reference configs
(``launch/iris_sitl_traj_mpc.yaml:32-41``, posctrl extras at
``launch/iris_sitl_posctrl_mpc.yaml:40-41``):

- ``uref``/``uerr``: quadratic control-effort cost about the hover command;
- ``perr``/``verr``/``qerr``/``werr``: per-axis quadratic tracking weights on
  position, velocity, attitude error and body rate. Attitude error is the
  vector part of ``q_ref^{-1} ⊗ q`` (the reference leaves the exact form to
  the external library; this sign-corrected error-quaternion form is the
  standard choice and is documented here per SURVEY.md §7 "hard parts");
- ``u_slew_coeff``: quadratic penalty on successive control differences;
- ``u_slew_constr`` + ``u_slew_constr_coeff``: one-sided quadratic penalties
  when the per-step control rate (du/dt) leaves a per-motor box;
- ``res_mult``: uncertainty penalty — mean squared diffusion magnitude
  accumulated along the sampled paths;
- ``discount``: geometric stage discount (``iris_sitl_traj_mpc.yaml:49``).

Costs reduce over particles by mean; when the particle axis is sharded over
a mesh, XLA lowers that mean to a ``psum`` over ICI (SURVEY.md §2.15).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sde4mbrl_px4_tpu.core import quaternion as quat
from sde4mbrl_px4_tpu.core.types import POS, VEL, QUAT, OMEGA

__all__ = ["CostParams", "make_cost_fn"]


class CostParams(NamedTuple):
    uref: jax.Array            # (n_u,)
    uerr: jax.Array            # scalar
    perr: jax.Array            # (3,)
    verr: jax.Array            # (3,)
    qerr: jax.Array            # (3,)
    werr: jax.Array            # (3,)
    res_mult: jax.Array        # scalar
    u_slew_coeff: jax.Array    # scalar
    u_slew_constr: Optional[jax.Array]  # (n_u, 2) [lo, hi] du/dt box, or None
    u_slew_constr_coeff: jax.Array      # scalar
    discount: jax.Array        # scalar
    # Risk-sensitive particle reduction (SURVEY.md §7 L3: "risk reduction
    # across particles (mean / mean+lambda*std)"): 0 = risk-neutral mean
    # (reference parity); > 0 adds lambda * std of the per-particle
    # discounted stage cost, penalizing plans whose outcome SPREAD is wide,
    # not just whose mean is high. ``cost_params.risk_lambda`` config key.
    risk_lambda: jax.Array = None  # scalar; None coerced in from_config
    # Soft state constraints (``state_constr`` block, present-but-commented
    # in the reference configs, ``iris_sitl_traj_mpc.yaml:16-29`` — part of
    # the solver's capability surface per SURVEY.md §2.10). Densified onto
    # the full 13-state: weight 0 disables a component.
    state_pen13: Optional[jax.Array] = None   # (13,) penalty (0 = unconstrained)
    state_lo13: Optional[jax.Array] = None    # (13,) lower bounds (-1e9 pad)
    state_hi13: Optional[jax.Array] = None    # (13,) upper bounds (+1e9 pad)
    state_inv_scale13: Optional[jax.Array] = None  # (13,) 1/slack_scaling
    constr_pen: float = 0.0  # global multiplier (coerced at use sites; a
    # jnp default here would initialize the backend at import time)
    # Proximal-slack form (``slack_proximal: True``): the decision sequence
    # is augmented by one slack-target column per constrained state
    # ("augment the number of variables of the problem by the number of
    # slack constraints", reference schema comment,
    # ``hexa_posctrl_mpc.yaml:36-39``). The slack targets s are
    # box-projected to the state bounds by the solver's proximal step —
    # they are always admissible — and the smooth cost couples the state to
    # them with ``pen_i * ((x_i - s_i) * inv_scale_i)^2``. Minimizing over
    # s in [lo, hi] analytically gives pen_i * dist(x_i, [lo_i, hi_i])^2:
    # the penalty form WITHOUT its ``constr_pen`` relaxation factor, so the
    # proximal form enforces the bounds at full ``state_penalty`` weight
    # (constr_pen < 1 in the reference configs relaxes only the penalty
    # path). Validated by ``tests/test_prox_slack.py``.
    slack_pen: Optional[jax.Array] = None        # (m,) state_penalty
    slack_inv_scale: Optional[jax.Array] = None  # (m,) 1/slack_scaling
    slack_sel: Optional[jax.Array] = None        # (m, 13) one-hot selector
    slack_lo: Optional[jax.Array] = None         # (m,) projection bounds
    slack_hi: Optional[jax.Array] = None         # (m,)

    @staticmethod
    def from_config(cfg: Dict[str, Any], n_u: int) -> "CostParams":
        cp = cfg["cost_params"]

        def vec(v, n):
            a = np.asarray(v, np.float32)
            return jnp.asarray(np.broadcast_to(a, (n,)))

        slew_constr = cp.get("u_slew_constr")

        sc = cfg.get("state_constr")
        pen13 = lo13 = hi13 = inv13 = None
        spen = sinv = ssel = slo = shi = None
        constr_pen = 0.0
        if sc is not None:
            ids = list(sc["state_id"])
            m = len(ids)
            pen_m = np.asarray(sc["state_penalty"], np.float32)
            b = np.asarray(sc["state_bound"], np.float32)
            inv_m = 1.0 / np.asarray(sc.get("slack_scaling", np.ones(m)),
                                     np.float32)
            if sc.get("slack_proximal"):
                sel = np.zeros((m, 13), np.float32)
                sel[np.arange(m), ids] = 1.0
                spen, sinv = jnp.asarray(pen_m), jnp.asarray(inv_m)
                ssel = jnp.asarray(sel)
                slo, shi = jnp.asarray(b[:, 0]), jnp.asarray(b[:, 1])
            else:
                pen = np.zeros(13, np.float32)
                lo = np.full(13, -1e9, np.float32)
                hi = np.full(13, 1e9, np.float32)
                inv = np.ones(13, np.float32)
                pen[ids] = pen_m
                lo[ids] = b[:, 0]
                hi[ids] = b[:, 1]
                inv[ids] = inv_m
                pen13, lo13, hi13 = jnp.asarray(pen), jnp.asarray(lo), jnp.asarray(hi)
                inv13 = jnp.asarray(inv)
                constr_pen = float(sc.get("constr_pen", 1.0))

        return CostParams(
            uref=vec(cp["uref"], n_u),
            uerr=jnp.float32(cp.get("uerr", 0.0)),
            perr=vec(cp.get("perr", 0.0), 3),
            verr=vec(cp.get("verr", 0.0), 3),
            qerr=vec(cp.get("qerr", 0.0), 3),
            werr=vec(cp.get("werr", 0.0), 3),
            res_mult=jnp.float32(cp.get("res_mult", 0.0)),
            u_slew_coeff=jnp.float32(cp.get("u_slew_coeff", 0.0)),
            u_slew_constr=None if slew_constr is None else jnp.asarray(slew_constr, jnp.float32),
            u_slew_constr_coeff=jnp.float32(cp.get("u_slew_constr_coeff", 0.0)),
            discount=jnp.float32(cfg.get("discount", 1.0)),
            # None (not 0.0) when unused: sqrt's gradient at zero spread is
            # NaN, and 0.0 * NaN would still poison every P=1 gradient —
            # the term must be absent from the graph, not multiplied away.
            risk_lambda=(jnp.float32(cp["risk_lambda"])
                         if cp.get("risk_lambda") else None),
            state_pen13=pen13,
            state_lo13=lo13,
            state_hi13=hi13,
            state_inv_scale13=inv13,
            constr_pen=jnp.float32(constr_pen),
            slack_pen=spen,
            slack_inv_scale=sinv,
            slack_sel=ssel,
            slack_lo=slo,
            slack_hi=shi,
        )


def _stage_tracking(cp: CostParams, x: jax.Array, x_ref: jax.Array) -> jax.Array:
    """Quadratic tracking cost of states vs references; broadcasts leading dims."""
    dp = x[..., POS] - x_ref[..., POS]
    dv = x[..., VEL] - x_ref[..., VEL]
    dq = quat.qerr_vec(x[..., QUAT], x_ref[..., QUAT])
    dw = x[..., OMEGA] - x_ref[..., OMEGA]
    return (
        jnp.sum(cp.perr * dp * dp, -1)
        + jnp.sum(cp.verr * dv * dv, -1)
        + jnp.sum(cp.qerr * dq * dq, -1)
        + jnp.sum(cp.werr * dw * dw, -1)
    )


def make_cost_fn(cp: CostParams, time_steps: jax.Array):
    """Build the total-cost function for a horizon.

    Returns ``cost(x_paths, sigma_paths, u_seq, x_ref, u_prev) -> scalar``:

    - ``x_paths``: (P, H+1, 13) sampled paths (or (H+1, 13) mean path);
    - ``sigma_paths``: (P, H, 13) diffusion magnitudes or None;
    - ``u_seq``: (H, n_u);
    - ``x_ref``: (H+1, 13) per-stage reference (constant target broadcast by
      the caller in position-hold mode);
    - ``u_prev``: (n_u,) last applied control for the first slew difference
      (defaults to ``uref`` when None);
    - ``s_seq``: (H, m) proximal slack targets when the config uses
      ``slack_proximal: True`` (see :class:`CostParams`); the caller owns
      splitting the augmented decision sequence.
    """
    H = int(time_steps.shape[0])
    disc = cp.discount ** jnp.arange(1, H + 1, dtype=jnp.float32)

    def cost_fn(x_paths, sigma_paths, u_seq, x_ref, u_prev=None, s_seq=None):
        if x_paths.ndim == 2:
            x_paths = x_paths[None]
        # Tracking: stages 1..H of each particle path, discounted, mean over particles.
        track = _stage_tracking(cp, x_paths[:, 1:, :], x_ref[None, 1:, :])  # (P, H)
        if cp.slack_sel is not None and s_seq is not None:
            # Proximal-slack coupling: state components vs their (projected,
            # admissible) slack targets, discounted like tracking.
            x_sel = jnp.einsum("phj,mj->phm", x_paths[:, 1:, :],
                   cp.slack_sel,
                   precision=jax.lax.Precision.HIGHEST)
            dsl = (x_sel - s_seq[None]) * cp.slack_inv_scale
            track = track + jnp.sum(cp.slack_pen * dsl * dsl, -1)
        if cp.state_pen13 is not None:
            # Soft state-box violations, scaled (slack_scaling) and
            # penalized quadratically; discounted like the tracking stages.
            xs = x_paths[:, 1:, :]
            over = jnp.maximum(xs - cp.state_hi13, 0.0) * cp.state_inv_scale13
            under = jnp.maximum(cp.state_lo13 - xs, 0.0) * cp.state_inv_scale13
            viol = jnp.sum(cp.state_pen13 * (over * over + under * under), -1)
            track = track + cp.constr_pen * viol
        # Per-particle discounted uncertainty penalty (res_mult), computed
        # up front so the risk spread below prices diffusion-carried
        # outcome spread too, not just tracking spread.
        res_p = None
        if sigma_paths is not None:
            if sigma_paths.ndim == 2:
                sigma_paths = sigma_paths[None]
            res_p = cp.res_mult * jnp.sum(
                disc * jnp.sum(sigma_paths * sigma_paths, -1), axis=-1)  # (P,)

        # Risk reduction across particles (SURVEY.md §7 L3): mean, plus an
        # optional lambda * std term on the per-particle discounted totals
        # (tracking + constraints + uncertainty penalty). When the particle
        # axis is sharded, XLA lowers both moments to psum over the mesh.
        tr_p = jnp.sum(disc * track, axis=-1)          # (P,)
        j_track = jnp.mean(tr_p)
        if cp.risk_lambda is not None and tr_p.shape[0] > 1:
            tot_p = tr_p if res_p is None else tr_p + res_p
            # sqrt(var + eps): keeps the gradient finite when all particle
            # costs coincide (e.g. near-zero diffusion).
            var = jnp.mean((tot_p - jnp.mean(tot_p)) ** 2)
            j_track = j_track + cp.risk_lambda * jnp.sqrt(var + 1e-12)

        # Control effort about uref.
        du = u_seq - cp.uref
        j_u = cp.uerr * jnp.sum(disc[:, None] * du * du)

        # Slew: first step vs u_prev, then successive differences.
        up = cp.uref if u_prev is None else u_prev
        slew = jnp.diff(jnp.concatenate([up[None, :], u_seq], axis=0), axis=0)  # (H, n_u)
        j_slew = cp.u_slew_coeff * jnp.sum(slew * slew)

        # One-sided du/dt box penalties (posctrl configs only).
        j_slew_c = jnp.float32(0.0)
        if cp.u_slew_constr is not None:
            rate = slew / time_steps[:, None]
            lo, hi = cp.u_slew_constr[:, 0], cp.u_slew_constr[:, 1]
            viol = jnp.maximum(rate - hi, 0.0) ** 2 + jnp.maximum(lo - rate, 0.0) ** 2
            j_slew_c = cp.u_slew_constr_coeff * jnp.sum(viol)

        # Uncertainty penalty: discounted mean squared diffusion along paths
        # (particle mean of res_p computed above).
        j_res = jnp.float32(0.0) if res_p is None else jnp.mean(res_p)

        return j_track + j_u + j_slew + j_slew_c + j_res

    return cost_fn
