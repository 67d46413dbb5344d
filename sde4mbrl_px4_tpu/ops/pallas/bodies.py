"""Shared Mosaic kernel bodies for the fused MPC kernels (L2).

Single source of truth for the step math and the two horizon sweeps that
``solve_kernels.py`` (per-evaluation oracle kernels) and ``apg_kernel.py``
(whole-solve mega-kernel) both execute:

- :func:`make_step` — one Euler-Maruyama step + stage cost on values;
- :func:`control_cost` — the control-only cost terms (uerr / slew /
  slew-rate box) in value form;
- :func:`vg_sweep` — checkpointed forward + manual reverse sweep producing
  the total cost and its gradient w.r.t. the decision sequence;
- :func:`candidate_rollout` — K linesearch candidates x P particles rolled
  out in one batched horizon loop.

The sweeps are parameterized by a :class:`SweepCtx` carrying the refs and
weight values each caller wires up from its own consts layout, so a change
to the step math, the closed-form control gradients, or the sweep structure
lands exactly once (this file replaces the mirrored bodies flagged in round
1; both parity suites — ``test_pallas_kernels.py`` and
``test_apg_kernel.py`` — pin the semantics).

Mosaic lowering constraints that shape this code (measured on v5e, see
``solve_kernels.py`` header): fori_loop bodies compiled once; per-step data
read by leading-dim dynamic indexing of refs; no minor-dim dynamic slices,
no ``jnp.cross``/``jnp.stack``; dynamic scalar reads from SMEM refs.

Reference analogue: the jitted external solve invoked at
``sde_control.py:420`` (SURVEY.md §3.3).
"""
from __future__ import annotations

import os
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

_G = 9.81
# Horizon-loop unroll factor. Mosaic supports only unroll=1 or full
# unroll (=trip count), and full unroll of the H=20 bodies inside the
# 200-iteration solve loop blew the compile past 30 minutes on v5e —
# incompatible with the <30 s bring-up budget — so the default stays 1
# and the knob exists for measurement only (SDE4MBRL_UNROLL).
_UNROLL = int(os.environ.get("SDE4MBRL_UNROLL", "1"))
NSCAL = 6  # [mass, diff_scale, uerr, u_slew_coeff, slew_c_coeff, res_mult]


# --------------------------------------------------------------------------
# Lane-wise vector algebra (Mosaic-safe: no dim-0 concats, no stacks)
# --------------------------------------------------------------------------

def _cross(a, b):
    ax, ay, az = a[:, 0:1], a[:, 1:2], a[:, 2:3]
    bx, by, bz = b[:, 0:1], b[:, 1:2], b[:, 2:3]
    return jnp.concatenate(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=1
    )


def _qrotate(q, v):
    w = q[:, 0:1]
    u = q[:, 1:4]
    t = _cross(u, v) + w * v
    return v + 2.0 * _cross(u, t)


def _qmul_omega(q, omega):
    """0.5 * q ⊗ [0, ω]."""
    qw, qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3], q[:, 3:4]
    ox, oy, oz = omega[:, 0:1], omega[:, 1:2], omega[:, 2:3]
    return 0.5 * jnp.concatenate(
        [
            -qx * ox - qy * oy - qz * oz,
            qw * ox + qy * oz - qz * oy,
            qw * oy - qx * oz + qz * ox,
            qw * oz + qx * oy - qy * ox,
        ],
        axis=1,
    )


# --------------------------------------------------------------------------
# Single EM step + stage cost, on values (the unit both sweeps build on)
# --------------------------------------------------------------------------

def make_step(veh_mass: float, has_noise: bool, has_state_constr: bool = False,
              n_u: Optional[int] = None, want_acts: bool = False):
    """Returns step(p, v, q, om, u_b, z, r, dt, W, sc) ->
    ((p', v', q', om'), track (B,1), res2 (B,1))
    where W = (w0,b0,w1,b1,w2,b2, mix_eff, inertia, wstate, diff_scale).

    ``want_acts``: additionally return the trunk pre-activations
    ``(h0p, h1p, h2)`` — the residuals the hand-derived backward
    (:func:`manual_bwd_step`) consumes from the forward sweep's stash
    instead of re-tracing the forward inside each reverse step.

    ``sc``: when ``has_state_constr``, the soft/proximal state-constraint
    inputs (reference ``state_constr`` schema,
    ``iris_sitl_traj_mpc.yaml:16-29``). They are kernel INPUTS (Mosaic
    forbids captured array constants). Two forms:

    - penalty (``slack_proximal: False``): a 4-tuple of (1,13) arrays
      (pen13 incl. the global constr_pen multiplier, lo13, hi13, inv13) —
      one-sided quadratic box-violation penalties;
    - proximal (``slack_proximal: True``): a 3-tuple
      (penm (1,m), invm (1,m), selT (13,m)); the decision row ``u_b`` is
      then (B, n_u + m) — columns past ``n_u`` are the per-stage slack
      targets s, box-projected to the state bounds by the solver's proximal
      step, and the stage cost couples the new state to them with
      ``penm * ((x_sel - s) * invm)^2`` (``cost/cost.py`` documents the
      formulation). ``n_u`` must be given in this form so the dynamics read
      only the control columns.
    """
    prox = has_state_constr and n_u is not None

    def step(p_, v, q, omega, u_b, z, r, dt, W, sc=None):
        w0, b0, w1, b1, w2, b2, mix_eff, inertia, wstate, diff_scale = W
        B = p_.shape[0]
        f32 = p_.dtype
        if prox:
            u_dyn = u_b[:, 0:n_u]
            s_slack = u_b[:, n_u:]
        else:
            u_dyn = u_b
        e_z = jnp.concatenate(
            [jnp.zeros((B, 2), f32), jnp.ones((B, 1), f32)], axis=1
        )

        # features: body-frame velocity, rates, gravity direction, motors
        qc = jnp.concatenate([q[:, 0:1], -q[:, 1:4]], axis=1)
        v_body = _qrotate(qc, v)
        g_body = _qrotate(qc, e_z)
        feat = jnp.concatenate([v_body, omega, g_body, u_dyn], axis=1)

        # trunk (3 matmuls) -> residual wrench + raw sigma
        h0p = jnp.dot(feat, w0, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST) + b0
        h0 = h0p * jax.nn.sigmoid(h0p)
        h1p = jnp.dot(h0, w1, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST) + b1
        h1 = h1p * jax.nn.sigmoid(h1p)
        h = jnp.dot(h1, w2, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST) + b2
        res = h[:, 0:6]
        sig6 = jax.nn.softplus(h[:, 6:12]) * diff_scale

        # drift: physics prior + residual
        wrench = jnp.dot(u_dyn, mix_eff.T, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        thrust = wrench[:, 0:1]
        tau = wrench[:, 1:4]
        f_body = res[:, 0:3] - thrust * e_z
        acc = _G * e_z + _qrotate(q, f_body) / veh_mass
        domega = (tau + res[:, 3:6] - _cross(omega, inertia * omega)) / inertia
        dq = _qmul_omega(q, omega)

        # EM update (+ optional Brownian term), quaternion renormalized
        p1 = p_ + dt * v
        if has_noise:
            sd = jnp.sqrt(dt)
            v1 = v + dt * acc + sd * sig6[:, 0:3] * z[:, 3:6]
            om1 = omega + dt * domega + sd * sig6[:, 3:6] * z[:, 10:13]
        else:
            v1 = v + dt * acc
            om1 = omega + dt * domega
        q1 = q + dt * dq
        q1 = q1 / jnp.sqrt(jnp.sum(q1 * q1, axis=1, keepdims=True) + 1e-12)

        # stage cost at the NEW state vs r (1,13)
        dp = p1 - r[:, 0:3]
        dv = v1 - r[:, 3:6]
        dw = om1 - r[:, 10:13]
        rw, rx, ry, rz = r[0, 6], r[0, 7], r[0, 8], r[0, 9]
        qw_, qx_, qy_, qz_ = q1[:, 0:1], q1[:, 1:2], q1[:, 2:3], q1[:, 3:4]
        ew = rw * qw_ + rx * qx_ + ry * qy_ + rz * qz_
        ex = rw * qx_ - rx * qw_ - ry * qz_ + rz * qy_
        ey = rw * qy_ + rx * qz_ - ry * qw_ - rz * qx_
        ez = rw * qz_ - rx * qy_ + ry * qx_ - rz * qw_
        s = jnp.where(ew < 0, -1.0, 1.0)
        dqv = s * jnp.concatenate([ex, ey, ez], axis=1)

        track = (
            jnp.sum(wstate[:, 0:3] * dp * dp, axis=1, keepdims=True)
            + jnp.sum(wstate[:, 3:6] * dv * dv, axis=1, keepdims=True)
            + jnp.sum(wstate[:, 6:9] * dqv * dqv, axis=1, keepdims=True)
            + jnp.sum(wstate[:, 9:12] * dw * dw, axis=1, keepdims=True)
        )
        if prox:
            penm, invm, selT = sc
            x13 = jnp.concatenate([p1, v1, q1, om1], axis=1)
            x_sel = jnp.dot(x13, selT, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)  # (B, m)
            dslack = (x_sel - s_slack) * invm
            track = track + jnp.sum(penm * dslack * dslack, axis=1,
                                    keepdims=True)
        elif has_state_constr:
            pen13, lo13, hi13, inv13 = sc
            segs = ((p1, slice(0, 3)), (v1, slice(3, 6)),
                    (q1, slice(6, 10)), (om1, slice(10, 13)))
            for xcomp, sl in segs:
                over = jnp.maximum(xcomp - hi13[:, sl], 0.0) * inv13[:, sl]
                under = jnp.maximum(lo13[:, sl] - xcomp, 0.0) * inv13[:, sl]
                track = track + jnp.sum(
                    pen13[:, sl] * (over * over + under * under),
                    axis=1, keepdims=True,
                )

        res2 = jnp.sum(sig6 * sig6, axis=1, keepdims=True)
        if want_acts:
            return (p1, v1, q1, om1), track, res2, (h0p, h1p, h)
        return (p1, v1, q1, om1), track, res2

    return step


def _qrotate_bwd(w, u3, X, c_out):
    """VJP of ``out = X + 2*cross(u3, t)`` with ``t = cross(u3, X) + w*X``
    (the :func:`_qrotate` body). Recomputes ``t`` (cheap) and returns
    ``(c_w (B,1), c_u3 (B,3), c_X (B,3))``.

    Cross-product VJP identities used throughout: for ``c = a x b``,
    ``ct_a = b x ct_c`` and ``ct_b = ct_c x a``.
    """
    t = _cross(u3, X) + w * X
    c_c2 = 2.0 * c_out                       # c2 = cross(u3, t)
    c_u3 = _cross(t, c_c2)
    c_t = _cross(c_c2, u3)
    c_u3 = c_u3 + _cross(X, c_t)
    c_X = _cross(c_t, u3) + w * c_t + c_out
    c_w = jnp.sum(X * c_t, axis=1, keepdims=True)
    return c_w, c_u3, c_X


def manual_bwd_step(st_t, u_b, acts, x1, ct, r, dt, d_t, W, veh_mass,
                    res_mult):
    """Hand-derived VJP of one DETERMINISTIC EM step + stage cost.

    Replaces the traced ``jax.vjp(step)`` in the reverse sweep for the
    flight configuration (no noise, no state constraints, no slack
    columns): the traced VJP re-runs the whole forward inside every
    reverse step because its residuals keep it alive; here the expensive
    residuals — the trunk pre-activations — come from the forward sweep's
    stash (``want_acts``) and only cheap pieces (quaternion products,
    sigmoids) are recomputed. Parity vs the traced VJP is pinned by
    ``tests/test_pallas_kernels.py::test_manual_bwd_matches_vjp``.

    Args: ``st_t`` (B,13) pre-step state; ``u_b`` (B,n) controls;
    ``acts`` = (h0p, h1p, h2) stashed trunk pre-activations; ``x1``
    (B,13) post-step (normalized) state from the stash; ``ct`` =
    (cp1, cv1, cq1, com1) downstream cotangents; ``r`` (1,13) stage
    reference; scalars ``dt`` (step), ``d_t`` (discount); ``W`` the step
    weight tuple. Returns ``(cp, cv, cq, com, c_u (B,n))``.
    """
    w0, b0, w1, b1, w2, b2, mix_eff, inertia, wstate, diff_scale = W
    h0p, h1p, h2 = acts
    cp1, cv1, cq1, com1 = ct
    B = st_t.shape[0]
    f32 = st_t.dtype
    p_, v, q, om = st_t[:, 0:3], st_t[:, 3:6], st_t[:, 6:10], st_t[:, 10:13]
    p1, v1, q1, om1 = x1[:, 0:3], x1[:, 3:6], x1[:, 6:10], x1[:, 10:13]
    e_z = jnp.concatenate(
        [jnp.zeros((B, 2), f32), jnp.ones((B, 1), f32)], axis=1)
    cT = d_t / B                              # mean(track) cotangent/elem
    cR = d_t * res_mult / B                   # mean(res2) cotangent/elem

    # ---- stage-cost backward (reads the stashed post state) ---------------
    dp = p1 - r[:, 0:3]
    dv = v1 - r[:, 3:6]
    dw = om1 - r[:, 10:13]
    cp1 = cp1 + cT * 2.0 * wstate[:, 0:3] * dp
    cv1 = cv1 + cT * 2.0 * wstate[:, 3:6] * dv
    com1 = com1 + cT * 2.0 * wstate[:, 9:12] * dw
    rw, rx, ry, rz = r[0, 6], r[0, 7], r[0, 8], r[0, 9]
    qw_, qx_, qy_, qz_ = q1[:, 0:1], q1[:, 1:2], q1[:, 2:3], q1[:, 3:4]
    ew = rw * qw_ + rx * qx_ + ry * qy_ + rz * qz_
    ex = rw * qx_ - rx * qw_ - ry * qz_ + rz * qy_
    ey = rw * qy_ + rx * qz_ - ry * qw_ - rz * qx_
    ez = rw * qz_ - rx * qy_ + ry * qx_ - rz * qw_
    s = jnp.where(ew < 0, -1.0, 1.0)
    # dqv = s*[ex,ey,ez]; s is piecewise constant (zero derivative a.e.)
    c_ex = s * cT * 2.0 * wstate[:, 6:7] * (s * ex)
    c_ey = s * cT * 2.0 * wstate[:, 7:8] * (s * ey)
    c_ez = s * cT * 2.0 * wstate[:, 8:9] * (s * ez)
    cq1 = cq1 + jnp.concatenate(
        [
            -rx * c_ex - ry * c_ey - rz * c_ez,
            rw * c_ex - rz * c_ey + ry * c_ez,
            rz * c_ex + rw * c_ey - rx * c_ez,
            -ry * c_ex + rx * c_ey + rw * c_ez,
        ],
        axis=1,
    )

    # ---- sigma / res2 backward (recompute softplus from stashed h2) -------
    h2s = h2[:, 6:12]
    sig_h2 = jax.nn.sigmoid(h2s)
    sig6 = jax.nn.softplus(h2s) * diff_scale
    c_sig6 = cR * 2.0 * sig6
    c_h2_sig = c_sig6 * sig_h2 * diff_scale

    # ---- quaternion renormalize backward (recompute q1r cheaply) ----------
    dqw = 0.5 * (-q[:, 1:2] * om[:, 0:1] - q[:, 2:3] * om[:, 1:2]
                 - q[:, 3:4] * om[:, 2:3])
    dqx = 0.5 * (q[:, 0:1] * om[:, 0:1] + q[:, 2:3] * om[:, 2:3]
                 - q[:, 3:4] * om[:, 1:2])
    dqy = 0.5 * (q[:, 0:1] * om[:, 1:2] - q[:, 1:2] * om[:, 2:3]
                 + q[:, 3:4] * om[:, 0:1])
    dqz = 0.5 * (q[:, 0:1] * om[:, 2:3] + q[:, 1:2] * om[:, 1:2]
                 - q[:, 2:3] * om[:, 0:1])
    dq = jnp.concatenate([dqw, dqx, dqy, dqz], axis=1)
    q1r = q + dt * dq
    nrm2 = jnp.sum(q1r * q1r, axis=1, keepdims=True) + 1e-12
    nrm = jnp.sqrt(nrm2)
    c_q1r = (cq1 / nrm
             - q1r * (jnp.sum(cq1 * q1r, axis=1, keepdims=True)
                      / (nrm2 * nrm)))

    # ---- EM-update backward ----------------------------------------------
    cp = cp1
    cv = cv1 + dt * cp1
    c_acc = dt * cv1
    com = com1
    c_domega = dt * com1
    cq = c_q1r
    c_dq = dt * c_q1r

    # dq = 0.5 q (x) [0, om]
    c_dqw, c_dqx = c_dq[:, 0:1], c_dq[:, 1:2]
    c_dqy, c_dqz = c_dq[:, 2:3], c_dq[:, 3:4]
    ox, oy, oz = om[:, 0:1], om[:, 1:2], om[:, 2:3]
    qw2, qx2, qy2, qz2 = q[:, 0:1], q[:, 1:2], q[:, 2:3], q[:, 3:4]
    cq = cq + 0.5 * jnp.concatenate(
        [
            c_dqx * ox + c_dqy * oy + c_dqz * oz,
            -c_dqw * ox - c_dqy * oz + c_dqz * oy,
            -c_dqw * oy + c_dqx * oz - c_dqz * ox,
            -c_dqw * oz - c_dqx * oy + c_dqy * ox,
        ],
        axis=1,
    )
    com = com + 0.5 * jnp.concatenate(
        [
            -c_dqw * qx2 + c_dqx * qw2 + c_dqy * qz2 - c_dqz * qy2,
            -c_dqw * qy2 - c_dqx * qz2 + c_dqy * qw2 + c_dqz * qx2,
            -c_dqw * qz2 + c_dqx * qy2 - c_dqy * qx2 + c_dqz * qw2,
        ],
        axis=1,
    )

    # domega = (tau + res36 - cross(om, I*om)) / I
    c_tau = c_domega / inertia
    c_res36 = c_domega / inertia
    c_crs = -c_domega / inertia
    Iom = inertia * om
    com = com + _cross(Iom, c_crs) + inertia * _cross(c_crs, om)

    # acc = G e_z + qrotate(q, f_body)/mass  — needs f_body (recompute from
    # stashed res and u: cheap elementwise + one tiny matmul)
    res03 = h2[:, 0:3]
    wrench = jnp.dot(u_b, mix_eff.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    thrust = wrench[:, 0:1]
    f_body = res03 - thrust * e_z
    c_rot = c_acc / veh_mass
    c_w_q, c_u3_q, c_fbody = _qrotate_bwd(q[:, 0:1], q[:, 1:4], f_body,
                                          c_rot)
    cq = cq + jnp.concatenate([c_w_q, c_u3_q], axis=1)

    c_res03 = c_fbody
    c_thrust = -c_fbody[:, 2:3]
    c_wrench = jnp.concatenate([c_thrust, c_tau], axis=1)      # (B, 4)
    c_u = jnp.dot(c_wrench, mix_eff, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)         # (B, n)

    # ---- trunk backward (transposed matmuls on stashed pre-activations) ---
    c_h2 = jnp.concatenate([c_res03, c_res36, c_h2_sig], axis=1)  # (B,12)
    tmm = lambda a, w: jax.lax.dot_general(
        a, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    c_h1 = tmm(c_h2, w2)                                       # (B, 64)
    s1 = jax.nn.sigmoid(h1p)
    c_h1p = c_h1 * (s1 + h1p * s1 * (1.0 - s1))                # swish'
    c_h0 = tmm(c_h1p, w1)
    s0 = jax.nn.sigmoid(h0p)
    c_h0p = c_h0 * (s0 + h0p * s0 * (1.0 - s0))
    c_feat = tmm(c_h0p, w0)                                    # (B, 9+n)

    c_vbody = c_feat[:, 0:3]
    com = com + c_feat[:, 3:6]
    c_gbody = c_feat[:, 6:9]
    c_u = c_u + c_feat[:, 9:]

    # v_body / g_body = qrotate(qc, ·) with qc = [qw, -qx, -qy, -qz]
    qcw, qcu = q[:, 0:1], -q[:, 1:4]
    c_w_v, c_u3_v, c_v = _qrotate_bwd(qcw, qcu, v, c_vbody)
    cv = cv + c_v
    c_w_g, c_u3_g, _ = _qrotate_bwd(qcw, qcu, e_z, c_gbody)
    c_qc_w = c_w_v + c_w_g
    c_qc_u = c_u3_v + c_u3_g
    cq = cq + jnp.concatenate([c_qc_w, -c_qc_u], axis=1)

    return cp, cv, cq, com, c_u


def control_cost(U2, u_prev, uref, disc_col, scal, slew_lo, slew_hi,
                 tsteps_col, has_slew_constr, n_u: Optional[int] = None):
    """Control-only cost terms on an (H, nZ) decision block (values).

    Pure elementwise/reduction math — used by the forward kernels in value
    form; its gradient is closed-form in the backward sweep. When the
    decision block carries proximal-slack columns (``nZ > n_u``), pass
    ``n_u``: the uerr/slew terms apply only to the control columns (slack
    targets have no effort or slew cost — their cost is the stage coupling
    inside :func:`make_step`).
    """
    if n_u is not None and U2.shape[1] > n_u:
        U2 = U2[:, 0:n_u]
        u_prev = u_prev[:, 0:n_u]
    uerr = scal[0, 2]
    slew_coeff = scal[0, 3]
    slew_c_coeff = scal[0, 4]
    du = U2 - uref
    j_u = uerr * jnp.sum(disc_col * du * du)
    if U2.shape[0] > 1:
        prev = jnp.concatenate([u_prev, U2[:-1, :]], axis=0)
    else:
        prev = u_prev  # H == 1: zero-size slice is not lowerable
    sl = U2 - prev
    j_slew = slew_coeff * jnp.sum(sl * sl)
    j = j_u + j_slew
    if has_slew_constr:
        rate = sl / tsteps_col
        viol = jnp.maximum(rate - slew_hi, 0.0) ** 2 + jnp.maximum(slew_lo - rate, 0.0) ** 2
        j = j + slew_c_coeff * jnp.sum(viol)
    return j


# --------------------------------------------------------------------------
# Sweep context: the refs/values a horizon sweep needs, wired by each kernel
# --------------------------------------------------------------------------

class SweepCtx(NamedTuple):
    """Ref wiring for the shared sweeps.

    Built inside a kernel body from that kernel's own consts layout. ``n``
    is the full decision width nZ (= n_u, or n_u + m slack columns in the
    proximal form); ``n_u`` the control width the closed-form gradients
    apply to.
    """

    step: Callable
    H: int
    n: int                 # decision width nZ
    n_u: int               # control columns (dynamics + closed-form grads)
    P: int
    noise_ref: Any         # (H, P, 13) VMEM ref
    xref_ref: Any          # (H+1, 1, 13) VMEM ref
    ts_s: Any              # (H, 1) SMEM ref — per-step dt scalar reads
    ds_s: Any              # (H, 1) SMEM ref — per-step discount reads
    W: Tuple               # step weights (see make_step)
    sc_vals: Optional[Tuple]
    uprev: Any             # (1, nZ) value
    UREF: Any              # (1, n_u) value
    DS: Any                # (H, 1) VMEM value (vector discounts)
    SC: Any                # (1, NSCAL) value
    SLO: Any               # (1, n_u) value
    SHI: Any               # (1, n_u) value
    TSV: Any               # (H, 1) VMEM value (vector dts)
    has_slew: bool
    chunk: int = 0         # particle chunk size; 0 = whole P at once
    # Manual-backward wiring (deterministic, unconstrained, unchunked
    # configs only — the flight path): a want_acts step variant + scratch
    # refs (h0p (H,B,64), h1p (H,B,64), h2 (H,B,12)) the forward sweep
    # stashes into and :func:`manual_bwd_step` consumes, plus the vehicle
    # mass the backward needs. None = traced-VJP reverse sweep.
    step_acts: Optional[Callable] = None
    acts_refs: Optional[Tuple] = None
    mass: float = 0.0


def _prox_pad(g_ctrl, n, n_u, f32):
    """Pad a (1, n_u) closed-form control gradient to the (1, n) decision
    row (slack columns get no control-term gradient)."""
    if n == n_u:
        return g_ctrl
    return jnp.concatenate([g_ctrl, jnp.zeros((1, n - n_u), f32)], axis=1)


def vg_sweep(ctx: SweepCtx, u_ref, g_ref, xs_ref, x0v):
    """Checkpointed forward + manual reverse sweep -> total cost (scalar).

    ``u_ref``: (H, 1, n) ref holding the iterate (input ref or scratch —
    fori bodies need dynamic per-step reads, which only refs support);
    ``g_ref``: (H, 1, n) ref the gradient is written into;
    ``xs_ref``: (H+1, Pc, 13) scratch for the stashed states (Pc = chunk
    size when chunking, else P);
    ``x0v``: (1, 13) initial-state value.

    The forward loop integrates and stashes the per-step states (the stash
    is write-only here — per-step read-back of just-written VMEM serializes
    poorly in Mosaic); the reverse loop re-derives each step's VJP by
    tracing ``jax.vjp`` of the single-step function (trace-time AD — the
    loop body is still compiled once), and the control-only cost terms get
    closed-form gradients.

    When ``ctx.chunk`` is set and P > chunk, the particle axis runs in
    chunks: fwd+bwd per chunk, gradients and costs averaged across chunks —
    lifts the P<=128 scoped-VMEM cap to arbitrary particle counts.
    """
    H, n, n_u, P = ctx.H, ctx.n, ctx.n_u, ctx.P
    step, noise_ref, xref_ref = ctx.step, ctx.noise_ref, ctx.xref_ref
    ts_s, ds_s, W, sc_vals = ctx.ts_s, ctx.ds_s, ctx.W, ctx.sc_vals
    f32 = jnp.float32
    res_mult = ctx.SC[0, 5]
    uerr = ctx.SC[0, 2]
    slew_coeff = ctx.SC[0, 3]
    slew_c_coeff = ctx.SC[0, 4]
    uprev_u = ctx.uprev[:, 0:n_u]

    n_chunks = 1
    Pc = P
    if ctx.chunk and P > ctx.chunk:
        assert P % ctx.chunk == 0, "P must divide by the chunk size"
        Pc = ctx.chunk
        n_chunks = P // Pc
    B = Pc

    manual = ctx.acts_refs is not None

    def fwd_chunk(c):
        """Forward sweep over one particle chunk -> (j_track, j_res)."""
        def fwd_body(t, carry):
            p_, v, q, om, jt, jr = carry
            u_b = jnp.broadcast_to(u_ref[t], (B, n))
            # Chunked noise is laid out chunk-major (n_chunks*H, Pc, 13) so
            # every read is a leading-dim page (mid-dim dynamic slices are
            # not lowerable).
            z = noise_ref[t] if n_chunks == 1 else noise_ref[c * H + t]
            r = xref_ref[t + 1]
            dt = ts_s[t, 0]
            d_t = ds_s[t, 0]
            if manual:
                (p1, v1, q1, om1), track, res2, acts = ctx.step_acts(
                    p_, v, q, om, u_b, z, r, dt, W, sc_vals)
                h0p_ref, h1p_ref, h2_ref = ctx.acts_refs
                h0p_ref[t], h1p_ref[t], h2_ref[t] = acts
            else:
                (p1, v1, q1, om1), track, res2 = step(p_, v, q, om, u_b, z,
                                                      r, dt, W, sc_vals)
            xs_ref[t + 1] = jnp.concatenate([p1, v1, q1, om1], axis=1)
            return (p1, v1, q1, om1,
                    jt + d_t * jnp.mean(track), jr + d_t * jnp.mean(res2))

        x0b = jnp.broadcast_to(x0v, (B, 13))
        xs_ref[0] = x0b
        out = jax.lax.fori_loop(
            0, H, fwd_body,
            (x0b[:, 0:3], x0b[:, 3:6], x0b[:, 6:10], x0b[:, 10:13],
             f32(0.0), f32(0.0)),
            unroll=_UNROLL,
        )
        return out[4], out[5]

    def bwd_chunk(c, write):
        """Reverse sweep over one chunk; ``write(t, g)`` stores the per-step
        decision gradient (sum over the chunk's particles / Pc)."""
        def bwd_body(s_i, ct):
            ct_p, ct_v, ct_q, ct_om = ct
            t = H - 1 - s_i
            st = xs_ref[t]
            p_, v, q, om = st[:, 0:3], st[:, 3:6], st[:, 6:10], st[:, 10:13]
            u_t = u_ref[t]                      # (1, n)
            u_b = jnp.broadcast_to(u_t, (B, n))
            z = noise_ref[t] if n_chunks == 1 else noise_ref[c * H + t]
            r = xref_ref[t + 1]
            dt = ts_s[t, 0]
            d_t = ds_s[t, 0]

            if manual:
                h0p_ref, h1p_ref, h2_ref = ctx.acts_refs
                g_p, g_v, g_q, g_om, g_u = manual_bwd_step(
                    st, u_b, (h0p_ref[t], h1p_ref[t], h2_ref[t]),
                    xs_ref[t + 1], (ct_p, ct_v, ct_q, ct_om), r, dt, d_t,
                    W, ctx.mass, res_mult)
            else:
                def f(p_a, v_a, q_a, om_a, u_a):
                    (p1, v1, q1, om1), track, res2 = step(
                        p_a, v_a, q_a, om_a, u_a, z, r, dt, W, sc_vals)
                    return p1, v1, q1, om1, jnp.mean(track), jnp.mean(res2)

                _, vjp_fn = jax.vjp(f, p_, v, q, om, u_b)
                g_p, g_v, g_q, g_om, g_u = vjp_fn(
                    (ct_p, ct_v, ct_q, ct_om, d_t, d_t * res_mult)
                )

            # control-term gradients (closed form):
            #   uerr:  2*uerr*d_t*(u_t - uref)
            #   slew:  2*c*(u_t - u_{t-1}) - 2*c*(u_{t+1} - u_t)   [masked]
            #   slew-rate box: one-sided quadratic derivative on rate_t and
            #   (negated) on rate_{t+1}
            u_t_u = u_t[:, 0:n_u]
            u_prev_t = jnp.where(
                t == 0, uprev_u, u_ref[jnp.maximum(t - 1, 0)][:, 0:n_u]
            )
            sl_t = u_t_u - u_prev_t
            g_ctrl = 2.0 * uerr * d_t * (u_t_u - ctx.UREF) + 2.0 * slew_coeff * sl_t
            u_next = u_ref[jnp.minimum(t + 1, H - 1)][:, 0:n_u]
            sl_n = jnp.where(t + 1 < H, u_next - u_t_u, jnp.zeros_like(u_t_u))
            g_ctrl = g_ctrl - 2.0 * slew_coeff * sl_n
            if ctx.has_slew:
                rate_t = sl_t / dt
                g_rate_t = (
                    2.0 * jnp.maximum(rate_t - ctx.SHI, 0.0)
                    - 2.0 * jnp.maximum(ctx.SLO - rate_t, 0.0)
                ) / dt
                dt_n = ts_s[jnp.minimum(t + 1, H - 1), 0]
                rate_n = sl_n / dt_n
                g_rate_n = (
                    2.0 * jnp.maximum(rate_n - ctx.SHI, 0.0)
                    - 2.0 * jnp.maximum(ctx.SLO - rate_n, 0.0)
                ) / dt_n
                g_ctrl = g_ctrl + slew_c_coeff * (
                    g_rate_t
                    - jnp.where(t + 1 < H, g_rate_n, jnp.zeros_like(g_rate_n))
                )
            g_ctrl = _prox_pad(g_ctrl, n, n_u, f32)

            write(t, jnp.sum(g_u, axis=0, keepdims=True), g_ctrl)
            return (g_p, g_v, g_q, g_om)

        zero3 = jnp.zeros((B, 3), f32)
        zero4 = jnp.zeros((B, 4), f32)
        jax.lax.fori_loop(0, H, bwd_body, (zero3, zero3, zero4, zero3),
                          unroll=_UNROLL)

    if n_chunks == 1:
        j_track, j_res = fwd_chunk(0)
        bwd_chunk(0, lambda t, g_u, g_ctrl: g_ref.__setitem__(t, g_u + g_ctrl))
    else:
        # Chunked: fwd+bwd per chunk inside one fori_loop; per-chunk VJP
        # gradients accumulate into g_ref (the closed-form control part is
        # chunk-independent and is added once, on the last chunk). The
        # rollout cost is 1/P * sum over particles = mean over chunk means.
        def chunk_body(c, acc):
            jt_acc, jr_acc = acc
            jt, jr = fwd_chunk(c)

            def write(t, g_u, g_ctrl):
                base = jnp.where(c == 0, jnp.zeros_like(g_u), g_ref[t])
                g_ref[t] = base + g_u / n_chunks + jnp.where(
                    c == n_chunks - 1, g_ctrl, jnp.zeros_like(g_ctrl)
                )

            bwd_chunk(c, write)
            return (jt_acc + jt / n_chunks, jr_acc + jr / n_chunks)

        j_track, j_res = jax.lax.fori_loop(
            0, n_chunks, chunk_body, (f32(0.0), f32(0.0))
        )

    u_all = u_ref[:, 0, :]                      # (H, n)
    j_ctrl = control_cost(u_all, ctx.uprev, ctx.UREF, ctx.DS, ctx.SC,
                          ctx.SLO, ctx.SHI, ctx.TSV, ctx.has_slew, n_u=n_u)
    return j_track + res_mult * j_res + j_ctrl


def candidate_rollout(ctx: SweepCtx, u_ref, K: int):
    """K candidates x P particles rolled out in one batched horizon loop.

    ``u_ref``: (H, K, n) ref (input ref or scratch). Returns the
    particle-averaged discounted rollout costs ``(j_track, j_res)``, each
    (K, 1). Control-only terms are caller-specific (the oracle's batch
    kernel sums them per candidate; the mega-kernel extracts them together
    with the Armijo bound pieces).

    With ``ctx.chunk`` set and P > chunk, the particle axis runs chunked
    (same batched body, Pc particles per pass) and costs average across
    chunks.
    """
    H, n, P = ctx.H, ctx.n, ctx.P
    step, noise_ref, xref_ref = ctx.step, ctx.noise_ref, ctx.xref_ref
    ts_s, ds_s, W, sc_vals = ctx.ts_s, ctx.ds_s, ctx.W, ctx.sc_vals
    f32 = jnp.float32

    n_chunks = 1
    Pc = P
    if ctx.chunk and P > ctx.chunk:
        assert P % ctx.chunk == 0, "P must divide by the chunk size"
        Pc = ctx.chunk
        n_chunks = P // Pc

    def run_chunk(c, x0v):
        B = K * Pc if Pc > 1 else K

        def body(t, carry):
            p_, v, q, om, jt, jr = carry
            u_k = u_ref[t]                      # (K, n)
            if Pc == 1:
                u_b = u_k
                z = noise_ref[t] if n_chunks == 1 else noise_ref[c * H + t]
            else:
                u_b = jnp.broadcast_to(u_k[None], (Pc, K, n)).reshape(B, n)
                zrow = (noise_ref[t] if n_chunks == 1
                        else noise_ref[c * H + t])
                z = jnp.broadcast_to(zrow[:, None, :], (Pc, K, 13)).reshape(B, 13)
            r = xref_ref[t + 1]
            dt = ts_s[t, 0]
            d_t = ds_s[t, 0]
            (p1, v1, q1, om1), track, res2 = step(p_, v, q, om, u_b, z, r,
                                                  dt, W, sc_vals)
            return (p1, v1, q1, om1, jt + d_t * track, jr + d_t * res2)

        pk = jnp.broadcast_to(x0v, (B, 13))
        out = jax.lax.fori_loop(
            0, H, body,
            (pk[:, 0:3], pk[:, 3:6], pk[:, 6:10], pk[:, 10:13],
             jnp.zeros((B, 1), f32), jnp.zeros((B, 1), f32)),
            unroll=_UNROLL,
        )
        j_track, j_res = out[4], out[5]
        if Pc > 1:
            # Per-candidate particle mean as a constant-mask matmul
            # (K,B)@(B,1): rows are laid out particle-major (i = p*K + k),
            # and a (B,1)->(Pc,K) reshape is not layout-safe in Mosaic
            # ("Invalid relayout: non-singleton dimension replicated...",
            # observed at Pc=128).
            row = jax.lax.broadcasted_iota(jnp.int32, (K, B), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (K, B), 1)
            maskT = ((col % K) == row).astype(j_track.dtype) / Pc
            mm = lambda m, v: jnp.dot(
                m, v, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            j_track = mm(maskT, j_track)       # (K, 1)
            j_res = mm(maskT, j_res)
        return j_track, j_res

    return run_chunk


def run_candidates(ctx: SweepCtx, u_ref, K: int, x0v):
    """Full candidate evaluation: chunk loop around :func:`candidate_rollout`.

    Returns particle-averaged ``(j_track, j_res)``, each (K, 1).
    """
    run_chunk = candidate_rollout(ctx, u_ref, K)
    P = ctx.P
    n_chunks = 1
    if ctx.chunk and P > ctx.chunk:
        n_chunks = P // ctx.chunk
    if n_chunks == 1:
        return run_chunk(0, x0v)

    def body(c, acc):
        jt_acc, jr_acc = acc
        jt, jr = run_chunk(c, x0v)
        return (jt_acc + jt / n_chunks, jr_acc + jr / n_chunks)

    K1 = (K, 1)
    f32 = jnp.float32
    return jax.lax.fori_loop(
        0, n_chunks, body, (jnp.zeros(K1, f32), jnp.zeros(K1, f32))
    )
