"""Fused Pallas TPU kernels for the MPC hot path (L2).

Why: the APG solve is op-issue-latency bound on TPU. One Euler-Maruyama
step is ~3 tiny matmuls + vector ops; under XLA each small matmul costs
~4us of issue latency (measured on v5e — 200 chained (1,64)x(64,64)
matmuls: 0.8 ms), so a 20-step rollout costs ~2.3 ms and a 200-iteration
solve ~1 s. These kernels fuse the ENTIRE rollout + cost (and its
gradient) into single Mosaic kernels: the whole horizon executes with no
inter-op scheduling overhead, weights and activations resident in VMEM.

Compile-time design: the horizon loop is a ``fori_loop`` whose body is
compiled ONCE (a fully unrolled horizon made Mosaic compile time explode
— ~100 s for H=2, unusable at H=20). Consequences:

- per-step data (controls, references, Brownian increments) is read from
  VMEM refs by dynamic leading-dim indexing — inputs are laid out
  horizon-major ((H, K, n) controls, (H+1, 1, 13) references, (H, P, 13)
  noise) so each per-step read is a cleanly-tiled page. Minor-dim dynamic
  slices carry sublane offsets Mosaic cannot feed into concatenations
  ("result/input offset mismatch"), as do ``jnp.cross``/``jnp.stack``
  (dim-0 concats) — hence the hand-rolled lane-wise vector ops below;
- reverse-mode AD cannot cross ``fori_loop``, so ``value_and_grad`` is a
  manual checkpointed backward: the forward loop stashes the per-step
  states in a VMEM scratch, the reverse loop re-derives each step's VJP by
  tracing ``jax.vjp`` of the SINGLE-step function (trace-time AD — the
  loop body is still compiled once), and the control-only cost terms
  (uerr / slew / slew-rate constraint) get closed-form gradients.

Semantics are the same math as the XLA path (``ops/rollout.rollout_sde`` +
``cost/cost.make_cost_fn``); equivalence is enforced by
``tests/test_pallas_kernels.py`` running these kernels in interpreter mode
against the XLA implementation (values, batched values, gradients,
multi-particle paths, and a full solve).

The reference's corresponding hot loop is the jitted external solve invoked
at ``sde_control.py:420`` (SURVEY.md §3.3: "This entire block is what
becomes a fused TPU kernel").
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sde4mbrl_px4_tpu.cost.cost import CostParams
from sde4mbrl_px4_tpu.models.sde_model import NeuralSDE
from sde4mbrl_px4_tpu.solver.apg import CostOracle

__all__ = ["pallas_cost_oracle"]

_G = 9.81
_NSCAL = 6  # [mass, diff_scale, uerr, u_slew_coeff, slew_c_coeff, res_mult]


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
# Single EM step + stage cost, on values (the unit both loops build on)
# --------------------------------------------------------------------------

def _make_step(veh_mass: float, has_noise: bool, has_state_constr: bool = False):
    """Returns step(p, v, q, om, u_b, z, r, dt, W, sc) ->
    ((p', v', q', om'), track (B,1), res2 (B,1))
    where W = (w0,b0,w1,b1,w2,b2, mix_eff, inertia, wstate, diff_scale).

    ``sc``: when ``has_state_constr``, a tuple of four (1,13) arrays
    (pen13 incl. the global constr_pen multiplier, lo13, hi13, inv13) —
    the soft state-box penalty (reference ``state_constr`` schema,
    ``iris_sitl_traj_mpc.yaml:16-29``). They are kernel INPUTS (Mosaic
    forbids captured array constants).
    """

    def step(p_, v, q, omega, u_b, z, r, dt, W, sc=None):
        w0, b0, w1, b1, w2, b2, mix_eff, inertia, wstate, diff_scale = W
        B = p_.shape[0]
        f32 = p_.dtype
        e_z = jnp.concatenate(
            [jnp.zeros((B, 2), f32), jnp.ones((B, 1), f32)], axis=1
        )

        # features: body-frame velocity, rates, gravity direction, motors
        qc = jnp.concatenate([q[:, 0:1], -q[:, 1:4]], axis=1)
        v_body = _qrotate(qc, v)
        g_body = _qrotate(qc, e_z)
        feat = jnp.concatenate([v_body, omega, g_body, u_b], axis=1)

        # trunk (3 matmuls) -> residual wrench + raw sigma
        h = jnp.dot(feat, w0, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST) + b0
        h = h * jax.nn.sigmoid(h)
        h = jnp.dot(h, w1, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST) + b1
        h = h * jax.nn.sigmoid(h)
        h = jnp.dot(h, w2, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST) + b2
        res = h[:, 0:6]
        sig6 = jax.nn.softplus(h[:, 6:12]) * diff_scale

        # drift: physics prior + residual
        wrench = jnp.dot(u_b, mix_eff.T, preferred_element_type=jnp.float32,
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
        if has_state_constr:
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
        return (p1, v1, q1, om1), track, res2

    return step


def _control_cost(U2, u_prev, uref, disc_col, scal, slew_lo, slew_hi,
                  tsteps_col, has_slew_constr):
    """Control-only cost terms on an (H, n) control block (values).

    Pure elementwise/reduction math — used by the forward kernels in value
    form; its gradient is closed-form in the backward kernel.
    """
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
# Oracle factory
# --------------------------------------------------------------------------

def _spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def pallas_cost_oracle(
    model: NeuralSDE,
    params: Dict[str, Any],
    cp: CostParams,
    time_steps: jax.Array,
    x0: jax.Array,
    x_ref: jax.Array,
    u_prev: jax.Array,
    noise: jax.Array,
    num_particles: int,
    maxls: int,
    interpret: bool = False,
    deterministic: bool | None = None,
) -> CostOracle:
    """Build a fused-kernel :class:`CostOracle` for one solve.

    Arguments may be traced (built inside the jitted ``mpc_fn``); shapes are
    static. ``noise`` is (P, H, 13); pass zeros for mean dynamics (or set
    ``deterministic=True`` to elide the Brownian term entirely).
    """
    H = int(time_steps.shape[0])
    n = model.n_u
    P = int(num_particles)
    f32 = jnp.float32
    if deterministic is None:
        deterministic = P <= 1

    net = params["net"]
    w0, w1, w2 = net["w0"].astype(f32), net["w1"].astype(f32), net["w2"].astype(f32)
    b0 = net["b0"].reshape(1, -1).astype(f32)
    b1 = net["b1"].reshape(1, -1).astype(f32)
    b2 = net["b2"].reshape(1, -1).astype(f32)
    mix_eff = (
        jnp.asarray(model.vehicle.mixing, f32)
        * jnp.exp(params["motor"]["log_gain"])[:, None]
    )
    inertia = jnp.asarray(model.vehicle.inertia, f32).reshape(1, 3)

    disc = cp.discount ** jnp.arange(1, H + 1, dtype=f32)
    wstate = jnp.concatenate([cp.perr, cp.verr, cp.qerr, cp.werr]).reshape(1, 12)
    has_slew = cp.u_slew_constr is not None
    slew_lo = (cp.u_slew_constr[:, 0].reshape(1, n) if has_slew
               else jnp.zeros((1, n), f32))
    slew_hi = (cp.u_slew_constr[:, 1].reshape(1, n) if has_slew
               else jnp.zeros((1, n), f32))
    scal = jnp.stack(
        [
            jnp.float32(model.vehicle.mass),
            jnp.exp(params["diffusion_log_scale"]),
            cp.uerr,
            cp.u_slew_coeff,
            cp.u_slew_constr_coeff,
            cp.res_mult,
        ]
    ).reshape(1, _NSCAL)

    x0r = x0.reshape(1, 13).astype(f32)
    # Horizon-major layouts: per-step reads slice the leading (page) dim.
    consts = (
        x0r,                                            # (1, 13)
        x_ref.astype(f32).reshape(H + 1, 1, 13),        # (H+1, 1, 13)
        u_prev.reshape(1, n).astype(f32),               # (1, n)
        jnp.transpose(noise.astype(f32), (1, 0, 2)),    # (H, P, 13)
        w0, b0, w1, b1, w2, b2, mix_eff, inertia,
        time_steps.reshape(H, 1).astype(f32),           # (H, 1)
        disc.reshape(H, 1),                             # (H, 1)
        wstate, cp.uref.reshape(1, n), slew_lo, slew_hi, scal,
    )
    has_sc = cp.state_pen13 is not None
    if has_sc:
        consts = consts + (
            (cp.constr_pen * cp.state_pen13).reshape(1, 13),
            cp.state_lo13.reshape(1, 13),
            cp.state_hi13.reshape(1, 13),
            cp.state_inv_scale13.reshape(1, 13),
        )
    # SMEM twins of tsteps/disc for dynamic per-step scalar reads inside
    # the fori_loop (dynamic_slice of VMEM *values* is not lowerable).
    consts = consts + (
        time_steps.reshape(H, 1).astype(f32),
        disc.reshape(H, 1),
    )
    n_const = len(consts)
    _vmem, _smem = (pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM))
    const_specs = [_vmem] * (n_const - 2) + [_smem, _smem]
    step = _make_step(float(model.vehicle.mass), has_noise=not deterministic,
                      has_state_constr=has_sc)
    _N_SC = 4 if has_sc else 0

    # ------------------------------------------------------------------
    # value_batch kernel: K candidates x P particles, fori_loop over H
    # ------------------------------------------------------------------
    def _batch_kernel(u_ref, *refs):
        const_refs = refs[:n_const]
        out_ref = refs[n_const]
        (x0_ref, xref_ref, uprev_ref, noise_ref, *wrefs) = const_refs
        ts_s, ds_s = wrefs[-2], wrefs[-1]      # SMEM refs (dynamic reads)
        sc_vals = tuple(r[:] for r in wrefs[-2 - _N_SC:-2]) if _N_SC else None
        (W0, B0, W1, B1, W2, B2, MIX, IN, TS, DS, WS, UREF, SLO, SHI, SC) = (
            r[:] for r in wrefs[: -2 - _N_SC]
        )
        Kb = u_ref.shape[1]
        B = Kb * P
        W = (W0, B0, W1, B1, W2, B2, MIX, IN, WS, SC[0, 1])

        x0v = x0_ref[:]
        p0 = jnp.broadcast_to(x0v[:, 0:3], (B, 3))
        v0 = jnp.broadcast_to(x0v[:, 3:6], (B, 3))
        q0 = jnp.broadcast_to(x0v[:, 6:10], (B, 4))
        om0 = jnp.broadcast_to(x0v[:, 10:13], (B, 3))

        def body(t, carry):
            p_, v, q, om, jt, jr = carry
            u_k = u_ref[t]                      # (Kb, n)
            if P == 1:
                u_b = u_k
                z = noise_ref[t]                # (1, 13)
            else:
                u_b = jnp.broadcast_to(u_k[None], (P, Kb, n)).reshape(B, n)
                z = jnp.broadcast_to(
                    noise_ref[t][:, None, :], (P, Kb, 13)
                ).reshape(B, 13)
            r = xref_ref[t + 1]
            dt = ts_s[t, 0]
            d_t = ds_s[t, 0]
            (p1, v1, q1, om1), track, res2 = step(p_, v, q, om, u_b, z, r, dt, W, sc_vals)
            return (p1, v1, q1, om1, jt + d_t * track, jr + d_t * res2)

        f32_ = x0v.dtype
        init = (p0, v0, q0, om0, jnp.zeros((B, 1), f32_), jnp.zeros((B, 1), f32_))
        out = jax.lax.fori_loop(0, H, body, init)
        j_track, j_res = out[4], out[5]

        if P > 1:
            j_track = jnp.mean(j_track.reshape(P, Kb), axis=0, keepdims=True).T
            j_res = jnp.mean(j_res.reshape(P, Kb), axis=0, keepdims=True).T
        rollout_cost = j_track + SC[0, 5] * j_res  # (Kb, 1)

        # control-only terms per candidate (unrolled over the small K)
        uprev = uprev_ref[:]
        ctrl = []
        for k in range(Kb):
            ctrl.append(
                _control_cost(u_ref[:, k, :], uprev, UREF, DS, SC, SLO, SHI,
                              TS, has_slew)
            )
        ctrl_col = jnp.concatenate([c.reshape(1, 1) for c in ctrl], axis=0)
        out_ref[:] = rollout_cost + ctrl_col

    def value_batch(U):  # (K', H, n) -> (K',)
        Kb = U.shape[0]
        out = pl.pallas_call(
            _batch_kernel,
            out_shape=jax.ShapeDtypeStruct((Kb, 1), f32),
            in_specs=[_spec()] + const_specs,
            out_specs=_spec(),
            interpret=interpret,
        )(jnp.transpose(U.astype(f32), (1, 0, 2)), *consts)
        return out[:, 0]

    # ------------------------------------------------------------------
    # value_and_grad kernel: checkpointed forward + manual reverse sweep
    # ------------------------------------------------------------------
    def _vg_kernel(u_ref, *refs):
        const_refs = refs[:n_const]
        val_ref = refs[n_const]
        grad_ref = refs[n_const + 1]
        xs_ref = refs[n_const + 2]              # (H+1, P, 13) scratch
        (x0_ref, xref_ref, uprev_ref, noise_ref, *wrefs) = const_refs
        ts_s, ds_s = wrefs[-2], wrefs[-1]      # SMEM refs (dynamic reads)
        sc_vals = tuple(r[:] for r in wrefs[-2 - _N_SC:-2]) if _N_SC else None
        (W0, B0, W1, B1, W2, B2, MIX, IN, TS, DS, WS, UREF, SLO, SHI, SC) = (
            r[:] for r in wrefs[: -2 - _N_SC]
        )
        B = P
        W = (W0, B0, W1, B1, W2, B2, MIX, IN, WS, SC[0, 1])

        x0v = x0_ref[:]
        xs_ref[0] = jnp.broadcast_to(x0v, (B, 13))

        # ---- forward sweep: integrate + stash states, accumulate cost.
        # State travels in the carry; the stash is write-only here (the
        # reverse sweep reads it) — per-step read-back of just-written VMEM
        # serializes poorly in Mosaic.
        def fwd_body(t, carry):
            p_, v, q, om, jt, jr = carry
            u_b = jnp.broadcast_to(u_ref[t], (B, n))
            z = noise_ref[t]
            r = xref_ref[t + 1]
            dt = ts_s[t, 0]
            d_t = ds_s[t, 0]
            (p1, v1, q1, om1), track, res2 = step(p_, v, q, om, u_b, z, r, dt, W, sc_vals)
            xs_ref[t + 1] = jnp.concatenate([p1, v1, q1, om1], axis=1)
            return (p1, v1, q1, om1,
                    jt + d_t * jnp.mean(track), jr + d_t * jnp.mean(res2))

        x0b = jnp.broadcast_to(x0v, (B, 13))
        out = jax.lax.fori_loop(
            0, H, fwd_body,
            (x0b[:, 0:3], x0b[:, 3:6], x0b[:, 6:10], x0b[:, 10:13],
             jnp.float32(0.0), jnp.float32(0.0)),
        )
        j_track, j_res = out[4], out[5]

        uprev = uprev_ref[:]
        u_all = u_ref[:, 0, :]                  # (H, n)
        j_ctrl = _control_cost(u_all, uprev, UREF, DS, SC, SLO, SHI, TS, has_slew)
        val_ref[:] = (j_track + SC[0, 5] * j_res + j_ctrl).reshape(1, 1)

        # ---- reverse sweep: per-step VJP (traced once) + closed-form
        #      control-term gradients ----
        uerr = SC[0, 2]
        slew_coeff = SC[0, 3]
        slew_c_coeff = SC[0, 4]
        res_mult = SC[0, 5]

        def bwd_body(s_i, ct):
            ct_p, ct_v, ct_q, ct_om = ct
            t = H - 1 - s_i
            st = xs_ref[t]
            p_, v, q, om = st[:, 0:3], st[:, 3:6], st[:, 6:10], st[:, 10:13]
            u_t = u_ref[t]                      # (1, n)
            u_b = jnp.broadcast_to(u_t, (B, n))
            z = noise_ref[t]
            r = xref_ref[t + 1]
            dt = ts_s[t, 0]
            d_t = ds_s[t, 0]

            def f(p_a, v_a, q_a, om_a, u_a):
                (p1, v1, q1, om1), track, res2 = step(p_a, v_a, q_a, om_a,
                                                      u_a, z, r, dt, W, sc_vals)
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
            u_prev_t = jnp.where(t == 0, uprev, u_ref[jnp.maximum(t - 1, 0)])
            sl_t = u_t - u_prev_t
            g_ctrl = 2.0 * uerr * d_t * (u_t - UREF) + 2.0 * slew_coeff * sl_t
            u_next = u_ref[jnp.minimum(t + 1, H - 1)]
            sl_n = jnp.where(t + 1 < H, u_next - u_t, jnp.zeros_like(u_t))
            g_ctrl = g_ctrl - 2.0 * slew_coeff * sl_n
            if has_slew:
                rate_t = sl_t / dt
                g_rate_t = (
                    2.0 * jnp.maximum(rate_t - SHI, 0.0)
                    - 2.0 * jnp.maximum(SLO - rate_t, 0.0)
                ) / dt
                dt_n = ts_s[jnp.minimum(t + 1, H - 1), 0]
                rate_n = sl_n / dt_n
                g_rate_n = (
                    2.0 * jnp.maximum(rate_n - SHI, 0.0)
                    - 2.0 * jnp.maximum(SLO - rate_n, 0.0)
                ) / dt_n
                g_ctrl = g_ctrl + slew_c_coeff * (
                    g_rate_t
                    - jnp.where(t + 1 < H, g_rate_n, jnp.zeros_like(g_rate_n))
                )

            grad_ref[t] = jnp.sum(g_u, axis=0, keepdims=True) + g_ctrl
            return (g_p, g_v, g_q, g_om)

        zero3 = jnp.zeros((B, 3), f32)
        zero4 = jnp.zeros((B, 4), f32)
        jax.lax.fori_loop(0, H, bwd_body, (zero3, zero3, zero4, zero3))

    def value_and_grad(u):  # (H, n) -> (scalar, (H, n))
        val, grad = pl.pallas_call(
            _vg_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((1, 1), f32),
                jax.ShapeDtypeStruct((H, 1, n), f32),
            ),
            in_specs=[_spec()] + const_specs,
            out_specs=(_spec(), _spec()),
            scratch_shapes=[pltpu.VMEM((H + 1, P, 13), jnp.float32)],
            interpret=interpret,
        )(u.astype(f32).reshape(H, 1, n), *consts)
        return val[0, 0], grad.reshape(H, n)

    def value(u):
        return value_batch(u[None])[0]

    # ------------------------------------------------------------------
    # mean-trajectory kernel: x_evol (H+1, 13) for the applied plan — the
    # predicted body rates feed the FCU fallback channel
    # (reference sde_control.py:432). Mean dynamics (no Brownian term),
    # matching ops/rollout.rollout_mean.
    # ------------------------------------------------------------------
    step_mean = _make_step(float(model.vehicle.mass), has_noise=False,
                           has_state_constr=False)

    def _traj_kernel(u_ref, *refs):
        const_refs = refs[:n_const]
        out_ref = refs[n_const]                 # (H+1, 1, 13)
        (x0_ref, xref_ref, uprev_ref, noise_ref, *wrefs) = const_refs
        ts_s, ds_s = wrefs[-2], wrefs[-1]
        (W0, B0, W1, B1, W2, B2, MIX, IN, TS, DS, WS, UREF, SLO, SHI, SC) = (
            r[:] for r in wrefs[: -2 - _N_SC]
        )
        W = (W0, B0, W1, B1, W2, B2, MIX, IN, WS, SC[0, 1])
        x0v = x0_ref[:]
        out_ref[0] = x0v

        # State travels in the fori carry; the output ref is write-only
        # (reading an output back per-step serializes poorly in Mosaic).
        def body(t, carry):
            p_, v, q, om = carry
            u_b = u_ref[t]
            z = noise_ref[0]                    # unused (mean dynamics)
            r = xref_ref[t + 1]
            dt = ts_s[t, 0]
            (p1, v1, q1, om1), _, _ = step_mean(p_, v, q, om, u_b, z, r, dt, W)
            out_ref[t + 1] = jnp.concatenate([p1, v1, q1, om1], axis=1)
            return (p1, v1, q1, om1)

        jax.lax.fori_loop(
            0, H, body,
            (x0v[:, 0:3], x0v[:, 3:6], x0v[:, 6:10], x0v[:, 10:13]),
        )

    def trajectory(u):  # (H, n) -> (H+1, 13)
        out = pl.pallas_call(
            _traj_kernel,
            out_shape=jax.ShapeDtypeStruct((H + 1, 1, 13), f32),
            in_specs=[_spec()] + const_specs,
            out_specs=_spec(),
            interpret=interpret,
        )(u.astype(f32).reshape(H, 1, n), *consts)
        return out[:, 0, :]

    return _OracleWithTraj(value, value_batch, value_and_grad, trajectory)


class _OracleWithTraj(CostOracle):
    """CostOracle + fused mean-trajectory evaluation (x_evol)."""

    def __new__(cls, value, value_batch, value_and_grad, trajectory):
        self = super().__new__(cls, value, value_batch, value_and_grad)
        self._trajectory = trajectory
        return self

    @property
    def trajectory(self):
        return self._trajectory
