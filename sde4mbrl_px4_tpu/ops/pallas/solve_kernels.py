"""Fused Pallas TPU kernels for the MPC hot path (L2).

Why: the APG solve is op-issue-latency bound on TPU. One Euler-Maruyama
step is ~3 tiny matmuls + vector ops; under XLA each small matmul costs
~4us of issue latency (measured on v5e — 200 chained (1,64)x(64,64)
matmuls: 0.8 ms), so a 20-step rollout costs ~2.3 ms and a 200-iteration
solve ~1 s. These kernels fuse the ENTIRE rollout + cost (and its
gradient) into single Mosaic kernels so the whole horizon executes with no
inter-op scheduling overhead, with every weight and activation resident in
VMEM (total < 100 KB).

Two kernels per solver instance:

- ``value_batch``: all K linesearch candidates x P particles rolled out in
  one kernel, one batched matmul per layer per step -> (K,) costs;
- ``value_and_grad``: forward + reverse through the unrolled horizon in
  one kernel. The backward pass is obtained by tracing
  ``jax.value_and_grad`` *inside* the kernel body — AD happens at trace
  time, Mosaic compiles the resulting fused fwd+bwd program.

Semantics are bit-for-bit the same math as the XLA path
(``ops/rollout.rollout_sde`` + ``cost/cost.make_cost_fn``); equivalence is
enforced by tests (``tests/test_pallas_kernels.py``) running the kernels in
interpreter mode on CPU against the reference implementation.

The reference's corresponding hot loop is the jitted external solve invoked
at ``sde_control.py:420`` (SURVEY.md §3.3: "This entire block is what
becomes a fused TPU kernel").
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu only lowers on TPU; interpret mode needs no memory spaces.
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

from sde4mbrl_px4_tpu.cost.cost import CostParams
from sde4mbrl_px4_tpu.models.sde_model import NeuralSDE
from sde4mbrl_px4_tpu.solver.apg import CostOracle

__all__ = ["pallas_cost_oracle"]

_G = 9.81


# --------------------------------------------------------------------------
# Pure rollout+cost math on VALUES (runs inside the kernel, fully unrolled).
# --------------------------------------------------------------------------

def _cross(a, b):
    """(B,3) x (B,3) componentwise — jnp.cross lowers to a dim-0 concat
    Mosaic cannot lower ("offset mismatch on non-concat dimension"); this
    form concatenates along lanes only."""
    ax, ay, az = a[:, 0:1], a[:, 1:2], a[:, 2:3]
    bx, by, bz = b[:, 0:1], b[:, 1:2], b[:, 2:3]
    return jnp.concatenate(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=1
    )


def _qrotate(q, v):
    """Rotate (B,3) v by (B,4) q — expanded quaternion sandwich, 2D-safe."""
    w = q[:, 0:1]
    u = q[:, 1:4]
    t = _cross(u, v) + w * v
    return v + 2.0 * _cross(u, t)


def _qmul_omega(q, omega):
    """0.5 * q ⊗ [0, ω] for (B,4) q, (B,3) ω."""
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


def _rollout_costs(
    U,            # (H, K, n) candidate control sequences, HORIZON-MAJOR:
                  # per-step reads must slice the leading (untiled) dim —
                  # minor-dim slices carry sublane offsets Mosaic cannot
                  # feed into concats ("offset mismatch").
    x0p, x0v, x0q, x0w,   # initial state split: (1,3),(1,3),(1,4),(1,3)
    x_ref,        # (H+1, 1, 13) — leading-dim pages for clean per-step reads
    u_prev,       # (1, n)
    noise,        # (H, P, 13) standard-normal increments (zeros => mean dynamics)
    w0, b0, w1, b1, w2, b2,   # trunk weights; b* are (1, ·)
    mix_eff,      # (4, n) mixing * exp(log_gain)
    inertia,      # (1, 3)
    tsteps,       # (1, H)
    disc,         # (1, H) discount^k for k=1..H
    wstate,       # (1, 12) [perr(3), verr(3), qerr(3), werr(3)]
    uref,         # (1, n)
    slew_lo, slew_hi,  # (1, n) each (zeros when disabled)
    scal,         # (1, 6) [mass, diff_scale, uerr, u_slew_coeff, slew_c_coeff, res_mult]
    *,
    P: int,
    has_slew_constr: bool,
):
    """Exactly the math of rollout_sde + make_cost_fn, unrolled; returns (K,1)."""
    H, K, n = U.shape
    B = K * P
    f32 = U.dtype

    mass = scal[0, 0]
    diff_scale = scal[0, 1]
    uerr = scal[0, 2]
    slew_coeff = scal[0, 3]
    slew_c_coeff = scal[0, 4]
    res_mult = scal[0, 5]

    # State carried as SEPARATE (p, v, q, omega) arrays: Mosaic's layout
    # inference cannot re-concatenate lane-offset pieces into one (B, 13)
    # vector ("result/input offset mismatch"), and nothing consumes the
    # packed state anyway.
    p_ = jnp.broadcast_to(x0p, (B, 3)).astype(f32)
    v = jnp.broadcast_to(x0v, (B, 3)).astype(f32)
    q = jnp.broadcast_to(x0q, (B, 4)).astype(f32)
    omega = jnp.broadcast_to(x0w, (B, 3)).astype(f32)

    j_track = jnp.zeros((B, 1), f32)   # accumulated discounted tracking cost
    j_res = jnp.zeros((B, 1), f32)     # accumulated discounted sigma^2
    j_u = jnp.zeros((K, 1), f32)
    j_slew = jnp.zeros((K, 1), f32)
    j_slew_c = jnp.zeros((K, 1), f32)

    e_z = jnp.concatenate(
        [jnp.zeros((B, 2), f32), jnp.ones((B, 1), f32)], axis=1
    )
    up = jnp.broadcast_to(u_prev, (K, n)).astype(f32)

    for t in range(H):
        dt = tsteps[0, t]
        d_t = disc[0, t]
        u_k = U[t]                                # (K, n)
        if P == 1:
            u_b = u_k
        else:
            u_b = jnp.broadcast_to(u_k[None], (P, K, n)).reshape(B, n)

        # -- features: body-frame velocity, rates, gravity direction, u.
        qc = jnp.concatenate([q[:, 0:1], -q[:, 1:4]], axis=1)
        v_body = _qrotate(qc, v)
        g_body = _qrotate(qc, e_z)
        feat = jnp.concatenate([v_body, omega, g_body, u_b], axis=1)  # (B, 9+n)

        # -- trunk (3 matmuls) -> residual wrench + raw sigma.
        h = jnp.dot(feat, w0, preferred_element_type=jnp.float32) + b0
        h = h * jax.nn.sigmoid(h)  # swish
        h = jnp.dot(h, w1, preferred_element_type=jnp.float32) + b1
        h = h * jax.nn.sigmoid(h)
        h = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2
        res = h[:, 0:6]
        sig6 = jax.nn.softplus(h[:, 6:12]) * diff_scale

        # -- drift (physics prior + residual).
        wrench = jnp.dot(u_b, mix_eff.T, preferred_element_type=jnp.float32)  # (B,4)
        thrust = wrench[:, 0:1]
        tau = wrench[:, 1:4]
        f_body = res[:, 0:3] - thrust * e_z
        acc = _G * e_z + _qrotate(q, f_body) / mass
        Jw = inertia * omega
        domega = (tau + res[:, 3:6] - _cross(omega, Jw)) / inertia
        dq = _qmul_omega(q, omega)

        # -- EM update + quaternion renormalization.
        sd = jnp.sqrt(dt)
        z_t = noise[t]                            # (P, 13)
        z = jnp.broadcast_to(z_t[:, None, :], (P, K, 13)).reshape(B, 13) if P > 1 else z_t
        p_ = p_ + dt * v
        v = v + dt * acc + sd * sig6[:, 0:3] * z[:, 3:6]
        q1 = q + dt * dq
        omega = omega + dt * domega + sd * sig6[:, 3:6] * z[:, 10:13]
        q = q1 / jnp.sqrt(jnp.sum(q1 * q1, axis=1, keepdims=True) + 1e-12)

        # -- stage cost at x_{t+1} vs x_ref[t+1].
        r = x_ref[t + 1]                          # (1, 13)
        dp = p_ - r[:, 0:3]
        dv = v - r[:, 3:6]
        dw = omega - r[:, 10:13]
        # attitude error: vector part of q_ref^-1 ⊗ q, sign-corrected.
        rw, rx, ry, rz = r[0, 6], r[0, 7], r[0, 8], r[0, 9]
        qw_, qx_, qy_, qz_ = q[:, 0:1], q[:, 1:2], q[:, 2:3], q[:, 3:4]
        ew = rw * qw_ + rx * qx_ + ry * qy_ + rz * qz_
        ex = rw * qx_ - rx * qw_ - ry * qz_ + rz * qy_
        ey = rw * qy_ + rx * qz_ - ry * qw_ - rz * qx_
        ez = rw * qz_ - rx * qy_ + ry * qx_ - rz * qw_
        s = jnp.where(ew < 0, -1.0, 1.0)
        dqv = s * jnp.concatenate([ex, ey, ez], axis=1)

        stage = (
            jnp.sum(wstate[:, 0:3] * dp * dp, axis=1, keepdims=True)
            + jnp.sum(wstate[:, 3:6] * dv * dv, axis=1, keepdims=True)
            + jnp.sum(wstate[:, 6:9] * dqv * dqv, axis=1, keepdims=True)
            + jnp.sum(wstate[:, 9:12] * dw * dw, axis=1, keepdims=True)
        )
        j_track = j_track + d_t * stage
        j_res = j_res + d_t * jnp.sum(sig6 * sig6, axis=1, keepdims=True)

        # -- control terms (per candidate).
        du = u_k - uref
        j_u = j_u + d_t * jnp.sum(du * du, axis=1, keepdims=True)
        sl = u_k - up
        j_slew = j_slew + jnp.sum(sl * sl, axis=1, keepdims=True)
        if has_slew_constr:
            rate = sl / dt
            viol = jnp.maximum(rate - slew_hi, 0.0) ** 2 + jnp.maximum(slew_lo - rate, 0.0) ** 2
            j_slew_c = j_slew_c + jnp.sum(viol, axis=1, keepdims=True)
        up = u_k

    # mean over particles.
    if P > 1:
        j_track = jnp.mean(j_track.reshape(P, K), axis=0, keepdims=True).T  # (K,1)
        j_res = jnp.mean(j_res.reshape(P, K), axis=0, keepdims=True).T
    total = (
        j_track + uerr * j_u + slew_coeff * j_slew
        + slew_c_coeff * j_slew_c + res_mult * j_res
    )
    return total  # (K, 1)


# --------------------------------------------------------------------------
# Kernel wrappers
# --------------------------------------------------------------------------


def _spec():
    if _VMEM is None:
        return pl.BlockSpec()
    return pl.BlockSpec(memory_space=_VMEM)


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
) -> CostOracle:
    """Build a fused-kernel :class:`CostOracle` for one solve.

    All arguments may be traced values (called inside the jitted ``mpc_fn``);
    shapes/dtypes are static. ``noise`` is (P, H, 13) — pass zeros for the
    mean-dynamics configuration.
    """
    H = int(time_steps.shape[0])
    n = model.n_u
    P = int(num_particles)
    K = int(maxls)
    f32 = jnp.float32

    net = params["net"]
    w0, w1, w2 = net["w0"], net["w1"], net["w2"]
    b0 = net["b0"].reshape(1, -1)
    b1 = net["b1"].reshape(1, -1)
    b2 = net["b2"].reshape(1, -1)
    mix_eff = (
        jnp.asarray(model.vehicle.mixing, f32)
        * jnp.exp(params["motor"]["log_gain"])[:, None]
    )
    inertia = jnp.asarray(model.vehicle.inertia, f32).reshape(1, 3)

    disc = cp.discount ** jnp.arange(1, H + 1, dtype=f32)
    wstate = jnp.concatenate([cp.perr, cp.verr, cp.qerr, cp.werr]).reshape(1, 12)
    has_slew = cp.u_slew_constr is not None
    if has_slew:
        slew_lo = cp.u_slew_constr[:, 0].reshape(1, n)
        slew_hi = cp.u_slew_constr[:, 1].reshape(1, n)
    else:
        slew_lo = jnp.zeros((1, n), f32)
        slew_hi = jnp.zeros((1, n), f32)
    scal = jnp.stack(
        [
            jnp.float32(model.vehicle.mass),
            jnp.exp(params["diffusion_log_scale"]),
            cp.uerr,
            cp.u_slew_coeff,
            cp.u_slew_constr_coeff,
            cp.res_mult,
        ]
    ).reshape(1, 6)

    x0r = x0.reshape(1, 13).astype(f32)
    consts = (
        x0r[:, 0:3], x0r[:, 3:6], x0r[:, 6:10], x0r[:, 10:13],
        x_ref.astype(f32).reshape(H + 1, 1, 13),
        u_prev.reshape(1, n).astype(f32),
        jnp.transpose(noise.astype(f32), (1, 0, 2)),  # (H, P, 13)
        w0.astype(f32), b0.astype(f32),
        w1.astype(f32), b1.astype(f32),
        w2.astype(f32), b2.astype(f32),
        mix_eff, inertia,
        time_steps.reshape(1, H).astype(f32),
        disc.reshape(1, H),
        wstate, cp.uref.reshape(1, n), slew_lo, slew_hi, scal,
    )
    n_const = len(consts)

    rc = functools.partial(_rollout_costs, P=P, has_slew_constr=has_slew)

    # ---- batched value kernel --------------------------------------------
    def _batch_kernel(u_ref, *refs):
        const_vals = tuple(r[:] for r in refs[:n_const])
        out_ref = refs[n_const]
        out_ref[:] = rc(u_ref[:], *const_vals)

    def value_batch(U):  # (K', H, n) -> (K',)
        Kb = U.shape[0]
        out = pl.pallas_call(
            _batch_kernel,
            out_shape=jax.ShapeDtypeStruct((Kb, 1), f32),
            in_specs=[_spec()] * (1 + n_const),
            out_specs=_spec(),
            interpret=interpret,
        )(jnp.transpose(U.astype(f32), (1, 0, 2)), *consts)
        return out[:, 0]

    # ---- fused value+grad kernel -----------------------------------------
    def _vg_kernel(u_ref, *refs):
        const_vals = tuple(r[:] for r in refs[:n_const])
        val_ref, grad_ref = refs[n_const], refs[n_const + 1]

        def f(u):
            return rc(u[:, None, :], *const_vals)[0, 0]

        val, grad = jax.value_and_grad(f)(u_ref[:])
        val_ref[:] = val.reshape(1, 1)
        grad_ref[:] = grad

    def value_and_grad(u):  # (H, n) -> (scalar, (H, n))
        val, grad = pl.pallas_call(
            _vg_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((1, 1), f32),
                jax.ShapeDtypeStruct((H, n), f32),
            ),
            in_specs=[_spec()] * (1 + n_const),
            out_specs=(_spec(), _spec()),
            interpret=interpret,
        )(u.astype(f32), *consts)
        return val[0, 0], grad

    def value(u):
        return value_batch(u[None])[0]

    return CostOracle(value=value, value_batch=value_batch, value_and_grad=value_and_grad)
