"""Fused Pallas TPU kernels for the MPC hot path (L2).

Why: the APG solve is op-issue-latency bound on TPU. One Euler-Maruyama
step is ~3 tiny matmuls + vector ops; under XLA each small matmul costs
~4us of issue latency (measured on v5e — 200 chained (1,64)x(64,64)
matmuls: 0.8 ms), so a 20-step rollout costs ~2.3 ms and a 200-iteration
solve ~1 s. These kernels fuse the ENTIRE rollout + cost (and its
gradient) into single Mosaic kernels: the whole horizon executes with no
inter-op scheduling overhead, weights and activations resident in VMEM.

The step math and both horizon sweeps (checkpointed value-and-grad,
batched candidate rollout) live in ``ops/pallas/bodies.py`` — one source
of truth shared with the whole-solve mega-kernel (``apg_kernel.py``).
This file contributes the oracle-level kernels: consts layout, pallas_call
plumbing, and the mean-trajectory kernel.

Compile-time design: horizon loops are ``fori_loop``s whose bodies are
compiled ONCE (a fully unrolled horizon made Mosaic compile time explode
— ~100 s for H=2, unusable at H=20). Per-step data (controls, references,
Brownian increments) is read from VMEM refs by dynamic leading-dim
indexing — inputs are laid out horizon-major ((H, K, n) controls,
(H+1, 1, 13) references, (H, P, 13) noise) so each per-step read is a
cleanly-tiled page. See ``bodies.py`` for the full list of measured
Mosaic lowering constraints.

Large Monte-Carlo batches (P > ~128) exceed the per-kernel scoped-VMEM
limit when swept whole; pass ``chunk`` (e.g. 128) to run the particle
axis in-kernel in chunks — costs and gradients are averaged as
mean-of-chunk-means (exact in reals when P % chunk == 0, but a different
float accumulation ORDER than the unchunked mean — parity vs unchunked
holds to ~1e-5 relative, see ``tests/test_pallas_kernels.py``).

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
from sde4mbrl_px4_tpu.ops.pallas.bodies import (
    NSCAL as _NSCAL,
    SweepCtx,
    control_cost as _control_cost,
    make_step as _make_step,
    run_candidates,
    vg_sweep,
)
from sde4mbrl_px4_tpu.solver.apg import CostOracle

__all__ = ["pallas_cost_oracle"]


def _spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def build_consts(model, params, cp, time_steps, x0, x_ref, u_prev, noise,
                 H, n, with_box=None, chunk=0):
    """Common consts block + spec list for the fused kernels.

    Layout (shared by this file and ``apg_kernel.py``):
    ``x0, x_ref, u_prev, noise, w0,b0,w1,b1,w2,b2, mix_eff, inertia,
    TS, DS, wstate, uref, slew_lo, slew_hi, scal [, lb, ub]
    [, state-constraint arrays] , ts_smem, ds_smem``.

    When the config carries proximal-slack state constraints
    (``slack_proximal: True``), the decision width is nZ = n_u + m and the
    constraint block is (penm, invm, selT); the penalty form ships
    (pen13, lo13, hi13, inv13) (reference schema
    ``iris_sitl_traj_mpc.yaml:16-29``).

    Returns (consts, const_specs, meta) where meta carries
    (has_slew, has_sc, prox, n_sc, nZ).
    """
    f32 = jnp.float32
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

    prox = getattr(cp, "slack_sel", None) is not None
    nZ = n + (int(cp.slack_sel.shape[0]) if prox else 0)

    # u_prev may arrive n_u-wide (engine history) even for prox configs —
    # pad the slack columns with zeros (they carry no slew/effort terms).
    u_prev = u_prev.reshape(1, -1).astype(f32)
    if u_prev.shape[1] < nZ:
        u_prev = jnp.concatenate(
            [u_prev, jnp.zeros((1, nZ - u_prev.shape[1]), f32)], axis=1
        )

    # Horizon-major noise pages; chunk-major when the particle axis runs in
    # chunks — row (c*H + t) holds chunk c's step-t draws, so per-step reads
    # stay leading-dim only (mid-dim dynamic slices are not lowerable).
    noise_hp = jnp.transpose(noise.astype(f32), (1, 0, 2))  # (H, P, 13)
    P_ = noise_hp.shape[1]
    if chunk and P_ > chunk:
        nch = P_ // chunk
        noise_hp = (
            noise_hp.reshape(H, nch, chunk, 13)
            .transpose(1, 0, 2, 3)
            .reshape(nch * H, chunk, 13)
        )
    consts = (
        x0.reshape(1, 13).astype(f32),
        x_ref.astype(f32).reshape(H + 1, 1, 13),        # horizon-major pages
        u_prev,                                         # (1, nZ)
        noise_hp,
        w0, b0, w1, b1, w2, b2, mix_eff, inertia,
        time_steps.reshape(H, 1).astype(f32),           # (H, 1) vector dts
        disc.reshape(H, 1),                             # (H, 1) vector discounts
        wstate, cp.uref.reshape(1, n), slew_lo, slew_hi, scal,
    )
    if with_box is not None:
        lb, ub = with_box
        consts = consts + (lb.reshape(1, nZ).astype(f32),
                           ub.reshape(1, nZ).astype(f32))
    has_sc = cp.state_pen13 is not None or prox
    if prox:
        m = int(cp.slack_sel.shape[0])
        consts = consts + (
            cp.slack_pen.reshape(1, m),
            cp.slack_inv_scale.reshape(1, m),
            jnp.transpose(cp.slack_sel).astype(f32),     # (13, m)
        )
        n_sc = 3
    elif has_sc:
        consts = consts + (
            (cp.constr_pen * cp.state_pen13).reshape(1, 13),
            cp.state_lo13.reshape(1, 13),
            cp.state_hi13.reshape(1, 13),
            cp.state_inv_scale13.reshape(1, 13),
        )
        n_sc = 4
    else:
        n_sc = 0
    # SMEM twins of tsteps/disc for dynamic per-step scalar reads inside
    # the fori_loop (dynamic_slice of VMEM *values* is not lowerable).
    consts = consts + (
        time_steps.reshape(H, 1).astype(f32),
        disc.reshape(H, 1),
    )
    _vmem, _smem = (pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM))
    const_specs = [_vmem] * (len(consts) - 2) + [_smem, _smem]
    return consts, const_specs, (has_slew, has_sc, prox, n_sc, nZ)


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
    chunk: int = 0,
) -> CostOracle:
    """Build a fused-kernel :class:`CostOracle` for one solve.

    ``maxls`` is UNUSED: ``value_batch`` sizes itself from its input's
    leading K dimension at trace time (that's how the same oracle serves
    both APG's maxls linesearch candidates and MPPI's K samples); the
    parameter is kept for call-site stability.

    Arguments may be traced (built inside the jitted ``mpc_fn``); shapes are
    static. ``noise`` is (P, H, 13); pass zeros for mean dynamics (or set
    ``deterministic=True`` to elide the Brownian term entirely). ``chunk``
    (0 = off) runs the particle axis in-kernel in chunks of that size —
    required for P beyond the scoped-VMEM cap (~128 unchunked).
    """
    H = int(time_steps.shape[0])
    n = model.n_u
    P = int(num_particles)
    f32 = jnp.float32
    if deterministic is None:
        deterministic = P <= 1
    if chunk and P % chunk != 0:
        raise ValueError(f"num_particles={P} must divide by chunk={chunk}")
    if chunk and P <= chunk:
        chunk = 0

    consts, const_specs, (has_slew, has_sc, prox, _N_SC, nZ) = build_consts(
        model, params, cp, time_steps, x0, x_ref, u_prev, noise, H, n,
        chunk=chunk,
    )
    n_const = len(consts)
    step = _make_step(float(model.vehicle.mass), has_noise=not deterministic,
                      has_state_constr=has_sc, n_u=n if prox else None)
    Pc = chunk if chunk else P

    def _unpack(const_refs):
        """Common ref unpack -> (ctx builder pieces). Shared by the three
        kernel bodies below."""
        (x0_ref, xref_ref, uprev_ref, noise_ref, *wrefs) = const_refs
        ts_s, ds_s = wrefs[-2], wrefs[-1]      # SMEM refs (dynamic reads)
        sc_vals = tuple(r[:] for r in wrefs[-2 - _N_SC:-2]) if _N_SC else None
        (W0, B0, W1, B1, W2, B2, MIX, IN, TS, DS, WS, UREF, SLO, SHI, SC) = (
            r[:] for r in wrefs[: -2 - _N_SC]
        )
        W = (W0, B0, W1, B1, W2, B2, MIX, IN, WS, SC[0, 1])
        ctx = SweepCtx(
            step=step, H=H, n=nZ, n_u=n, P=P,
            noise_ref=noise_ref, xref_ref=xref_ref, ts_s=ts_s, ds_s=ds_s,
            W=W, sc_vals=sc_vals, uprev=uprev_ref[:], UREF=UREF, DS=DS,
            SC=SC, SLO=SLO, SHI=SHI, TSV=TS, has_slew=has_slew, chunk=chunk,
        )
        return ctx, x0_ref

    # ------------------------------------------------------------------
    # value_batch kernel: K candidates x P particles
    # ------------------------------------------------------------------
    def _batch_kernel(u_ref, *refs):
        ctx, x0_ref = _unpack(refs[:n_const])
        out_ref = refs[n_const]
        Kb = u_ref.shape[1]
        j_track, j_res = run_candidates(ctx, u_ref, Kb, x0_ref[:])
        rollout_cost = j_track + ctx.SC[0, 5] * j_res  # (Kb, 1)

        # control-only terms per candidate (unrolled over the small K)
        ctrl = []
        for k in range(Kb):
            ctrl.append(
                _control_cost(u_ref[:, k, :], ctx.uprev, ctx.UREF, ctx.DS,
                              ctx.SC, ctx.SLO, ctx.SHI, ctx.TSV, has_slew,
                              n_u=n)
            )
        ctrl_col = jnp.concatenate([c.reshape(1, 1) for c in ctrl], axis=0)
        out_ref[:] = rollout_cost + ctrl_col

    def value_batch(U):  # (K', H, nZ) -> (K',)
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
        ctx, x0_ref = _unpack(refs[:n_const])
        val_ref = refs[n_const]
        grad_ref = refs[n_const + 1]
        xs_ref = refs[n_const + 2]              # (H+1, Pc, 13) scratch
        val = vg_sweep(ctx, u_ref, grad_ref, xs_ref, x0_ref[:])
        val_ref[:] = jnp.reshape(val, (1, 1))

    def value_and_grad(u):  # (H, nZ) -> (scalar, (H, nZ))
        val, grad = pl.pallas_call(
            _vg_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((1, 1), f32),
                jax.ShapeDtypeStruct((H, 1, nZ), f32),
            ),
            in_specs=[_spec()] + const_specs,
            out_specs=(_spec(), _spec()),
            scratch_shapes=[pltpu.VMEM((H + 1, Pc, 13), jnp.float32)],
            interpret=interpret,
        )(u.astype(f32).reshape(H, 1, nZ), *consts)
        return val[0, 0], grad.reshape(H, nZ)

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
        ctx, x0_ref = _unpack(refs[:n_const])
        out_ref = refs[n_const]                 # (H+1, 1, 13)
        x0v = x0_ref[:]
        out_ref[0] = x0v

        # State travels in the fori carry; the output ref is write-only
        # (reading an output back per-step serializes poorly in Mosaic).
        def body(t, carry):
            p_, v, q, om = carry
            u_b = u_ref[t][:, 0:n]              # control columns only
            z = ctx.noise_ref[0]                # unused (mean dynamics)
            r = ctx.xref_ref[t + 1]
            dt = ctx.ts_s[t, 0]
            (p1, v1, q1, om1), _, _ = step_mean(p_, v, q, om, u_b, z, r, dt,
                                                ctx.W)
            out_ref[t + 1] = jnp.concatenate([p1, v1, q1, om1], axis=1)
            return (p1, v1, q1, om1)

        jax.lax.fori_loop(
            0, H, body,
            (x0v[:, 0:3], x0v[:, 3:6], x0v[:, 6:10], x0v[:, 10:13]),
        )

    def trajectory(u):  # (H, nZ) -> (H+1, 13)
        out = pl.pallas_call(
            _traj_kernel,
            out_shape=jax.ShapeDtypeStruct((H + 1, 1, 13), f32),
            in_specs=[_spec()] + const_specs,
            out_specs=_spec(),
            interpret=interpret,
        )(u.astype(f32).reshape(H, 1, nZ), *consts)
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
