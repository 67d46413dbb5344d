"""Whole-solve APG mega-kernel (L4 x L2 fusion).

The entire receding-horizon solve — up to ``max_iter`` APG iterations, each
with a gradient evaluation (checkpointed forward + reverse sweeps over the
horizon) and a vectorized Armijo linesearch over ``maxls`` candidates —
executes as ONE Mosaic kernel: zero XLA-op or kernel-launch overhead
between iterations, early exit via an on-chip ``while_loop``, all state in
VMEM/registers. This is the literal realization of SURVEY.md §3.3: "This
entire block is what becomes a fused TPU kernel."

Semantics mirror ``solver/apg.py::apg_solve`` with ``vector_linesearch``
(the production configuration) exactly:

- FISTA-bound Armijo acceptance tightened by ``coef``; candidates
  ``t0 * decrease_factor**k``, first (largest) accepted wins; on total
  failure stay put and carry ``t0 * df**maxls`` to the next iteration;
- Nesterov momentum ``max(k/(k+3), beta_init)`` (or constant
  ``moment_scale``) with adaptive restart on failure/cost increase;
- atol/rtol stopping on accepted steps + ``max_no_improvement_iter``
  stagnation; identical ``APGState`` stats fields.

The step math and both horizon sweeps are shared with the oracle kernels
through ``ops/pallas/bodies.py`` (single source of truth; this file owns
only the APG loop, the Armijo accept logic and the consts/scratch
plumbing). Mosaic-dictated construction (see ``bodies.py`` /
``solve_kernels.py`` for the measured constraints): per-step data read
from horizon-major refs; the candidate block lives in a VMEM scratch so
the rollout can page through it; per-candidate scalars extracted by
masked reduction (no minor-dim slicing); the accepted iterate is
RECOMPUTED from the accepted scalar stepsize (dynamic minor-dim gathers
are not lowerable).

Equivalence with the XLA solver is enforced by
``tests/test_apg_kernel.py`` in interpreter mode.

Large particle counts: pass ``chunk`` to sweep the Monte-Carlo axis in
in-kernel chunks (lifts the P<=128 scoped-VMEM cap; see ``bodies.py``).
Requires ``use_linesearch`` configs (the reference always uses the
linesearch block).
"""
from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sde4mbrl_px4_tpu.cost.cost import CostParams
from sde4mbrl_px4_tpu.models.sde_model import NeuralSDE
from sde4mbrl_px4_tpu.ops.pallas.bodies import (
    SweepCtx,
    make_step as _make_step,
    run_candidates,
    vg_sweep,
)
from sde4mbrl_px4_tpu.ops.pallas.solve_kernels import build_consts
from sde4mbrl_px4_tpu.solver.apg import APGConfig, APGState

__all__ = ["pallas_apg_solve"]


def pallas_apg_solve(
    model: NeuralSDE,
    params: Dict[str, Any],
    cp: CostParams,
    apg: APGConfig,
    time_steps: jax.Array,
    x0: jax.Array,
    x_ref: jax.Array,
    u_prev: jax.Array,
    noise: jax.Array,          # (P, H, 13)
    num_particles: int,
    lb: jax.Array,
    ub: jax.Array,
    u_init: jax.Array,         # (H, nZ) warm start
    interpret: bool = False,
    deterministic: bool | None = None,
    chunk: int = 0,
    t_init: jax.Array | None = None,
    return_traj: bool = False,
    precond: jax.Array | None = None,
    iter_budget: jax.Array | None = None,
) -> APGState:
    """One fused APG solve -> APGState (yk = best iterate, unshifted).

    ``return_traj=True`` (deterministic, unchunked solves only) additionally
    returns the (H+1, 13) mean state trajectory of the best iterate —
    recovered for free from the exit gradient sweep's stashed forward states,
    eliminating the separate mean-trajectory kernel launch the engine would
    otherwise pay per solve. Returns ``(APGState, x_evol)``.

    ``t_init`` carries the previous solve's accepted linesearch stepsize
    (``APGState.stepsize``) so warm receding-horizon solves skip the
    ``init_stepsize``->workable ramp — semantics identical to
    ``solver/apg.py::apg_solve(t_init=...)`` (non-positive falls back to
    ``init_stepsize``).

    ``precond``: optional (H, nZ) diagonal metric — step
    ``proj(y - t*D*g)``, Armijo quadratic ``<d, D^{-1}d>/(2t)`` — and
    ``reset_option: bb`` (Barzilai–Borwein trial stepsize from the secant
    pair at consecutive extrapolated points) mirror
    ``solver/apg.py::apg_solve`` exactly; see the curvature analysis there
    and in ``tools/curvature_probe.py``.

    ``iter_budget``: optional TRACED iteration cap (scalar int; an SMEM
    scalar inside the kernel) — the deadline-aware hook, semantics
    identical to ``solver/apg.py::apg_solve(iter_budget=...)``: the APG
    while loop runs at most ``min(max_iter, max(iter_budget, 1))``
    iterations and the warm-start shift carries partial progress to the
    next solve."""
    H = int(time_steps.shape[0])
    n = model.n_u
    P = int(num_particles)
    K = int(apg.maxls)
    f32 = jnp.float32
    if deterministic is None:
        deterministic = P <= 1
    assert apg.use_linesearch, "mega-kernel requires the linesearch block"
    if chunk and P % chunk != 0:
        raise ValueError(f"num_particles={P} must divide by chunk={chunk}")
    if chunk and P <= chunk:
        chunk = 0

    consts, const_specs, (has_slew, has_sc, prox, _N_SC, nZ) = build_consts(
        model, params, cp, time_steps, x0, x_ref, u_prev, noise, H, n,
        with_box=(lb, ub), chunk=chunk,
    )
    n_const = len(consts)
    step1 = _make_step(float(model.vehicle.mass), has_noise=not deterministic,
                       has_state_constr=has_sc, n_u=n if prox else None)
    Pc = chunk if chunk else P
    # Hand-derived reverse sweep (bodies.manual_bwd_step): the traced
    # jax.vjp re-runs the forward inside every reverse step (its residuals
    # keep it alive); the manual path stashes the trunk pre-activations in
    # the forward sweep instead. Flight-configuration scope only; opt out
    # with SDE4MBRL_MANUAL_BWD=0 for A/B.
    use_manual = (deterministic and not has_sc and not prox and not chunk
                  and os.environ.get("SDE4MBRL_MANUAL_BWD", "1")
                  not in ("0", "false", "False"))
    step_acts = (_make_step(float(model.vehicle.mass), has_noise=False,
                            want_acts=True) if use_manual else None)
    _vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    # static Armijo schedule scalars
    DF = float(apg.decrease_factor)
    INC = float(apg.increase_factor)
    COEF = float(apg.coef)
    TMAX = float(apg.max_stepsize)
    BB = apg.reset_option == "bb"
    CONSERVATIVE = apg.reset_option not in ("increase", "bb")
    MOM_RESTART = bool(apg.momentum_restart)
    HAS_PRE = precond is not None
    HAS_BUDGET = iter_budget is not None
    if return_traj and not (deterministic and Pc == 1 and not chunk):
        raise ValueError(
            "return_traj requires a deterministic unchunked P=1 solve (the "
            "stashed forward states equal the mean trajectory only there)")
    n_out = 3 if return_traj else 2

    def _kernel(u0_ref, t0_ref, *refs):
        if HAS_BUDGET:
            ib_ref, refs = refs[0], refs[1:]
        if HAS_PRE:
            pre_ref, refs = refs[0], refs[1:]
        const_refs = refs[:n_const]
        out_u_ref = refs[n_const]
        out_stats_ref = refs[n_const + 1]        # (1, 8)
        out_x_ref = refs[n_const + 2] if return_traj else None  # (H+1,1,13)
        xs_ref = refs[n_const + n_out]           # (H+1, Pc, 13) scratch
        g_ref = refs[n_const + n_out + 1]        # (H, 1, nZ) scratch
        cand_ref = refs[n_const + n_out + 2]     # (H, K, nZ) scratch
        u_scr = refs[n_const + n_out + 3]        # (H, 1, nZ) scratch: the
        # iterate being differentiated (fori bodies need dynamic per-step
        # reads, which only refs support)
        acts_refs = (tuple(refs[n_const + n_out + 4:n_const + n_out + 7])
                     if use_manual else None)    # trunk pre-act stashes

        (x0_ref, xref_ref, uprev_ref, noise_ref, *wrefs) = const_refs
        ts_s, ds_s = wrefs[-2], wrefs[-1]
        sc_vals = tuple(r[:] for r in wrefs[-2 - _N_SC:-2]) if _N_SC else None
        (W0, B0, W1, B1, W2, B2, MIX, IN, TSV, DS, WS, UREF, SLO, SHI, SC,
         LB, UB) = (r[:] for r in wrefs[: -2 - _N_SC])
        W = (W0, B0, W1, B1, W2, B2, MIX, IN, WS, SC[0, 1])
        ctx = SweepCtx(
            step=step1, H=H, n=nZ, n_u=n, P=P,
            noise_ref=noise_ref, xref_ref=xref_ref, ts_s=ts_s, ds_s=ds_s,
            W=W, sc_vals=sc_vals, uprev=uprev_ref[:], UREF=UREF, DS=DS,
            SC=SC, SLO=SLO, SHI=SHI, TSV=TSV, has_slew=has_slew, chunk=chunk,
            step_acts=step_acts, acts_refs=acts_refs,
            mass=float(model.vehicle.mass),
        )
        res_mult = SC[0, 5]
        uprev = ctx.uprev
        x0v = x0_ref[:]

        def proj1(u3):  # (H,1,nZ)
            return jnp.clip(u3, LB[None], UB[None])

        # Diagonal metric plumbing (trace-time branch: the unpreconditioned
        # kernel is byte-identical to before). ``dscale(g)`` is the step
        # direction, ``dquad`` the Armijo quadratic <d, D^{-1} d>.
        if HAS_PRE:
            D3 = pre_ref[:]                      # (H, 1, nZ)
            dscale = lambda g3: D3 * g3
            dquad = lambda d3: d3 * d3 / D3
        else:
            dscale = lambda g3: g3
            dquad = lambda d3: d3 * d3

        def vg(u3):
            """value+grad of a (H,1,nZ) iterate; gradient lands in g_ref."""
            u_scr[:] = u3
            return vg_sweep(ctx, u_scr, g_ref, xs_ref, x0v)

        # ------------- batched candidate evaluation (K at once) ------------
        iota_k3 = jax.lax.broadcasted_iota(jnp.int32, (1, K, 1), 1).astype(f32)  # (1,K,1); int iota (f32 iota is not lowerable)

        def cand_values(y3, g3, t0):
            """Write clip(y - t_k g) into cand_ref and return per-candidate
            total costs plus lin/quad scalars for the Armijo bound."""
            # Exact DF**k per candidate (mask-built): MUST match the Python
            # float pow used for the accept bound and the accepted-iterate
            # recompute below — an exp/log schedule differs by ~1e-7 rel,
            # enough to flip accept decisions near tolerance thresholds.
            df_pows = sum(
                (iota_k3 == float(k)).astype(f32) * float(DF ** k)
                for k in range(K)
            )
            ts3 = t0 * df_pows                                   # (1,K,1)
            U_cand = jnp.clip(y3 - ts3 * dscale(g3), LB[None], UB[None])  # (H,K,nZ)
            cand_ref[:] = U_cand

            roll_t, roll_r = run_candidates(ctx, cand_ref, K, x0v)
            roll_k = roll_t + res_mult * roll_r                  # (K,1)

            # control cost + Armijo pieces, vectorized then mask-extracted
            U_ctrl = U_cand[:, :, 0:n]
            du = U_ctrl - UREF[None]
            uerr = SC[0, 2]
            slew_coeff = SC[0, 3]
            slew_c_coeff = SC[0, 4]
            disc3 = DS[:, :, None] if DS.ndim == 2 else DS      # (H,1,1)
            cc = uerr * disc3 * du * du                          # (H,K,n)
            # lax.slice + reshape, NOT uprev[None, :, 0:n]: mixed None+slice
            # indexing lowers through gather, which Mosaic rejects when
            # nZ > n (prox-slack augmented decision columns).
            uprev_ctrl = jax.lax.slice_in_dim(uprev, 0, n, axis=1)  # (1, n)
            uprev_b = jnp.broadcast_to(uprev_ctrl.reshape(1, 1, n), (1, K, n))
            if H > 1:
                prev = jnp.concatenate([uprev_b, U_ctrl[:-1]], axis=0)
            else:
                prev = uprev_b  # H == 1: zero-size slice is not lowerable
            sl = U_ctrl - prev
            cc = cc + slew_coeff * sl * sl
            if has_slew:
                rate = sl / TSV[:, :, None]
                viol = (jnp.maximum(rate - SHI[None], 0.0) ** 2
                        + jnp.maximum(SLO[None] - rate, 0.0) ** 2)
                cc = cc + slew_c_coeff * viol

            d3 = U_cand - y3
            lin3 = g3 * d3
            quad3 = dquad(d3)

            fs, lins, quads = [], [], []
            for k in range(K):
                mk = (iota_k3 == float(k)).astype(f32)           # (1,K,1)
                fs.append(jnp.sum(roll_k * mk[0, :, 0:1]) + jnp.sum(cc * mk))
                lins.append(jnp.sum(lin3 * mk))
                quads.append(jnp.sum(quad3 * mk))
            return fs, lins, quads

        # --------------------------- APG while loop ------------------------
        u0 = proj1(u0_ref[:])
        f0 = vg(u0)

        # Deadline-aware iteration cap (SMEM scalar; see docstring).
        if HAS_BUDGET:
            kmax = jnp.minimum(jnp.int32(apg.max_iter),
                               jnp.maximum(ib_ref[0, 0], 1))
        else:
            kmax = apg.max_iter

        def cond(c):
            k, done = c[0], c[9]
            return jnp.logical_and(k < kmax, jnp.logical_not(done))

        def body(c):
            (k, k_m, u, y, f_u, t, best_f, best_u, no_imp, done,
             sum_t, sum_ls) = c[:12]
            f_y = vg(y)
            g3 = g_ref[:]

            if BB:
                # Barzilai–Borwein spectral trial stepsize from the secant
                # pair at consecutive extrapolated points — only the INITIAL
                # Armijo candidate; the accept rule below is unchanged.
                # Mirrors solver/apg.py::apg_solve (reset_option "bb").
                y_prev, g_prev = c[12], c[13]
                s3 = y - y_prev
                r3 = g3 - g_prev
                sr = jnp.sum(s3 * r3)
                rr = jnp.sum(r3 * dscale(r3))     # <r, D r>: BB2, D-metric
                t_bb = sr / jnp.maximum(rr, 1e-12)
                t_inc = jnp.minimum(t * INC, TMAX)
                valid = jnp.logical_and(k > 0, sr > 1e-12)
                t0 = jnp.where(valid, jnp.clip(t_bb, 1e-6, TMAX), t_inc)
            elif not CONSERVATIVE:
                t0 = jnp.minimum(t * INC, TMAX)
            else:
                t0 = t
            fs, lins, quads = cand_values(y, g3, t0)

            # first (largest-step) accepted candidate — static unroll
            t_acc = t0 * (DF ** K)
            f_new_s = f_y
            ok_any = jnp.bool_(False)
            n_ls = jnp.float32(K)
            for k_i in reversed(range(K)):
                t_k = t0 * (DF ** k_i)
                bound = f_y + (1.0 - COEF) * lins[k_i] + quads[k_i] / (2.0 * jnp.maximum(t_k, 1e-12))
                ok_k = fs[k_i] <= bound
                t_acc = jnp.where(ok_k, t_k, t_acc)
                f_new_s = jnp.where(ok_k, fs[k_i], f_new_s)
                n_ls = jnp.where(ok_k, jnp.float32(k_i + 1), n_ls)
                ok_any = jnp.logical_or(ok_any, ok_k)

            u_trial = proj1(y - t_acc * dscale(g3))
            ok_b = ok_any
            u_new = jnp.where(ok_b, u_trial, u)
            f_new = jnp.where(ok_b, f_new_s, f_u)

            # Momentum schedule counter: with ``momentum_restart`` the
            # counter resets on adaptive restart so beta re-grows from
            # beta_init (matches solver/apg.py; see APGConfig).
            kf = (k_m if MOM_RESTART else k).astype(f32)
            beta = (jnp.float32(apg.moment_scale)
                    if apg.moment_scale is not None
                    else jnp.maximum(kf / (kf + 3.0), apg.beta_init))
            restart = jnp.logical_or(jnp.logical_not(ok_b), f_new > f_u)
            y_new = jnp.where(restart, u_new, u_new + beta * (u_new - u))
            k_m_new = jnp.where(restart, jnp.int32(0), k_m + 1)

            improved = f_new < best_f - 1e-12
            best_f2 = jnp.minimum(f_new, best_f)
            best_u2 = jnp.where(improved, u_new, best_u)
            no_imp2 = jnp.where(improved, 0, no_imp + 1)
            df_ = jnp.abs(f_u - f_new)
            converged = jnp.logical_and(ok_b, df_ <= apg.atol + apg.rtol * jnp.abs(f_u))
            done2 = jnp.logical_or(converged, no_imp2 >= apg.max_no_improvement_iter)

            out = (k + 1, k_m_new, u_new, y_new, f_new, t_acc, best_f2,
                   best_u2, no_imp2, done2, sum_t + t_acc, sum_ls + n_ls)
            if BB:
                out = out + (y, g3)   # the secant pair for the next iterate
            return out

        init = (jnp.int32(0), jnp.int32(0), u0, u0, f0, t0_ref[0, 0],
                f0, u0, jnp.int32(0), jnp.bool_(False),
                jnp.float32(0.0), jnp.float32(0.0))
        if BB:
            init = init + (u0, g_ref[:])  # vg(u0) above left grad(u0) here
        fin = jax.lax.while_loop(cond, body, init)
        (k, k_m, u, y, f_u, t, best_f, best_u, no_imp, done,
         sum_t, sum_ls) = fin[:12]

        # exit gradient at the best iterate
        _ = vg(best_u)
        gb = g_ref[:]
        g_sqr = jnp.sum(gb * gb)

        out_u_ref[:] = best_u
        if return_traj:
            # xs_ref now holds best_u's forward states (vg just ran it);
            # deterministic P=1 => this IS the mean trajectory (x_evol).
            out_x_ref[:] = xs_ref[:]
        n_steps = jnp.maximum(k.astype(f32), 1.0)
        stats = jnp.concatenate([
            jnp.reshape(k.astype(f32), (1, 1)),
            jnp.reshape(t, (1, 1)),
            jnp.reshape(sum_t / n_steps, (1, 1)),
            jnp.reshape(sum_ls / n_steps, (1, 1)),
            jnp.reshape(g_sqr, (1, 1)),
            jnp.reshape(f0, (1, 1)),
            jnp.reshape(best_f, (1, 1)),
            jnp.reshape(jnp.float32(0.0), (1, 1)),
        ], axis=1)
        out_stats_ref[:] = stats

    # Resolve the initial stepsize outside the kernel (carried stepsize if
    # positive, else the config's ramp start) and feed it as an SMEM scalar.
    if t_init is None:
        t0v = jnp.float32(apg.init_stepsize)
    else:
        ti = jnp.asarray(t_init, f32)
        t0v = jnp.where(ti > 0.0, jnp.clip(ti, 1e-6, TMAX),
                        jnp.float32(apg.init_stepsize))
    t0_arr = jnp.reshape(t0v, (1, 1))

    _smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = [
        jax.ShapeDtypeStruct((H, 1, nZ), f32),
        jax.ShapeDtypeStruct((1, 8), f32),
    ]
    if return_traj:
        out_shape.append(jax.ShapeDtypeStruct((H + 1, 1, 13), f32))
    pre_args = []
    pre_specs = []
    if HAS_BUDGET:
        pre_args.append(jnp.reshape(
            jnp.asarray(iter_budget, jnp.int32), (1, 1)))
        pre_specs.append(_smem)
    if HAS_PRE:
        pre_args.append(jnp.broadcast_to(
            jnp.asarray(precond, f32), (H, nZ)).reshape(H, 1, nZ))
        pre_specs.append(_vmem)
    outs = pl.pallas_call(
        _kernel,
        out_shape=tuple(out_shape),
        in_specs=[_vmem, _smem] + pre_specs + const_specs,
        out_specs=(_vmem,) * len(out_shape),
        scratch_shapes=[
            pltpu.VMEM((H + 1, Pc, 13), jnp.float32),
            pltpu.VMEM((H, 1, nZ), jnp.float32),
            pltpu.VMEM((H, K, nZ), jnp.float32),
            pltpu.VMEM((H, 1, nZ), jnp.float32),
        ] + ([
            # trunk pre-activation stashes for the manual reverse sweep
            pltpu.VMEM((H, Pc, consts[4].shape[1]), jnp.float32),
            pltpu.VMEM((H, Pc, consts[6].shape[1]), jnp.float32),
            pltpu.VMEM((H, Pc, consts[8].shape[1]), jnp.float32),
        ] if use_manual else []),
        interpret=interpret,
    )(u_init.astype(f32).reshape(H, 1, nZ), t0_arr, *pre_args, *consts)
    out_u, out_stats = outs[0], outs[1]

    st = APGState(
        yk=out_u.reshape(H, nZ),
        num_steps=out_stats[0, 0],
        stepsize=out_stats[0, 1],
        avg_stepsize=out_stats[0, 2],
        avg_linesearch=out_stats[0, 3],
        grad_sqr=out_stats[0, 4],
        init_cost=out_stats[0, 5],
        opt_cost=out_stats[0, 6],
    )
    if return_traj:
        return st, outs[2][:, 0, :]
    return st
