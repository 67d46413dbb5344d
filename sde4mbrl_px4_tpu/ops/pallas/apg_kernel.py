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

Mosaic-dictated construction (see ops/pallas/solve_kernels.py for the
measured constraints): per-step data read from horizon-major refs; the
candidate block lives in a VMEM scratch so the rollout can page through it;
per-candidate scalars extracted by masked reduction (no minor-dim slicing);
the accepted iterate is RECOMPUTED from the accepted scalar stepsize
(dynamic minor-dim gathers are not lowerable).

Equivalence with the XLA solver is enforced by
``tests/test_apg_kernel.py`` in interpreter mode.

MAINTENANCE: the vg forward/backward bodies and the candidate-rollout body
intentionally mirror ``solve_kernels.py`` (``_vg_kernel``/``_batch_kernel``)
with a different consts ordering. Any change to the step math, the
closed-form control gradients, or the consts layout must be applied to BOTH
files; each file's XLA-parity test will catch a one-sided edit
(``test_pallas_kernels.py`` / ``test_apg_kernel.py``). Structural dedup
(shared body builders parameterized by ref wiring) is planned.

Restrictions: P (num_particles) small enough for VMEM (<=128, like the vg
kernel) and ``use_linesearch`` configs (the reference always uses the
linesearch block).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sde4mbrl_px4_tpu.cost.cost import CostParams
from sde4mbrl_px4_tpu.models.sde_model import NeuralSDE
from sde4mbrl_px4_tpu.ops.pallas.solve_kernels import (
    _control_cost,
    _make_step,
    _NSCAL,
)
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
    u_init: jax.Array,         # (H, n) warm start
    interpret: bool = False,
    deterministic: bool | None = None,
) -> APGState:
    """One fused APG solve -> APGState (yk = best iterate, unshifted)."""
    H = int(time_steps.shape[0])
    n = model.n_u
    P = int(num_particles)
    K = int(apg.maxls)
    f32 = jnp.float32
    if deterministic is None:
        deterministic = P <= 1
    assert apg.use_linesearch, "mega-kernel requires the linesearch block"

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
    scal = jnp.stack([
        jnp.float32(model.vehicle.mass),
        jnp.exp(params["diffusion_log_scale"]),
        cp.uerr, cp.u_slew_coeff, cp.u_slew_constr_coeff, cp.res_mult,
    ]).reshape(1, _NSCAL)

    has_sc = cp.state_pen13 is not None
    sc_arrays = ()
    if has_sc:
        sc_arrays = (
            (cp.constr_pen * cp.state_pen13).reshape(1, 13),
            cp.state_lo13.reshape(1, 13),
            cp.state_hi13.reshape(1, 13),
            cp.state_inv_scale13.reshape(1, 13),
        )
    _N_SC = len(sc_arrays)

    consts = (
        x0.reshape(1, 13).astype(f32),
        x_ref.astype(f32).reshape(H + 1, 1, 13),
        u_prev.reshape(1, n).astype(f32),
        jnp.transpose(noise.astype(f32), (1, 0, 2)),      # (H, P, 13)
        w0, b0, w1, b1, w2, b2, mix_eff, inertia,
        disc.reshape(H, 1),                               # VMEM copy (vector use)
        wstate, cp.uref.reshape(1, n), slew_lo, slew_hi, scal,
        lb.reshape(1, n).astype(f32), ub.reshape(1, n).astype(f32),
        time_steps.reshape(H, 1).astype(f32),             # VMEM copy
    ) + sc_arrays + (
        # SMEM twins for per-step scalar reads
        time_steps.reshape(H, 1).astype(f32),
        disc.reshape(H, 1),
    )
    n_const = len(consts)
    _vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    _smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    const_specs = [_vmem] * (n_const - 2) + [_smem, _smem]

    step1 = _make_step(float(model.vehicle.mass), has_noise=not deterministic,
                       has_state_constr=has_sc)

    # static Armijo schedule scalars
    DF = float(apg.decrease_factor)
    INC = float(apg.increase_factor)
    COEF = float(apg.coef)
    TMAX = float(apg.max_stepsize)
    CONSERVATIVE = apg.reset_option != "increase"

    def _kernel(u0_ref, *refs):
        const_refs = refs[:n_const]
        out_u_ref = refs[n_const]
        out_stats_ref = refs[n_const + 1]        # (1, 8) SMEM? VMEM fine
        xs_ref = refs[n_const + 2]               # (H+1, P, 13) scratch
        g_ref = refs[n_const + 3]                # (H, 1, n) scratch
        cand_ref = refs[n_const + 4]             # (H, K, n) scratch
        u_scr = refs[n_const + 5]                # (H, 1, n) scratch: the
        # iterate being differentiated (fori bodies need dynamic per-step
        # reads, which only refs support)

        (x0_ref, xref_ref, uprev_ref, noise_ref, *wrefs) = const_refs
        ts_s, ds_s = wrefs[-2], wrefs[-1]
        sc_vals = tuple(r[:] for r in wrefs[-2 - _N_SC:-2]) if _N_SC else None
        (W0, B0, W1, B1, W2, B2, MIX, IN, DS, WS, UREF, SLO, SHI, SC,
         LB, UB, TSV) = (r[:] for r in wrefs[: -2 - _N_SC])
        W = (W0, B0, W1, B1, W2, B2, MIX, IN, WS, SC[0, 1])
        B = P
        res_mult = SC[0, 5]
        uprev = uprev_ref[:]
        x0v = x0_ref[:]
        x0b = jnp.broadcast_to(x0v, (B, 13))

        def proj1(u3):  # (H,1,n)
            return jnp.clip(u3, LB[None], UB[None])

        # ---------------- value+grad of a (H,1,n) iterate ------------------
        def vg(u3):
            u_scr[:] = u3
            xs_ref[0] = x0b

            def fwd_body(t, carry):
                p_, v, q, om, jt, jr = carry
                u_b = jnp.broadcast_to(u_scr[t], (B, n))
                z = noise_ref[t]
                r = xref_ref[t + 1]
                dt = ts_s[t, 0]
                d_t = ds_s[t, 0]
                (p1, v1, q1, om1), track, res2 = step1(p_, v, q, om, u_b, z,
                                                       r, dt, W, sc_vals)
                xs_ref[t + 1] = jnp.concatenate([p1, v1, q1, om1], axis=1)
                return (p1, v1, q1, om1,
                        jt + d_t * jnp.mean(track), jr + d_t * jnp.mean(res2))

            outc = jax.lax.fori_loop(
                0, H, fwd_body,
                (x0b[:, 0:3], x0b[:, 3:6], x0b[:, 6:10], x0b[:, 10:13],
                 f32(0.0), f32(0.0)),
            )
            j_track, j_res = outc[4], outc[5]
            j_ctrl = _control_cost(u3[:, 0, :], uprev, UREF, DS, SC, SLO, SHI,
                                   TSV, has_slew)
            val = j_track + res_mult * j_res + j_ctrl

            uerr = SC[0, 2]
            slew_coeff = SC[0, 3]
            slew_c_coeff = SC[0, 4]

            def bwd_body(s_i, ct):
                ct_p, ct_v, ct_q, ct_om = ct
                t = H - 1 - s_i
                st = xs_ref[t]
                p_, v, q, om = st[:, 0:3], st[:, 3:6], st[:, 6:10], st[:, 10:13]
                u_t = u_scr[t]
                u_b = jnp.broadcast_to(u_t, (B, n))
                z = noise_ref[t]
                r = xref_ref[t + 1]
                dt = ts_s[t, 0]
                d_t = ds_s[t, 0]

                def f(p_a, v_a, q_a, om_a, u_a):
                    (p1, v1, q1, om1), track, res2 = step1(
                        p_a, v_a, q_a, om_a, u_a, z, r, dt, W, sc_vals)
                    return p1, v1, q1, om1, jnp.mean(track), jnp.mean(res2)

                _, vjp_fn = jax.vjp(f, p_, v, q, om, u_b)
                gp, gv, gq, gom, gu = vjp_fn(
                    (ct_p, ct_v, ct_q, ct_om, d_t, d_t * res_mult))

                u_prev_t = jnp.where(t == 0, uprev, u_scr[jnp.maximum(t - 1, 0)])
                sl_t = u_t - u_prev_t
                g_ctrl = 2.0 * uerr * d_t * (u_t - UREF) + 2.0 * slew_coeff * sl_t
                u_next = u_scr[jnp.minimum(t + 1, H - 1)]
                sl_n = jnp.where(t + 1 < H, u_next - u_t, jnp.zeros_like(u_t))
                g_ctrl = g_ctrl - 2.0 * slew_coeff * sl_n
                if has_slew:
                    rate_t = sl_t / dt
                    g_rt = (2.0 * jnp.maximum(rate_t - SHI, 0.0)
                            - 2.0 * jnp.maximum(SLO - rate_t, 0.0)) / dt
                    dt_n = ts_s[jnp.minimum(t + 1, H - 1), 0]
                    rate_n = sl_n / dt_n
                    g_rn = (2.0 * jnp.maximum(rate_n - SHI, 0.0)
                            - 2.0 * jnp.maximum(SLO - rate_n, 0.0)) / dt_n
                    g_ctrl = g_ctrl + slew_c_coeff * (
                        g_rt - jnp.where(t + 1 < H, g_rn, jnp.zeros_like(g_rn)))

                g_ref[t] = jnp.sum(gu, axis=0, keepdims=True) + g_ctrl
                return (gp, gv, gq, gom)

            zero3 = jnp.zeros((B, 3), f32)
            zero4 = jnp.zeros((B, 4), f32)
            jax.lax.fori_loop(0, H, bwd_body, (zero3, zero3, zero4, zero3))
            return val  # gradient is in g_ref

        # ------------- batched candidate evaluation (K at once) ------------
        iota_k3 = jax.lax.broadcasted_iota(jnp.int32, (1, K, 1), 1).astype(f32)  # (1,K,1); int iota (f32 iota is not lowerable)

        def cand_values(y3, g3, t0):
            """Write clip(y - t_k g) into cand_ref and return rollout+cost
            (K,1) plus per-candidate lin/quad scalars for the Armijo bound."""
            # Exact DF**k per candidate (mask-built): MUST match the Python
            # float pow used for the accept bound and the accepted-iterate
            # recompute below — an exp/log schedule differs by ~1e-7 rel,
            # enough to flip accept decisions near tolerance thresholds.
            df_pows = sum(
                (iota_k3 == float(k)).astype(f32) * float(DF ** k)
                for k in range(K)
            )
            ts3 = t0 * df_pows                                   # (1,K,1)
            U_cand = jnp.clip(y3 - ts3 * g3, LB[None], UB[None])  # (H,K,n)
            cand_ref[:] = U_cand

            KB = K * P

            def body(t, carry):
                p_, v, q, om, jt, jr = carry
                u_k = cand_ref[t]                               # (K, n)
                if P == 1:
                    u_b = u_k
                    z = noise_ref[t]
                else:
                    u_b = jnp.broadcast_to(u_k[None], (P, K, n)).reshape(KB, n)
                    z = jnp.broadcast_to(
                        noise_ref[t][:, None, :], (P, K, 13)).reshape(KB, 13)
                r = xref_ref[t + 1]
                dt = ts_s[t, 0]
                d_t = ds_s[t, 0]
                (p1, v1, q1, om1), track, res2 = step1(p_, v, q, om, u_b, z,
                                                       r, dt, W, sc_vals)
                return (p1, v1, q1, om1, jt + d_t * track, jr + d_t * res2)

            pk = jnp.broadcast_to(x0v, (KB, 13))
            outk = jax.lax.fori_loop(
                0, H, body,
                (pk[:, 0:3], pk[:, 3:6], pk[:, 6:10], pk[:, 10:13],
                 jnp.zeros((KB, 1), f32), jnp.zeros((KB, 1), f32)),
            )
            j_track, j_res = outk[4], outk[5]
            if P > 1:
                j_track = jnp.mean(j_track.reshape(P, K), axis=0, keepdims=True).T
                j_res = jnp.mean(j_res.reshape(P, K), axis=0, keepdims=True).T
            roll_k = j_track + res_mult * j_res                  # (K,1)

            # control cost + Armijo pieces, vectorized then mask-extracted
            du = U_cand - UREF[None]
            uerr = SC[0, 2]
            slew_coeff = SC[0, 3]
            slew_c_coeff = SC[0, 4]
            disc3 = DS[:, :, None] if DS.ndim == 2 else DS      # (H,1,1)
            cc = uerr * disc3 * du * du                          # (H,K,n)
            uprev_b = jnp.broadcast_to(uprev[None], (1, K, n))
            if H > 1:
                prev = jnp.concatenate([uprev_b, U_cand[:-1]], axis=0)
            else:
                prev = uprev_b  # H == 1: zero-size slice is not lowerable
            sl = U_cand - prev
            cc = cc + slew_coeff * sl * sl
            if has_slew:
                rate = sl / TSV[:, :, None]
                viol = (jnp.maximum(rate - SHI[None], 0.0) ** 2
                        + jnp.maximum(SLO[None] - rate, 0.0) ** 2)
                cc = cc + slew_c_coeff * viol

            d3 = U_cand - y3
            lin3 = g3 * d3
            quad3 = d3 * d3

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

        def cond(c):
            (k, u, y, f_u, t, best_f, best_u, no_imp, done,
             sum_t, sum_ls) = c
            return jnp.logical_and(k < apg.max_iter, jnp.logical_not(done))

        def body(c):
            (k, u, y, f_u, t, best_f, best_u, no_imp, done,
             sum_t, sum_ls) = c
            f_y = vg(y)
            g3 = g_ref[:]

            t0 = jnp.minimum(t * INC, TMAX) if not CONSERVATIVE else t
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

            u_trial = proj1(y - t_acc * g3)
            ok_b = ok_any
            u_new = jnp.where(ok_b, u_trial, u)
            f_new = jnp.where(ok_b, f_new_s, f_u)

            kf = k.astype(f32)
            beta = (jnp.float32(apg.moment_scale)
                    if apg.moment_scale is not None
                    else jnp.maximum(kf / (kf + 3.0), apg.beta_init))
            restart = jnp.logical_or(jnp.logical_not(ok_b), f_new > f_u)
            y_new = jnp.where(restart, u_new, u_new + beta * (u_new - u))

            improved = f_new < best_f - 1e-12
            best_f2 = jnp.minimum(f_new, best_f)
            best_u2 = jnp.where(improved, u_new, best_u)
            no_imp2 = jnp.where(improved, 0, no_imp + 1)
            df_ = jnp.abs(f_u - f_new)
            converged = jnp.logical_and(ok_b, df_ <= apg.atol + apg.rtol * jnp.abs(f_u))
            done2 = jnp.logical_or(converged, no_imp2 >= apg.max_no_improvement_iter)

            return (k + 1, u_new, y_new, f_new, t_acc, best_f2, best_u2,
                    no_imp2, done2, sum_t + t_acc, sum_ls + n_ls)

        init = (jnp.int32(0), u0, u0, f0, jnp.float32(apg.init_stepsize),
                f0, u0, jnp.int32(0), jnp.bool_(False),
                jnp.float32(0.0), jnp.float32(0.0))
        (k, u, y, f_u, t, best_f, best_u, no_imp, done,
         sum_t, sum_ls) = jax.lax.while_loop(cond, body, init)

        # exit gradient at the best iterate
        _ = vg(best_u)
        gb = g_ref[:]
        g_sqr = jnp.sum(gb * gb)

        out_u_ref[:] = best_u
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

    out_u, out_stats = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((H, 1, n), f32),
            jax.ShapeDtypeStruct((1, 8), f32),
        ),
        in_specs=[_vmem] + const_specs,
        out_specs=(_vmem, _vmem),
        scratch_shapes=[
            pltpu.VMEM((H + 1, P, 13), jnp.float32),
            pltpu.VMEM((H, 1, n), jnp.float32),
            pltpu.VMEM((H, K, n), jnp.float32),
            pltpu.VMEM((H, 1, n), jnp.float32),
        ],
        interpret=interpret,
    )(u_init.astype(f32).reshape(H, 1, n), *consts)

    return APGState(
        yk=out_u.reshape(H, n),
        num_steps=out_stats[0, 0],
        stepsize=out_stats[0, 1],
        avg_stepsize=out_stats[0, 2],
        avg_linesearch=out_stats[0, 3],
        grad_sqr=out_stats[0, 4],
        init_cost=out_stats[0, 5],
        opt_cost=out_stats[0, 6],
    )
