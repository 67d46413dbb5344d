#!/usr/bin/env python
"""Decompose the on-device per-solve time of the flagship mega path.

Chains K invocations of each stage in one jitted lax.scan (no host
dispatch) and reports ms/invocation:

  full      — mpc_fn (mega kernel + trajectory oracle + ref build + shift)
  mega      — pallas_apg_solve alone (fixed inputs)
  traj_orc  — oracle.trajectory alone (the x_evol kernel)
  ref_build — state_from_traj(curr_t + knot_times) + enu2ned
  xla_glue  — full minus kernels (derived)

Motivation: BASELINE's >=100 Hz/scenario north star vs the measured
~82-89 Hz — find whether the kernel or the glue is the next lever.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sde4mbrl_px4_tpu.compile_cache import ensure_compile_cache

ensure_compile_cache()

import jax
import jax.numpy as jnp

from sde4mbrl_px4_tpu.core.frames import enu2ned
from sde4mbrl_px4_tpu.engine.mpc_loader import load_mpc_from_cfgfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
K = 10


def chain_time(fn, init_carry, label, n=5, k=None):
    """Scan fn k times inside one jit; time n repeats.

    Every program CALL pays a fixed host+tunnel dispatch cost (measured
    ~4-9 ms/call through the dev tunnel), so per-invocation numbers carry
    a ~dispatch/k floor: at k=10 that is ~0.5-0.9 ms — larger than the
    true device cost of the small stages (ref_build, traj_orc). The
    ``null`` stage in main() measures the floor at each k so it can be
    subtracted; cheap stages also run at a larger k to shrink it."""
    k = K if k is None else k

    def chained(carry):
        def body(c, _):
            return fn(c), 0.0
        c, _ = jax.lax.scan(body, carry, jnp.arange(k))
        return c

    jc = jax.jit(chained)
    c_warm = jc(init_carry)
    jax.block_until_ready(jax.tree.leaves(c_warm)[0])
    c = c_warm
    t0 = time.perf_counter()
    for _ in range(n):
        c = jc(c)
    jax.block_until_ready(jax.tree.leaves(c)[0])
    per = (time.perf_counter() - t0) / (n * k)
    print(f"{label:10s} {per*1e3:7.3f} ms/invocation", flush=True)
    # c_warm = carry AFTER the (untimed) warmup chain, c = after the timed
    # chains — accumulators can be differenced to exclude cold-start solves
    return per, c_warm, c


def main():
    print(f"devices: {jax.devices()}", flush=True)

    # Per-call dispatch floor at each chain length used below — subtracted
    # from every stage so the split reflects DEVICE time, not tunnel
    # weather (round-4 fix: at k=10 the floor is ~0.5-0.9 ms/invocation,
    # which used to swamp the small stages and read as "fixed kernel
    # entry cost").
    def null(c):
        return (c[0] + 1.0,)

    t_null10 = chain_time(null, (jnp.float32(0),), "null_k10")[0]
    t_null100 = chain_time(null, (jnp.float32(0),), "null_k100", k=100)[0]

    cfg, (reset_fn, mpc_fn), sft, b = load_mpc_from_cfgfile(
        os.path.join(HERE, "configs", "iris_traj_mpc.yaml"))
    dt = float(cfg["_time_steps"][0])
    rng = jax.random.PRNGKey(0)
    T0 = 3.0
    x = enu2ned(sft(T0))
    st0 = reset_fn(x, rng, x)

    # --- full mpc_fn chained (state feedback, like bench) ------------------
    def full(c):
        x, rng, st, t, acc, cnt = c
        u, st1, rng1, xe = mpc_fn(x, rng, st, t, x)
        return (xe[1], rng1, st1, t + dt, acc + st1.num_steps, cnt + 1.0)

    t_full, c_w, c_full = chain_time(
        full, (x, rng, st0, jnp.float32(T0), jnp.float32(0), jnp.float32(0)),
        "full")
    # exclude the untimed warmup chain's cold-start solves from the average
    steps_warm = (float(c_full[4]) - float(c_w[4])) / max(
        float(c_full[5]) - float(c_w[5]), 1.0)
    print(f"  (warm steps/solve: {steps_warm:.0f})")

    # --- pieces ------------------------------------------------------------
    from sde4mbrl_px4_tpu.ops.pallas.apg_kernel import pallas_apg_solve
    from sde4mbrl_px4_tpu.ops.pallas.solve_kernels import pallas_cost_oracle

    H = int(b.time_steps.shape[0])
    noise = jnp.zeros((1, H, 13), jnp.float32)
    x_ref = enu2ned(sft(T0 + b.knot_times))
    u_prev = st0.yk[0]

    # Measure the kernel the flagship actually runs: with `precond:
    # hover_diag` configured, mpc_fn passes the diagonal metric into the
    # kernel, and the preconditioned program costs ~25% more per iteration
    # (D-scaled candidates + BB secant extras) than the bare one — fitting
    # fixed/per-iter on the bare kernel misattributes that delta to "XLA
    # glue" (measured round 4: a kernel-only chain replicating mpc_fn's
    # mega path costs the same ms/step as mpc_fn itself; the wrapper is
    # free).
    precond = None
    if str(cfg["apg_mpc"].get("precond") or "none") == "hover_diag":
        import numpy as _np
        from sde4mbrl_px4_tpu.engine.mpc_loader import (
            _precond_cache_key, _precond_cache_paths)
        nZ_p = int(st0.yk.shape[1])
        pkey = _precond_cache_key(
            cfg, b.model.vehicle.name,
            _np.asarray(b.time_steps, _np.float64),
            # the loader keys on the float32 bound arrays byte-for-byte
            _np.asarray(b.lb, _np.float32), _np.asarray(b.ub, _np.float32),
            nZ_p, b.convert_to_enu)
        for cand in _precond_cache_paths(cfg, pkey):
            if os.path.exists(cand):
                arr = _np.load(cand)
                if arr.shape == (H, nZ_p):
                    precond = jnp.asarray(arr, jnp.float32)
                    break
        print(f"precond: {'loaded (flagship kernel)' if precond is not None else 'artifact MISS — measuring the bare kernel'}",
              flush=True)

    # Fixed/per-iter fit via FORCED iteration budgets on fixed inputs
    # (round-4 methodology fix). The old fit chained "cold" solves and
    # assumed each ran max_iter=200 iterations — but only the FIRST does;
    # the later chained calls (advancing x_ref, same warm start) converge
    # earlier, so the slope came out ~35% low and the residual read as
    # "XLA glue". ``iter_budget`` CAPS the while-loop trip count at
    # min(max_iter, budget); saturation (every solve ran exactly the
    # budget) is asserted via num_steps below, which requires
    # max_iter >= the largest budget point AND the cold solve not
    # converging before it — three budget points then confirm linearity.
    def mega_budget(budget, k=10, r=10, n=5):
        def body(c, kk):
            st = pallas_apg_solve(
                b.model, b.params, b.cost_params, b.apg_config,
                b.time_steps, x, x_ref, u_prev, noise, 1,
                b.lb, b.ub, st0.yk, precond=precond,
                iter_budget=jnp.int32(budget))
            return c, st.num_steps
        def outer(c, _):
            _, s = jax.lax.scan(body, 0.0, jnp.arange(k, dtype=jnp.float32))
            return c, s
        def prog(z):
            _, s = jax.lax.scan(outer, z, jnp.arange(r))
            return s
        jp = jax.jit(prog)
        s = jp(jnp.float32(0))
        jax.block_until_ready(s)
        assert float(jnp.min(s)) == float(budget), "budget not honored"
        t0 = time.perf_counter()
        for _ in range(n):
            o = jp(jnp.float32(0))
        jax.block_until_ready(o)
        per = (time.perf_counter() - t0) / (n * k * r)
        print(f"{'mega_b%-3d' % budget:10s} {per*1e3:7.3f} ms/invocation "
              f"({k*r} solves/program call)", flush=True)
        return per

    assert int(b.apg_config.max_iter) >= 100, (
        f"budget fit needs max_iter >= 100 (budgets are caps, not trip "
        f"counts); config has {b.apg_config.max_iter}")
    t_b10 = mega_budget(10)
    t_b40 = mega_budget(40)
    t_b100 = mega_budget(100)
    per_iter = max((t_b100 - t_b10) / 90.0, 1e-9)
    t_mega1_c = max(t_b10 - 10.0 * per_iter, 0.0)  # extrapolated fixed
    lin_err = abs((t_b40 - t_b10) / 30.0 - per_iter) / per_iter
    print(f"  fixed ~{t_mega1_c*1e3:.3f} ms device (launch + init/exit "
          f"sweeps + ref build), per-iter ~{per_iter*1e3:.4f} ms "
          f"(3-point fit, mid-point slope deviation {lin_err:.1%})")

    oracle = pallas_cost_oracle(
        b.model, b.params, b.cost_params, b.time_steps, x, x_ref, u_prev,
        noise, 1, b.apg_config.maxls)

    def traj_orc(c):
        yk, _ = c
        xe = oracle.trajectory(yk)
        return (yk, xe[1, 0])

    t_traj = max(chain_time(traj_orc, (st0.yk, jnp.float32(0)), "traj_orc",
                            k=100)[0] - t_null100, 0.0)
    print(f"  (traj_orc device time after floor subtraction: "
          f"{t_traj*1e3:.3f} ms)")

    def ref_build(c):
        t, acc = c
        ref = enu2ned(sft(t + b.knot_times))
        return (t + dt, acc + ref[0, 0])

    t_ref = max(chain_time(ref_build, (jnp.float32(T0), jnp.float32(0)),
                           "ref_build", k=100)[0] - t_null100, 0.0)
    print(f"  (ref_build device time after floor subtraction: "
          f"{t_ref*1e3:.3f} ms)")

    # Re-time the FULL path with the bench's R-rep amortization (solver
    # programs carry a per-call overhead the null chain does not model —
    # constant/executable handling scales with program size; measured
    # ~0.5 ms/solve at k=10 for the mega program): R replays of the same
    # warm K-window inside one program, per-call overhead /(K*R).
    R = 10

    def full_rep(z):
        def outer(zz, _):
            def body(cc, _):
                return full(cc), 0.0
            cN, _ = jax.lax.scan(body, c_w, jnp.arange(K))
            return zz, cN[4]
        _, accs = jax.lax.scan(outer, z, jnp.arange(R))
        return accs

    jfr = jax.jit(full_rep)
    accs = jfr(jnp.float32(0))
    jax.block_until_ready(accs)
    steps_rep = (float(accs[0]) - float(c_w[4])) / K
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        accs = jfr(jnp.float32(0))
    jax.block_until_ready(accs)
    t_full_c = (time.perf_counter() - t0) / (n * K * R)
    print(f"{'full_rep':10s} {t_full_c*1e3:7.3f} ms/invocation "
          f"({K*R} solves/program call, {steps_rep:.1f} steps/solve)")

    # The flagship P=1 path FUSES the predicted trajectory into the
    # kernel's exit sweep (mpc_loader return_traj), so traj_orc is context
    # (the launch the fusion removed), NOT a component of `full`.
    t_mega_warm = t_mega1_c + steps_rep * per_iter
    glue = t_full_c - t_mega_warm
    print(f"{'mega_warm':10s} {t_mega_warm*1e3:7.3f} ms/invocation (derived: "
          f"fixed + {steps_rep:.1f} warm iters x per-iter)")
    print(f"{'xla_glue':10s} {glue*1e3:7.3f} ms/invocation (derived; "
          "full_rep - mega_warm; incl. the x_evol/stats export and shift "
          "— the ref build is already inside mega_warm)")
    print(f"split (of device time): kernel {t_mega_warm/t_full_c:.0%}  "
          f"glue {glue/t_full_c:.0%}; context: traj_orc {t_traj*1e3:.3f} ms "
          f"(fused away at P=1), ref_build {t_ref*1e3:.3f} ms, k=10 "
          f"chain per-invocation floor: null {t_null10*1e3:.3f} ms, "
          f"raw full {t_full*1e3:.3f} ms")
    print("(glue within ~±10% of zero = the solve IS the kernel: fixed + "
          "steps x per-iter explains the full path; the reference build, "
          "shift and telemetry export are noise at this scale)")


if __name__ == "__main__":
    main()
