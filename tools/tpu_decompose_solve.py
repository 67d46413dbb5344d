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

    # NOTE: feed yk0 back in (NOT the converged yk) and advance x_ref per
    # call, else every chained call early-exits at ~0 iterations and this
    # measures only the fixed overhead (observed: 2.5 ms at steps~0).
    def mega(c):
        k, _ = c
        st = pallas_apg_solve(
            b.model, b.params, b.cost_params, b.apg_config, b.time_steps,
            x, enu2ned(sft(T0 + k * dt + b.knot_times)), u_prev, noise, 1,
            b.lb, b.ub, st0.yk)
        return (k + 1.0, st.num_steps)

    t_mega, _, _ = chain_time(mega, (jnp.float32(0), jnp.float32(0)), "mega_cold")
    st_cold = jax.jit(mega)((jnp.float32(0), jnp.float32(0)))
    print(f"  (cold-start steps/solve: {float(st_cold[1]):.0f})")

    apg1 = b.apg_config._replace(max_iter=1)

    def mega1(c):
        k, _ = c
        st = pallas_apg_solve(
            b.model, b.params, b.cost_params, apg1, b.time_steps,
            x, enu2ned(sft(T0 + k * dt + b.knot_times)), u_prev, noise, 1,
            b.lb, b.ub, st0.yk)
        return (k + 1.0, st.num_steps)

    t_mega1, _, _ = chain_time(mega1, (jnp.float32(0), jnp.float32(0)),
                               "mega_1iter", k=100)
    steps_cold = float(st_cold[1])
    t_mega_c = t_mega - t_null10
    t_mega1_c = max(t_mega1 - t_null100, 0.0)
    per_iter = (t_mega_c - t_mega1_c) / max(steps_cold - 1.0, 1.0)
    print(f"  fixed ~{t_mega1_c*1e3:.3f} ms device (incl. 1 iter + init/"
          f"exit sweeps + ref build; raw {t_mega1*1e3:.3f} ms less the "
          f"k=100 dispatch floor), per-iter ~{per_iter*1e3:.3f} ms")

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

    # The full chain runs WARM (steps_warm/solve); normalize the kernel time
    # to the same iteration count before subtracting, else the cold-start
    # kernel (steps_cold) over-counts and glue goes negative. The flagship
    # P=1 path FUSES the predicted trajectory into the kernel's exit sweep
    # (mpc_loader return_traj), so traj_orc is context (the launch the
    # fusion removed), NOT a component of `full`.
    t_full_c = t_full - t_null10
    t_mega_warm = t_mega1_c + max(steps_warm - 1.0, 0.0) * per_iter
    glue = t_full_c - t_mega_warm
    print(f"{'full_dev':10s} {t_full_c*1e3:7.3f} ms/invocation (full less "
          "the k=10 dispatch floor)")
    print(f"{'mega_warm':10s} {t_mega_warm*1e3:7.3f} ms/invocation (derived: "
          f"fixed + {steps_warm:.0f} warm iters x per-iter)")
    print(f"{'xla_glue':10s} {glue*1e3:7.3f} ms/invocation (derived; "
          "full_dev - mega_warm; incl. the x_evol/stats export and shift "
          "— the ref build is already inside mega_warm)")
    print(f"split (of device time): kernel {t_mega_warm/t_full_c:.0%}  "
          f"glue {glue/t_full_c:.0%}; context: traj_orc {t_traj*1e3:.3f} ms "
          f"(fused away at P=1), ref_build {t_ref*1e3:.3f} ms, dispatch "
          f"floor {t_null10*1e3:.3f} ms/invocation at k=10")
    print("(glue within ~±15% of zero = the solve IS the kernel; the "
          "per-iter linear model is fit on cold solves, so small negative "
          "values are model error, not negative work)")


if __name__ == "__main__":
    main()
