#!/usr/bin/env python
"""Capture a device profiler trace of MPC solves (L7 observability).

The reference instruments wall-clock only (``solve_time`` in OptMPCState,
``sde_control.py:386,425``); this captures a full ``jax.profiler`` device
trace — per-kernel timelines, HBM traffic, fusion boundaries — viewable in
TensorBoard or Perfetto (`xprof`).

Usage:
  python tools/profile_solve.py [--cpu] [--out /tmp/mpc_trace] [--solves 10]
  tensorboard --logdir /tmp/mpc_trace     # then the Profile tab
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from sde4mbrl_px4_tpu.compile_cache import ensure_compile_cache

ensure_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="/tmp/mpc_trace")
    ap.add_argument("--solves", type=int, default=10)
    ap.add_argument("--config", default="configs/iris_traj_mpc.yaml")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sde4mbrl_px4_tpu.core.frames import enu2ned
    from sde4mbrl_px4_tpu.engine.mpc_loader import load_mpc_from_cfgfile

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    cfg, (reset_fn, mpc_fn), sft, b = load_mpc_from_cfgfile(
        os.path.join(here, args.config))
    rng = jax.random.PRNGKey(0)
    x = enu2ned(sft(3.0)) if sft is not None else jnp.zeros(13).at[6].set(1.0)
    t0 = 3.0 if sft is not None else 0.0
    st = reset_fn(x, rng, x)
    jm = jax.jit(mpc_fn)
    sol = jm(x, rng, st, jnp.float32(t0), x)
    jax.block_until_ready(sol.u_opt)    # compile outside the trace

    os.makedirs(args.out, exist_ok=True)
    t1 = time.perf_counter()
    with jax.profiler.trace(args.out):
        t = t0
        for _ in range(args.solves):
            with jax.profiler.TraceAnnotation("mpc_solve"):
                sol = jm(sol.x_evol[1], sol.rng, sol.opt_state,
                         jnp.float32(t), x)
                jax.block_until_ready(sol.u_opt)
            t += float(cfg["_time_steps"][0])
    dt = (time.perf_counter() - t1) / args.solves
    print(f"traced {args.solves} solves ({dt*1e3:.1f} ms each) -> {args.out}")
    print("view: tensorboard --logdir", args.out)


if __name__ == "__main__":
    main()
