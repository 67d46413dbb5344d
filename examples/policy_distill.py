#!/usr/bin/env python
"""Distill the APG MPC into a one-shot policy, then fly it.

Pipeline (learning/distill.py):

1. sample states around the shipped lemniscate trajectory (and the
   pos-control envelope),
2. label each with a CONVERGED APG solve — batched scenario-DP over the
   device mesh, i.e. the 11k-solves/s/chip regime pays for the dataset,
3. train the plan network (models/policy.py),
4. evaluate closed-loop: policy vs APG receding-horizon on the same plant
   (mean dynamics, chained jit — the direct analogue of the verify drive),
   reporting tracking error and per-solve latency,
5. save checkpoints a ``solver: policy`` config can serve
   (``policy: {params_path: ...}``; use closed_loop_sim.py --solver policy
   for the full async-UDP-engine version).

Usage: python examples/policy_distill.py [--cpu] [--n-states 4096]
           [--steps 3000] [--outdir /tmp/policy_ckpts] [--seconds 8]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from sde4mbrl_px4_tpu.compile_cache import ensure_compile_cache

ensure_compile_cache()

import numpy as np


def closed_loop(mpc_fn, reset_fn, cfg, sft, seconds, rng):
    """Chained receding-horizon flight on the model's mean dynamics.
    Returns (mean tracking error m, per-solve ms, solve count)."""
    import jax
    import jax.numpy as jnp
    from sde4mbrl_px4_tpu.core.frames import enu2ned

    dt = cfg["_time_steps"][0]
    n = int(seconds / dt)
    x = enu2ned(sft(0.0))
    st = reset_fn(x, rng, x)
    jm = jax.jit(mpc_fn)
    # warm/compile
    out = jm(x, rng, st, 0.0, x)
    jax.block_until_ready(out)
    errs = []
    t = 0.0
    t0 = time.perf_counter()
    for _ in range(n):
        u, st, rng, x_evol = jm(x, rng, st, t, x)
        x = x_evol[1]
        t += dt
        errs.append(float(jnp.linalg.norm(x[:3] - enu2ned(sft(t))[:3])))
    wall = time.perf_counter() - t0
    return float(np.mean(errs)), 1e3 * wall / n, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--vehicle", default="iris", choices=("iris", "hexa"))
    ap.add_argument("--n-states", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--expert-iters", type=int, default=300)
    ap.add_argument("--dagger-rounds", type=int, default=1)
    ap.add_argument("--dagger-rollouts", type=int, default=32)
    ap.add_argument("--hidden", type=int, nargs="+", default=[256, 256])
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--outdir", default="/tmp/policy_ckpts")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from sde4mbrl_px4_tpu.engine.mpc_loader import make_mpc_from_config
    from sde4mbrl_px4_tpu.io.config import load_yaml_config
    from sde4mbrl_px4_tpu.learning.distill import (
        DistillConfig, distill_policy, save_policy,
    )
    from sde4mbrl_px4_tpu.parallel.mesh import make_mesh

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    mesh = make_mesh()
    print(f"devices: {jax.devices()}  mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
    os.makedirs(args.outdir, exist_ok=True)

    results = {}
    for kind in ("traj", "posctrl"):
        cfg_path = os.path.join(here, f"configs/{args.vehicle}_{kind}_mpc.yaml")
        cfg = load_yaml_config(cfg_path)
        dcfg = DistillConfig(
            n_states=args.n_states, steps=args.steps,
            expert_max_iter=args.expert_iters,
            dagger_rounds=args.dagger_rounds,
            dagger_rollouts=args.dagger_rollouts,
            hidden=tuple(args.hidden), lr=args.lr,
        )
        print(f"== distilling {kind} expert ({args.n_states} states, "
              f"{args.expert_iters}-iter labels) ==", flush=True)
        t0 = time.perf_counter()
        params, stats = distill_policy(cfg, dcfg, mesh=mesh, verbose=True)
        print(f"  labeled in {stats['label_s']:.1f}s "
              f"({args.n_states / max(stats['label_s'], 1e-9):.0f} solves/s), "
              f"trained in {stats['train_s']:.1f}s, "
              f"loss {stats['losses'][0]:.5f} -> {stats['losses'][-1]:.5f}, "
              f"total {time.perf_counter() - t0:.1f}s")
        ckpt = os.path.join(args.outdir, f"{args.vehicle}_{kind}_policy.pkl")
        save_policy(ckpt, params, {"vehicle": args.vehicle, "cfg": kind})
        print(f"  saved {ckpt}")
        results[kind] = ckpt

    # closed-loop shoot-out on the lemniscate
    cfg_path = os.path.join(here, f"configs/{args.vehicle}_traj_mpc.yaml")
    base = load_yaml_config(cfg_path)
    rng = jax.random.PRNGKey(0)

    cfg_apg = dict(base)
    _, (reset_a, mpc_a), sft, _ = make_mpc_from_config(cfg_apg)
    err_a, ms_a, n = closed_loop(mpc_a, reset_a, cfg_apg, sft, args.seconds, rng)

    cfg_pol = dict(base)
    cfg_pol["solver"] = "policy"
    cfg_pol["policy"] = {"params_path": results["traj"]}
    _, (reset_p, mpc_p), sft_p, _ = make_mpc_from_config(cfg_pol)
    err_p, ms_p, _ = closed_loop(mpc_p, reset_p, cfg_pol, sft_p, args.seconds, rng)

    print(f"\n== closed loop, {n} control steps of the lemniscate ==")
    print(f"  APG    : {err_a:.3f} m mean tracking, {ms_a:.2f} ms/solve")
    print(f"  policy : {err_p:.3f} m mean tracking, {ms_p:.2f} ms/solve "
          f"({ms_a / max(ms_p, 1e-9):.1f}x faster)")
    print(f"\nServe it: add to {os.path.basename(cfg_path)}:\n"
          f"  solver: policy\n  policy:\n    params_path: {results['traj']}")
    ok = err_p < max(4.0 * err_a, 0.25)
    print(f"RESULT: {'PASS' if ok else 'FAIL'} "
          f"(policy {err_p:.3f} m vs gate {max(4.0 * err_a, 0.25):.3f} m)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
