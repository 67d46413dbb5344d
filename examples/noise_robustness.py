#!/usr/bin/env python
"""Closed-loop process-noise robustness: what the SDE in neural-SDE MPC buys.

The reference's whole premise is planning over a LEARNED STOCHASTIC model
(``num_particles``, ``launch/iris_sitl_traj_mpc.yaml:52``), but its flight
config flies the mean dynamics (particles = 1). This demo closes the loop
on a NOISY plant (the SDE model integrated WITH its Brownian term,
``sim/plant.py`` ``process_noise=True``) near a hard altitude floor, and
compares three controllers on the same task:

  1. mean-dynamics MPC        (num_particles: 1 — the reference flight config)
  2. particle MPC             (128 antithetic pairs: the penalty sees the
                               VIOLATION PROBABILITY through noisy rollouts)
  3. risk-averse particle MPC (+ risk_lambda: mean + λ·std cost reduction)

Each flies the same hover-hold a fraction of the noise band above a
floor enforced as a
``state_constr`` penalty on NED z. The uncertainty-aware controllers back
off the floor in proportion to the noise they predict; the mean controller
plans as if noise didn't exist and gets pushed through the floor by it.

Usage: python examples/noise_robustness.py [--cpu] [--seconds 12]
           [--particles 128] [--noise-scale 0.5]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from sde4mbrl_px4_tpu.compile_cache import ensure_compile_cache

ensure_compile_cache()

import numpy as np

FLOOR_Z = -1.2        # NED: altitude 1.2 m — violation when z > FLOOR_Z
HOVER_Z = -1.27       # hold 0.07 m above the floor — ~1.3 sigma of the
                      # closed-loop altitude noise at the default scale,
                      # so the mean planner sees real violation pressure


def fly(cfg, model, plant_params, seconds, seed, label):
    """Closed loop: solve -> apply u[0] to the NOISY plant for one control
    period -> repeat. Returns (tracking_rmse, violation_fraction,
    mean_violation_depth_m, ms_per_solve)."""
    import jax
    import jax.numpy as jnp

    from sde4mbrl_px4_tpu.core.frames import ned2enu
    from sde4mbrl_px4_tpu.core.types import hover_state
    from sde4mbrl_px4_tpu.engine.mpc_loader import make_mpc_from_config
    from sde4mbrl_px4_tpu.sim.plant import SDEPlant

    cfg, (reset_fn, mpc_fn), _, _ = make_mpc_from_config(dict(cfg))
    dt = float(cfg["_time_steps"][0])
    n = int(seconds / dt)

    tgt = np.asarray(hover_state(), np.float32).copy()
    tgt[2] = HOVER_Z                       # NED (plant/metrics frame)
    tgt_j = ned2enu(jnp.asarray(tgt))      # mpc_fn's xdes boundary is ENU

    # Same plant, same noise stream per controller (common random numbers):
    # differences in the flown trajectory come from the CONTROLS, not from
    # different luck.
    plant = SDEPlant(model, plant_params, sim_dt=0.01, process_noise=True,
                     seed=seed)
    plant.reset(tgt)

    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(plant.x)
    st = reset_fn(x, rng, tgt_j)
    jm = jax.jit(mpc_fn)
    sol = jm(x, rng, st, jnp.float32(0.0), tgt_j)
    jax.block_until_ready(sol.u_opt)

    zs, errs = [], []
    t0 = time.perf_counter()
    for _ in range(n):
        x = jnp.asarray(plant.x, jnp.float32)
        sol = jm(x, sol.rng, sol.opt_state, jnp.float32(0.0), tgt_j)
        u0 = np.asarray(sol.u_opt[0])
        plant.step(u0, dt)
        zs.append(float(plant.x[2]))
        errs.append(float(np.linalg.norm(plant.x[:3] - tgt[:3])))
    wall = (time.perf_counter() - t0) / n
    zs = np.asarray(zs)
    viol = zs > FLOOR_Z
    depth = float(np.mean(np.maximum(zs - FLOOR_Z, 0.0)))
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    print(f"  {label:28s} rmse={rmse:.3f}m  floor violations="
          f"{viol.mean():6.1%}  mean depth={depth*100:.1f}cm  "
          f"{wall*1e3:6.1f} ms/solve", flush=True)
    return rmse, float(viol.mean()), depth, wall * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seconds", type=float, default=12.0)
    ap.add_argument("--particles", type=int, default=128)
    ap.add_argument("--noise-scale", type=float, default=0.6,
                    help="plant+model diffusion magnitude (exp-scale)")
    ap.add_argument("--seeds", type=int, default=3,
                    help="independent noise realizations per controller")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import tempfile

    from sde4mbrl_px4_tpu.io.config import load_yaml_config
    from sde4mbrl_px4_tpu.models.params_io import load_params, save_params
    from sde4mbrl_px4_tpu.models.sde_model import NeuralSDE
    from sde4mbrl_px4_tpu.models.vehicles import iris_config

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    base = load_yaml_config(os.path.join(here, "configs/iris_posctrl_mpc.yaml"))
    base["apg_mpc"]["max_iter"] = 60
    base["apg_mpc"]["max_no_improvement_iter"] = 60
    # the altitude floor, as the solver sees it (state_constr penalty form)
    base["state_constr"] = {
        "state_id": [2],
        "state_bound": [[-5.0, float(FLOOR_Z)]],
        "state_penalty": [300.0],
        "slack_scaling": [1.0],
    }

    # One noise level for plant AND model: the controller KNOWS the
    # diffusion magnitude (that's the learned-SDE premise); what differs
    # between the variants is whether the solver USES it.
    params, meta = load_params(base["learned_model_params"])
    params = dict(params)
    params["diffusion_log_scale"] = np.float32(np.log(args.noise_scale))
    tmp = tempfile.NamedTemporaryFile(suffix=".pkl", delete=False)
    save_params(tmp.name, params, meta)
    base["learned_model_params"] = tmp.name
    model = NeuralSDE(vehicle=iris_config())

    variants = [
        ("mean (particles=1)", {}),
        (f"particles={args.particles} anti",
         {"num_particles": args.particles, "antithetic": True}),
        (f"particles={args.particles} risk l=2",
         {"num_particles": args.particles, "antithetic": True,
          "cost_params": dict(base["cost_params"], risk_lambda=2.0)}),
    ]
    print(f"hover-hold {abs(HOVER_Z - FLOOR_Z):.1f} m above a floor, plant "
          f"noise scale {args.noise_scale}, {args.seconds:.0f} s x "
          f"{args.seeds} seeds per controller", flush=True)

    table = {}
    for label, mut in variants:
        cfg = dict(base)
        cfg.update(mut)
        rows = [fly(cfg, model, params, args.seconds, seed, f"{label} s{seed}")
                for seed in range(args.seeds)]
        r = np.asarray(rows)
        table[label] = r.mean(axis=0)
        print(f"  {label:28s} == mean over {args.seeds} seeds: "
              f"rmse={table[label][0]:.3f}m violations={table[label][1]:.1%} "
              f"depth={table[label][2]*100:.1f}cm", flush=True)
    os.unlink(tmp.name)

    v_mean = table["mean (particles=1)"][1]
    v_risk = table[f"particles={args.particles} risk l=2"][1]
    ok = v_risk <= v_mean and all(np.isfinite(v).all() for v in table.values())
    print(f"\nfloor-violation fraction: mean-MPC {v_mean:.1%} -> "
          f"risk-averse particle MPC {v_risk:.1%}")
    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
