#!/usr/bin/env python
"""Tune the MPPI solver's exploration knobs on-chip.

Flies a whole grid of candidate (sigma, temperature, noise_beta)
controllers closed-loop in ONE compiled program (``tuning/tuner.py``) and
prints the ranked table plus the winning ``mppi:`` YAML block ready to
paste into the config. The reference's equivalent is one SITL session per
candidate, by hand.

    python tools/tune_mppi.py configs/iris_posctrl_mpc.yaml
    python tools/tune_mppi.py configs/iris_traj_mpc.yaml \
        --sigmas 0.01,0.02,0.04 --temps 0.05,0.1,0.2 --betas 0.0,0.5,0.7 \
        --steps 60 --mesh-dp 8
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sde4mbrl_px4_tpu.compile_cache import ensure_compile_cache

ensure_compile_cache()


def _floats(s):
    return [float(v) for v in s.split(",") if v]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", help="MPC YAML (solver forced to mppi)")
    ap.add_argument("--sigmas", type=_floats, default=[0.01, 0.02, 0.04])
    ap.add_argument("--temps", type=_floats, default=[0.05, 0.1, 0.2])
    ap.add_argument("--betas", type=_floats, default=[0.0, 0.5, 0.7])
    ap.add_argument("--steps", type=int, default=40,
                    help="closed-loop control periods per candidate")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-crn", action="store_true",
                    help="independent noise per candidate (default: common "
                         "random numbers)")
    ap.add_argument("--mesh-dp", type=int, default=0,
                    help="shard the candidate axis over a dp mesh of this "
                         "size (0 = single device)")
    ap.add_argument("--top", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from sde4mbrl_px4_tpu.io.config import load_yaml_config
    from sde4mbrl_px4_tpu.solver.mppi import MPPIConfig
    from sde4mbrl_px4_tpu.tuning import make_mppi_grid, tune_mppi

    cfg = load_yaml_config(args.config)
    cfg["solver"] = "mppi"
    static = MPPIConfig.from_config(cfg)
    grid = make_mppi_grid(args.sigmas, args.temps, args.betas)

    mesh = None
    if args.mesh_dp > 1:
        from sde4mbrl_px4_tpu.parallel.mesh import make_mesh

        mesh = make_mesh((args.mesh_dp, 1))

    print(f"devices: {jax.devices()}")
    print(f"sweeping {grid.shape[0]} candidates x {args.steps} control "
          f"periods (K={static.samples}, iters={static.iters}"
          f"{', dp=' + str(args.mesh_dp) if mesh else ''}) ...")
    t0 = time.time()
    results = tune_mppi(cfg, grid, steps=args.steps, seed=args.seed,
                        crn=not args.no_crn, mesh=mesh)
    wall = time.time() - t0
    n_solves = grid.shape[0] * args.steps
    print(f"done in {wall:.1f}s ({n_solves} closed-loop solves, "
          f"{n_solves / wall:.0f} solves/s incl. compile)\n")

    print(f"{'rank':>4} {'sigma':>8} {'temp':>8} {'beta':>6} "
          f"{'mean err [m]':>13} {'final err [m]':>14}")
    for i, r in enumerate(results[: args.top]):
        print(f"{i + 1:>4} {r.sigma:>8.4g} {r.temperature:>8.4g} "
              f"{r.noise_beta:>6.3g} {r.mean_pos_err:>13.4f} "
              f"{r.final_pos_err:>14.4f}")

    best = results[0]
    print("\nbest candidate as a config block:\n")
    print(best.yaml_block(static.samples, static.iters))


if __name__ == "__main__":
    main()
