#!/usr/bin/env python
"""Probe the diagonal Hessian of the MPC cost at a warm-converged iterate.

Motivation: the headline solve is iteration-bound and the iteration count
is set by the cost's conditioning along the horizon. If the diagonal
curvature varies strongly with horizon index h, a FIXED diagonal
preconditioner D ~ 1/diag(H) inside the APG step is a cheap conditioning
fix (box projection stays exact under a diagonal metric).

Prints the per-horizon-row mean diagonal curvature profile and its spread.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from sde4mbrl_px4_tpu.core.frames import enu2ned
from sde4mbrl_px4_tpu.engine.mpc_loader import load_mpc_from_cfgfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    cfg, (reset_fn, mpc_fn), sft, b = load_mpc_from_cfgfile(
        os.path.join(HERE, "configs", "iris_traj_mpc.yaml"))
    dt = float(cfg["_time_steps"][0])
    x0 = enu2ned(sft(0.0))
    rng = jax.random.PRNGKey(0)
    st = reset_fn(x0, rng, x0)
    # run a few receding-horizon solves to reach a warm converged iterate
    x, t = x0, 0.0
    jm = jax.jit(mpc_fn)
    for k in range(10):
        u, st, rng, x_evol = jm(x, rng, st, t, x)
        x = x_evol[1]
        t += dt

    # Cost closure at this (x, t): rebuilt from the bundle exactly as the
    # loader's mean-dynamics branch does (mpc_loader.py seq_cost).
    from sde4mbrl_px4_tpu.cost.cost import make_cost_fn
    from sde4mbrl_px4_tpu.ops.rollout import rollout_sde

    cost_fn = make_cost_fn(b.cost_params, b.time_steps)
    x_ref = enu2ned(sft(jnp.float32(t) + b.knot_times))
    u_prev = st.yk[0]
    rng_noise, _ = jax.random.split(rng)

    def oracle(u_seq):
        x_paths, sigmas = rollout_sde(
            b.model, b.params, x, u_seq, b.time_steps, rng_noise, 1,
            deterministic=True)
        return cost_fn(x_paths, sigmas, u_seq, x_ref, u_prev)

    u_star = st.yk
    g_fn = jax.grad(oracle)
    g0 = g_fn(u_star)
    H, n = u_star.shape
    eps = 1e-4

    def diag_entry(i):
        e = jnp.zeros((H * n,)).at[i].set(eps).reshape(H, n)
        return ((g_fn(u_star + e) - g0) / eps).reshape(-1)[i]

    d = jax.vmap(diag_entry)(jnp.arange(H * n)).reshape(H, n)
    d = np.asarray(d)
    print("per-row mean diag curvature (h = horizon index):")
    for h in range(H):
        print(f"  h={h:2d}  {d[h].mean():10.3f}   (per-motor: "
              + " ".join(f"{v:8.2f}" for v in d[h]) + ")")
    print(f"condition spread (max/min row mean): "
          f"{d.mean(axis=1).max() / max(d.mean(axis=1).min(), 1e-9):.1f}x")


if __name__ == "__main__":
    main()
