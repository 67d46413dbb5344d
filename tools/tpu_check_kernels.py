#!/usr/bin/env python
"""TPU compile+timing check for the fused kernels after structural changes.

Run on the real chip (no platform override). Interpret-mode parity tests
do NOT exercise Mosaic lowering, so every kernel code-path VARIANT must
compile on the device once (a gather in the prox-slack branch once slipped
through a fully-green CPU suite). Checks:
1. P=1 mega-kernel solve (flagship path) still compiles and matches its
   previous latency class;
2. P=1024 chunked (chunk=128) fused solve compiles and reports latency at
   the reference's 200-iteration budget (VERDICT round-1 item 2);
3. proximal-slack state constraints (nZ > n_u decision columns);
4. penalty-form state constraints (has_sc without prox);
5. small-P stochastic kernel (noise branch, P=64 fused).
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
from sde4mbrl_px4_tpu.engine.mpc_loader import load_mpc_from_cfgfile, make_mpc_from_config
from sde4mbrl_px4_tpu.io.config import load_yaml_config
from sde4mbrl_px4_tpu.core.types import hover_state

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def timeit(jm, *args, n=10):
    sol = jm(*args)
    jax.block_until_ready(sol.u_opt)
    t0 = time.perf_counter()
    for _ in range(n):
        sol = jm(args[0], sol.rng, sol.opt_state, *args[3:])
    jax.block_until_ready(sol.u_opt)
    return (time.perf_counter() - t0) / n, sol


def main():
    print(f"devices: {jax.devices()}", flush=True)

    # 1) flagship P=1 mega path
    t0 = time.time()
    cfg, (reset_fn, mpc_fn), sft, b = load_mpc_from_cfgfile(
        os.path.join(HERE, "configs", "iris_traj_mpc.yaml"))
    rng = jax.random.PRNGKey(0)
    x = enu2ned(sft(0.0))
    st = reset_fn(x, rng, x)
    jm = jax.jit(mpc_fn)
    dt_s, sol = timeit(jm, x, rng, st, jnp.float32(0.0), x)
    print(f"P=1 mega: compile+warm {time.time()-t0:.0f}s, "
          f"{dt_s*1e3:.2f} ms/solve, steps={float(sol.opt_state.num_steps):.0f}",
          flush=True)

    # 2) P=1024 chunked fused path, 200-iter budget
    t0 = time.time()
    cfg = load_yaml_config(os.path.join(HERE, "configs", "iris_posctrl_mpc.yaml"))
    cfg["num_particles"] = 1024
    cfg["apg_mpc"]["max_iter"] = 200
    cfg["apg_mpc"]["max_no_improvement_iter"] = 200
    # Without pallas_chunk the loader reroutes P>128 to the XLA path
    # (mpc_loader particle-axis routing) — this check exists to compile the
    # CHUNKED Mosaic kernel, so force it.
    cfg["pallas_chunk"] = 128
    _, (reset_fn, mpc_fn), _, _ = make_mpc_from_config(dict(cfg), use_pallas=True)
    x0 = hover_state()
    st = reset_fn(x0, rng, x0)
    jm = jax.jit(mpc_fn)
    dt_s, sol = timeit(jm, x0, rng, st, jnp.float32(0.0), x0, n=5)
    print(f"P=1024 chunked mega (200 iters): compile+warm {time.time()-t0:.0f}s, "
          f"{dt_s*1e3:.1f} ms/solve, steps={float(sol.opt_state.num_steps):.0f}",
          flush=True)

    # 3) prox-slack branch + 4) penalty branch + 5) P=64 noise branch
    for label, mutate in (
        ("prox-slack", None),
        ("penalty-sc", lambda c: c["state_constr"].__setitem__("slack_proximal", False)),
        ("P=64 noise", lambda c: (c.pop("state_constr"),
                                  c.__setitem__("num_particles", 64))),
    ):
        t0 = time.time()
        cfg = load_yaml_config(
            os.path.join(HERE, "configs", "iris_constr_posctrl_mpc.yaml"))
        if mutate is not None:
            mutate(cfg)
        _, (reset_fn, mpc_fn), _, _ = make_mpc_from_config(dict(cfg), use_pallas=True)
        x0 = hover_state()
        st = reset_fn(x0, rng, x0)
        jm = jax.jit(mpc_fn)
        dt_s, sol = timeit(jm, x0, rng, st, jnp.float32(0.0), x0, n=5)
        print(f"{label}: compile+warm {time.time()-t0:.0f}s, "
              f"{dt_s*1e3:.2f} ms/solve, "
              f"steps={float(sol.opt_state.num_steps):.0f}", flush=True)

    # 6) MPPI via the fused kernel batch oracle (K=64 default)
    t0 = time.time()
    cfg = load_yaml_config(os.path.join(HERE, "configs", "iris_posctrl_mpc.yaml"))
    cfg["solver"] = "mppi"
    _, (reset_fn, mpc_fn), _, _ = make_mpc_from_config(dict(cfg), use_pallas=True)
    x0 = hover_state()
    st = reset_fn(x0, rng, x0)
    jm = jax.jit(mpc_fn)
    dt_s, sol = timeit(jm, x0, rng, st, jnp.float32(0.0), x0, n=5)
    print(f"MPPI K=64 oracle: compile+warm {time.time()-t0:.0f}s, "
          f"{dt_s*1e3:.2f} ms/solve", flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
