#!/usr/bin/env python
"""A/B the receding-horizon warm-start tail guess (``warm_shift`` config
key: repeat vs extrapolate) on the chained flight workload: ms/solve and
steps/solve. Fewer APG steps at equal tracking = direct headline gain."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sde4mbrl_px4_tpu.compile_cache import ensure_compile_cache

ensure_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from sde4mbrl_px4_tpu.core.frames import enu2ned
from sde4mbrl_px4_tpu.engine.mpc_loader import make_mpc_from_config
from sde4mbrl_px4_tpu.io.config import load_yaml_config

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
K = 10


def run(label, mutate=None):
    cfg = load_yaml_config(os.path.join(HERE, "configs", "iris_traj_mpc.yaml"))
    if mutate:
        mutate(cfg)
    cfg, (reset_fn, mpc_fn), sft, b = make_mpc_from_config(cfg)
    dt = float(cfg["_time_steps"][0])
    T0 = 3.0
    x0 = enu2ned(sft(T0))
    rng = jax.random.PRNGKey(0)
    st0 = reset_fn(x0, rng, x0)

    def chain(x, rng, st, t_start):
        def body(carry, k):
            x, rng, st = carry
            u, st1, rng1, x_evol = mpc_fn(x, rng, st, t_start + k * dt, x)
            # carry tracking error alongside step count
            return (x_evol[1], rng1, st1), (st1.num_steps, x_evol[1])

        (xf, rngf, stf), (steps, xs) = jax.lax.scan(
            body, (x, rng, st), jnp.arange(K, dtype=jnp.float32))
        return xf, rngf, stf, steps, xs

    jc = jax.jit(chain)
    t_c = time.time()
    out = jc(x0, rng, st0, jnp.float32(T0))
    jax.block_until_ready(out[0])
    compile_s = time.time() - t_c
    xf, rngf, stf, steps, _ = out
    t = T0 + K * dt
    n = 5
    all_steps, all_xs, all_t = [], [], []
    t0 = time.perf_counter()
    for _ in range(n):
        xf, rngf, stf, steps, xs = jc(xf, rngf, stf, jnp.float32(t))
        all_steps.append(steps)    # device handles; fetched after the timer
        all_xs.append(xs)
        all_t.append(t)
        t += K * dt
    jax.block_until_ready(xf)
    per = (time.perf_counter() - t0) / (n * K)
    all_err = []
    for tr, xs in zip(all_t, all_xs):
        ref = np.stack([np.asarray(enu2ned(sft(tr + (k + 1) * dt)))
                        for k in range(K)])
        all_err.append(np.linalg.norm(np.asarray(xs)[:, :3] - ref[:, :3],
                                      axis=-1))
    all_steps = [np.asarray(s) for s in all_steps]
    s = np.concatenate(all_steps)
    e = np.concatenate(all_err)
    print(f"{label:22s} {per*1e3:6.2f} ms/solve ({1/per:5.1f}/s)  "
          f"steps mean={s.mean():.0f} p50={np.percentile(s,50):.0f} "
          f"max={s.max():.0f}  track mean={e.mean():.3f}m max={e.max():.3f}m"
          f"  (compile {compile_s:.0f}s)", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    run("repeat (default)")
    def mut(c):
        c["warm_shift"] = "extrapolate"
    run("extrapolate", mut)


if __name__ == "__main__":
    main()
