#!/usr/bin/env python
"""A/B momentum_restart on the WARM receding-horizon chained workload
(the bench's headline loop): ms/solve and mean steps/solve."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sde4mbrl_px4_tpu.compile_cache import ensure_compile_cache

ensure_compile_cache()

import jax
import jax.numpy as jnp

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
            return (x_evol[1], rng1, st1), st1.num_steps

        (xf, rngf, stf), steps = jax.lax.scan(
            body, (x, rng, st), jnp.arange(K, dtype=jnp.float32))
        return xf, rngf, stf, steps

    jc = jax.jit(chain)
    t_c = time.time()
    out = jc(x0, rng, st0, jnp.float32(T0))
    jax.block_until_ready(out[0])
    compile_s = time.time() - t_c
    xf, rngf, stf, steps = out
    t = T0 + K * dt
    t0 = time.perf_counter()
    n = 5
    all_steps = []
    for _ in range(n):
        xf, rngf, stf, steps = jc(xf, rngf, stf, jnp.float32(t))
        all_steps.append(steps)
        t += K * dt
    jax.block_until_ready(xf)
    per = (time.perf_counter() - t0) / (n * K)
    import numpy as np
    s = np.concatenate([np.asarray(a) for a in all_steps])
    print(f"{label:22s} {per*1e3:6.2f} ms/solve ({1/per:5.1f}/s)  "
          f"steps mean={s.mean():.0f} p50={np.percentile(s,50):.0f} "
          f"max={s.max():.0f}  (compile {compile_s:.0f}s)", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    run("restart on (default)")
    run("restart off", lambda c: c["apg_mpc"].__setitem__("momentum_restart",
                                                          False))


if __name__ == "__main__":
    main()
