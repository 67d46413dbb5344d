#!/usr/bin/env python
"""A/B the mega-kernel per-iteration cost across solver-feature variants.

Isolates which of {momentum-restart counter, carried t0, compile noise}
moved the per-iter time (chained cold solves, fixed 154-step problem).
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
from sde4mbrl_px4_tpu.ops.pallas.apg_kernel import pallas_apg_solve

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
K = 10


def chain_time(fn, init_carry, label, n=5):
    def chained(carry):
        def body(c, _):
            return fn(c), 0.0
        c, _ = jax.lax.scan(body, carry, jnp.arange(K))
        return c

    jc = jax.jit(chained)
    t0 = time.time()
    c = jc(init_carry)
    jax.block_until_ready(jax.tree.leaves(c)[0])
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        c = jc(c)
    jax.block_until_ready(jax.tree.leaves(c)[0])
    per = (time.perf_counter() - t0) / (n * K)
    print(f"{label:28s} {per*1e3:7.3f} ms/invocation  (compile {compile_s:.0f}s)",
          flush=True)
    return per


def main():
    print(f"devices: {jax.devices()}", flush=True)
    cfg, (reset_fn, mpc_fn), sft, b = load_mpc_from_cfgfile(
        os.path.join(HERE, "configs", "iris_traj_mpc.yaml"))
    dt = float(cfg["_time_steps"][0])
    rng = jax.random.PRNGKey(0)
    T0 = 3.0
    x = enu2ned(sft(T0))
    st0 = reset_fn(x, rng, x)
    H = int(b.time_steps.shape[0])
    noise = jnp.zeros((1, H, 13), jnp.float32)
    u_prev = st0.yk[0]

    def make_mega(apg, **kw):
        def mega(c):
            k, _ = c
            st = pallas_apg_solve(
                b.model, b.params, b.cost_params, apg, b.time_steps,
                x, enu2ned(sft(T0 + k * dt + b.knot_times)), u_prev, noise, 1,
                b.lb, b.ub, st0.yk, **kw)
            if kw.get("return_traj"):
                st = st[0]
            return (k + 1.0, st.num_steps)
        return mega

    variants = [
        ("base (restart on)", b.apg_config, {}),
        ("momentum_restart off", b.apg_config._replace(momentum_restart=False), {}),
        ("restart on + return_traj", b.apg_config, {"return_traj": True}),
    ]
    for label, apg, kw in variants:
        t = chain_time(make_mega(apg, **kw), (jnp.float32(0), jnp.float32(0)),
                       label)
        steps = float(jax.jit(make_mega(apg, **kw))((jnp.float32(0),
                                                     jnp.float32(0)))[1])
        print(f"  steps={steps:.0f}  per-iter ~{(t*1e3)/max(steps,1):.4f} ms "
              "(incl. fixed; steps from call 0 only)", flush=True)

    # ---- clean per-iter: force EXACTLY N iterations (no early exit) -------
    print("\nforced-iteration per-iter (atol=rtol=0, no stagnation exit):",
          flush=True)
    for label, mr in (("restart on", True), ("restart off", False)):
        ts = {}
        for n_it in (1, 100):
            apg = b.apg_config._replace(
                momentum_restart=mr, max_iter=n_it, atol=0.0, rtol=0.0,
                max_no_improvement_iter=10**6)
            ts[n_it] = chain_time(make_mega(apg),
                                  (jnp.float32(0), jnp.float32(0)),
                                  f"  {label} max_iter={n_it}")
        per = (ts[100] - ts[1]) / 99.0
        print(f"  {label}: per-iter {per*1e3:.4f} ms, fixed "
              f"~{(ts[1] - per)*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
