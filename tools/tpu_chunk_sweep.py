#!/usr/bin/env python
"""Chunk-size sweep for the P=1024 fused mega-kernel on the real chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sde4mbrl_px4_tpu.compile_cache import ensure_compile_cache

ensure_compile_cache()

import jax
import jax.numpy as jnp

from sde4mbrl_px4_tpu.core.types import hover_state
from sde4mbrl_px4_tpu.cost.cost import CostParams
from sde4mbrl_px4_tpu.engine.mpc_loader import make_mpc_from_config
from sde4mbrl_px4_tpu.io.config import load_yaml_config
from sde4mbrl_px4_tpu.ops.pallas.apg_kernel import pallas_apg_solve

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
P = 1024
ITERS = 20


def main():
    print(f"devices: {jax.devices()}", flush=True)
    cfg = load_yaml_config(os.path.join(HERE, "configs", "iris_posctrl_mpc.yaml"))
    _, _, _, b = make_mpc_from_config(dict(cfg), use_pallas=False)
    apg = b.apg_config._replace(max_iter=ITERS, max_no_improvement_iter=ITERS,
                                atol=0.0, rtol=0.0)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.asarray(hover_state())
    H, n = 20, 4
    x_ref = jnp.broadcast_to(hover_state(), (H + 1, 13))
    noise = jnp.transpose(jax.random.normal(rng, (H, P, 13)), (1, 0, 2))
    u_init = jnp.broadcast_to(b.cost_params.uref, (H, n)) + 0.02

    for chunk in (int(a) for a in sys.argv[1:]) if len(sys.argv) > 1 else (512, 256, 0):
        try:
            t0 = time.time()

            def solve(u0):
                return pallas_apg_solve(
                    b.model, b.params, b.cost_params, apg, b.time_steps, x0,
                    x_ref, b.cost_params.uref, noise, P, b.lb, b.ub, u0,
                    deterministic=False, chunk=chunk,
                )

            js = jax.jit(solve)
            st = js(u_init)
            jax.block_until_ready(st.yk)
            compile_s = time.time() - t0
            t0 = time.perf_counter()
            nrep = 5
            for _ in range(nrep):
                st = js(u_init)
            jax.block_until_ready(st.yk)
            dt = (time.perf_counter() - t0) / nrep
            print(f"chunk={chunk}: compile {compile_s:.0f}s, "
                  f"{dt*1e3:.1f} ms/{ITERS}-iter solve "
                  f"({dt/ITERS*1e3:.2f} ms/iter, 200-iter est {dt*10*1e3:.0f} ms)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"chunk={chunk}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
