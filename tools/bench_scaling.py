#!/usr/bin/env python
"""Scenario-DP scaling sweep (BASELINE config 5 instrumentation).

Measures batched MPC solve throughput (solves/s) as the scenario count
grows over the available device mesh, and weak-scaling efficiency across
mesh sizes. Runs anywhere:

- one TPU chip: amortization curve (B=1 .. 512 on one device);
- virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8
  + --cpu): validates the sharded path and gives a CPU weak-scaling curve;
- multi-host TPU (future rounds): same script, `jax.distributed.initialize`
  first.

Usage: python tools/bench_scaling.py [--cpu] [--max-b 512] [--iters 50]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--virtual-devices", type=int, default=0,
                    help="force N virtual CPU devices (implies --cpu)")
    ap.add_argument("--max-b", type=int, default=256)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--coordinator", default=None,
                    help="multi-host: coordinator host:port "
                         "(or env SDE4MBRL_COORDINATOR)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    if args.virtual_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual_devices}"
        )
    import jax

    if args.cpu or args.virtual_devices:
        jax.config.update("jax_platforms", "cpu")
    # Multi-host: one mesh over all processes' devices (DCN between hosts);
    # must run before any JAX op.
    from sde4mbrl_px4_tpu.parallel.distributed import initialize_distributed

    initialize_distributed(args.coordinator, args.num_processes, args.process_id)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sde4mbrl_px4_tpu.io.config import load_yaml_config
    from sde4mbrl_px4_tpu.parallel.batched import make_batched_mpc, make_batch_inputs
    from sde4mbrl_px4_tpu.parallel.mesh import make_mesh

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    cfg = load_yaml_config(os.path.join(here, "configs", "iris_posctrl_mpc.yaml"))
    cfg["apg_mpc"]["max_iter"] = args.iters
    cfg["apg_mpc"]["max_no_improvement_iter"] = args.iters

    n_dev = len(jax.devices())
    mesh = make_mesh((n_dev, 1))
    print(f"devices={n_dev} mesh={mesh.shape}", file=sys.stderr)
    reset_b, mpc_b, _ = make_batched_mpc(cfg, mesh)

    results = []
    B = n_dev
    while B <= args.max_b:
        if jax.process_count() > 1:
            from sde4mbrl_px4_tpu.parallel.distributed import global_batch_inputs

            xs, rngs, ts = global_batch_inputs(mesh, B, spread=0.5)
        else:
            xs, rngs = make_batch_inputs(mesh, B, spread=0.5)
            ts = jax.device_put(jnp.zeros((B,)), NamedSharding(mesh, P("dp")))
        st = reset_b(xs, rngs, xs)
        sol = mpc_b(xs, rngs, st, ts, xs)
        jax.block_until_ready(sol.u_opt)
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            sol = mpc_b(xs, sol.rng, sol.opt_state, ts, xs)
        jax.block_until_ready(sol.u_opt)
        dt = (time.perf_counter() - t0) / n
        thr = B / dt
        results.append({"B": B, "ms_per_step": round(dt * 1e3, 2),
                        "solves_per_sec": round(thr, 1)})
        print(f"B={B:5d}  {dt*1e3:8.1f} ms/step  {thr:9.1f} solves/s",
              file=sys.stderr)
        B *= 4

    base = results[0]["solves_per_sec"] / max(results[0]["B"], 1)
    for r in results:
        r["efficiency_vs_B1"] = round(r["solves_per_sec"] / (base * r["B"]), 3)
    print(json.dumps({"devices": n_dev, "iters": args.iters, "sweep": results}))


if __name__ == "__main__":
    main()
