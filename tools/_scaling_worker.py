"""Worker for the localhost process-scaling sweep (tools/bench_scaling.py
--process-sweep). One OS process of an N-process jax.distributed cluster
on CPU: joins the cluster, runs a weak-scaled (fixed scenarios/device)
batched-MPC loop on the global (dp, mc) mesh, and reports per-process
timings (process 0 writes the JSON result).

argv: pid nproc port devices_per_proc b_per_dev iters steps out_json t_spawn
      [mode]

mode "dist" (default): join the jax.distributed cluster (global mesh).
mode "solo": same per-process workload WITHOUT any cluster — N independent
single-process programs. The dist/solo ratio at equal N isolates the
framework's multi-process dispatch overhead from plain host contention
(memory bandwidth), which affects both equally.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

# Virtual devices must be configured BEFORE jax import.
_DEV = int(sys.argv[4])
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={_DEV}")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    b_per_dev, iters, steps = (int(sys.argv[5]), int(sys.argv[6]),
                               int(sys.argv[7]))
    out_json, t_spawn = sys.argv[8], float(sys.argv[9])
    mode = sys.argv[10] if len(sys.argv) > 10 else "dist"

    from jax.sharding import NamedSharding, PartitionSpec as P

    from sde4mbrl_px4_tpu.core.types import hover_state
    from sde4mbrl_px4_tpu.io.config import load_yaml_config
    from sde4mbrl_px4_tpu.parallel.batched import make_batched_mpc
    from sde4mbrl_px4_tpu.parallel.distributed import (
        global_mesh, initialize_distributed)
    from sde4mbrl_px4_tpu.parallel.mesh import make_mesh

    if mode == "dist":
        assert initialize_distributed(f"localhost:{port}", nproc, pid)
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    cfg = load_yaml_config(os.path.join(here, "configs",
                                        "iris_posctrl_mpc.yaml"))
    cfg["apg_mpc"]["max_iter"] = iters
    cfg["apg_mpc"]["max_no_improvement_iter"] = iters

    if mode == "dist":
        mesh = global_mesh((jax.device_count(), 1))
    else:
        mesh = make_mesh((jax.local_device_count(), 1))
    reset_b, mpc_b, _ = make_batched_mpc(cfg, mesh)

    B = b_per_dev * (jax.device_count() if mode == "dist"
                     else jax.local_device_count())
    Bl = B // (nproc if mode == "dist" else 1)
    rs = np.random.RandomState(7)
    xs_full = np.tile(np.asarray(hover_state()), (B, 1)).astype(np.float32)
    xs_full[:, 0:3] += 0.5 * rs.randn(B, 3).astype(np.float32)
    rngs_full = np.asarray(jax.random.split(jax.random.PRNGKey(7), B))
    sl = slice(pid * Bl, (pid + 1) * Bl) if mode == "dist" else slice(0, B)
    sh = NamedSharding(mesh, P("dp"))
    xs = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp", None)), xs_full[sl])
    rngs = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp", None)), rngs_full[sl])
    ts = jax.make_array_from_process_local_data(
        sh, np.zeros((Bl if mode == "dist" else B,), np.float32))

    # launch-sync overhead: spawn -> cluster + mesh + inputs ready
    t_mesh = time.time() - t_spawn

    st = reset_b(xs, rngs, xs)
    sol = mpc_b(xs, rngs, st, ts, xs)
    jax.block_until_ready(sol.u_opt)
    t_first = time.time() - t_spawn  # includes compile

    t0 = time.perf_counter()
    for _ in range(steps):
        sol = mpc_b(xs, sol.rng, sol.opt_state, ts, xs)
    jax.block_until_ready(sol.u_opt)
    dt = (time.perf_counter() - t0) / steps

    n_steps = np.asarray(sol.opt_state.num_steps.addressable_shards[0].data)
    assert (n_steps > 0).all(), "degenerate solves"

    if mode == "solo":
        # every process reports its own independent rate (parent sums)
        with open(f"{out_json}.{pid}", "w") as f:
            json.dump({"solves_per_sec": round(B / dt, 1)}, f)
    elif pid == 0:
        with open(out_json, "w") as f:
            json.dump({
                "processes": nproc,
                "devices": jax.device_count(),
                "B_total": B,
                "ms_per_step": round(dt * 1e3, 2),
                "solves_per_sec": round(B / dt, 1),
                "solves_per_sec_per_device": round(
                    B / dt / jax.device_count(), 1),
                "launch_sync_s": round(t_mesh, 2),
                "first_step_s": round(t_first, 2),
            }, f)
    print(f"worker {pid}/{nproc} ({mode}): {B / dt:.1f} solves/s "
          f"(sync {t_mesh:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
