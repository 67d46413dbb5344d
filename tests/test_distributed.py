"""Multi-host (multi-process) execution: 2 localhost CPU processes x 2
virtual devices = a 4-device global mesh; the dp-sharded batched solve must
match a single-process run (SURVEY.md §2.15; BASELINE weak-scaling north
star). The reference's analogue of this no-hardware proof is SITL
(SURVEY.md §4)."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import yaml


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _tiny_cfg(repo_root):
    cfg = yaml.safe_load(open(os.path.join(repo_root, "configs/iris_posctrl_mpc.yaml")))
    cfg["horizon"] = 5
    cfg["num_short_dt"] = 5
    cfg["apg_mpc"]["max_iter"] = 5
    cfg["apg_mpc"]["max_no_improvement_iter"] = 5
    cfg["learned_model_params"] = os.path.join(repo_root, "configs/models/iris_sde.pkl")
    return cfg


@pytest.mark.timeout(600)
@pytest.mark.slow
def test_two_process_mesh_matches_single_process(repo_root, tmp_path):
    cfg = _tiny_cfg(repo_root)
    cfg_yaml = tmp_path / "pos.yaml"
    cfg_yaml.write_text(yaml.safe_dump(cfg))
    out_npy = tmp_path / "u_dist.npy"
    port = _free_port()

    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_dist_worker.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), str(out_npy),
             str(cfg_yaml)],
            env=env, cwd=repo_root,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    assert out_npy.exists()
    u_dist = np.load(out_npy)
    assert u_dist.shape == (8, 5, 4)

    # Single-process reference on this process's virtual-device mesh.
    import jax

    from sde4mbrl_px4_tpu.core.types import hover_state
    from sde4mbrl_px4_tpu.parallel.batched import make_batched_mpc
    from sde4mbrl_px4_tpu.parallel.mesh import make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh((4, 1), devices=jax.devices()[:4])
    reset_b, mpc_b, _ = make_batched_mpc(dict(cfg), mesh)
    B = 8
    rs = np.random.RandomState(7)
    xs = np.tile(np.asarray(hover_state()), (B, 1)).astype(np.float32)
    xs[:, 0:3] += 0.5 * rs.randn(B, 3).astype(np.float32)
    rngs = np.asarray(jax.random.split(jax.random.PRNGKey(7), B))
    sh = NamedSharding(mesh, P("dp", None))
    xs_d = jax.device_put(xs, sh)
    rngs_d = jax.device_put(rngs, sh)
    ts = jax.device_put(np.zeros((B,), np.float32), NamedSharding(mesh, P("dp")))
    st = reset_b(xs_d, rngs_d, xs_d)
    sol = mpc_b(xs_d, rngs_d, st, ts, xs_d)
    sol = mpc_b(xs_d, sol.rng, sol.opt_state, ts, xs_d)
    u_ref = np.asarray(sol.u_opt)

    np.testing.assert_allclose(u_dist, u_ref, rtol=1e-5, atol=1e-6)


@pytest.mark.timeout(600)
@pytest.mark.slow
def test_two_process_fleet_matches_single_process(repo_root, tmp_path):
    """FleetEngine over a 2-process mesh: each host steps its local half of
    the fleet; the closed-loop states must match the single-process fleet."""
    cfg = _tiny_cfg(repo_root)
    cfg_yaml = tmp_path / "pos.yaml"
    cfg_yaml.write_text(yaml.safe_dump(cfg))
    out = tmp_path / "fleet"
    port = _free_port()

    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_fleet_dist_worker.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), str(out),
             str(cfg_yaml)],
            env=env, cwd=repo_root,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"fleet worker failed:\n{o[-3000:]}"
    dist = np.concatenate([np.load(f"{out}.p0.npy"), np.load(f"{out}.p1.npy")])

    # single-process reference
    import jax

    from sde4mbrl_px4_tpu.core.frames import ned2enu
    from sde4mbrl_px4_tpu.core.types import hover_state
    from sde4mbrl_px4_tpu.parallel.fleet import FleetEngine
    from sde4mbrl_px4_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((4, 1), devices=jax.devices()[:4])
    fleet = FleetEngine(dict(cfg), mesh, batch=8, seed=0, pipeline=False)
    rs = np.random.RandomState(7)
    states = np.tile(np.asarray(hover_state()), (8, 1)).astype(np.float32)
    targets = states.copy()
    targets[:, 0:2] += rs.uniform(-1.0, 1.0, (8, 2)).astype(np.float32)
    targets_enu = np.stack([np.asarray(ned2enu(t)) for t in targets])
    for _ in range(4):
        u, x_evol, _ = fleet.step(states, targets_enu)
        states = np.asarray(x_evol[:, 1, :])

    np.testing.assert_allclose(dist, states, rtol=1e-5, atol=1e-6)
