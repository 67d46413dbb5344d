"""Worker for the 2-process FleetEngine test (tests/test_distributed.py).

argv = [process_id, num_processes, port, out_npy, cfg_yaml]. Each process
serves its local half of an 8-vehicle fleet over the global mesh.
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import yaml  # noqa: E402


def main():
    pid, nproc, port, out_npy, cfg_yaml = sys.argv[1:6]
    pid, nproc = int(pid), int(nproc)

    from sde4mbrl_px4_tpu.parallel.distributed import (
        global_mesh,
        initialize_distributed,
    )

    assert initialize_distributed(f"localhost:{port}", nproc, pid)

    from sde4mbrl_px4_tpu.core.frames import ned2enu
    from sde4mbrl_px4_tpu.core.types import hover_state
    from sde4mbrl_px4_tpu.parallel.fleet import FleetEngine

    with open(cfg_yaml) as f:
        cfg = yaml.safe_load(f)

    mesh = global_mesh((jax.device_count(), 1))
    B = 8
    fleet = FleetEngine(cfg, mesh, batch=B, seed=0, pipeline=False)
    Bl = B // nproc

    rs = np.random.RandomState(7)
    states = np.tile(np.asarray(hover_state()), (B, 1)).astype(np.float32)
    targets = states.copy()
    targets[:, 0:2] += rs.uniform(-1.0, 1.0, (B, 2)).astype(np.float32)
    targets_enu = np.stack([np.asarray(ned2enu(t)) for t in targets])
    sl = slice(pid * Bl, (pid + 1) * Bl)

    local_states = states[sl]
    for _ in range(4):
        u, x_evol, _ = fleet.step(local_states, targets_enu[sl])
        assert u.shape == (Bl, 4), u.shape
        local_states = np.asarray(x_evol[:, 1, :])
    np.save(out_npy + f".p{pid}", local_states)
    print(f"fleet worker {pid}: ok", flush=True)


if __name__ == "__main__":
    main()
