"""Fleet serving engine: B vehicles per chip over the dp mesh (L6)."""
import os

import jax
import numpy as np
import pytest
import yaml

from sde4mbrl_px4_tpu.core.types import hover_state
from sde4mbrl_px4_tpu.io.config import load_yaml_config
from sde4mbrl_px4_tpu.parallel.fleet import FleetEngine
from sde4mbrl_px4_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def fleet(repo_root):
    cfg = load_yaml_config(os.path.join(repo_root, "configs/iris_posctrl_mpc.yaml"))
    cfg["apg_mpc"]["max_iter"] = 15
    cfg["apg_mpc"]["max_no_improvement_iter"] = 15
    mesh = make_mesh((min(4, len(jax.devices())), 1),
                     devices=jax.devices()[: min(4, len(jax.devices()))])
    return FleetEngine(cfg, mesh, batch=8, seed=0)


@pytest.mark.slow
def test_fleet_tracks_per_vehicle_targets(repo_root):
    """8 vehicles with distinct setpoints all converge toward their own
    targets under closed-loop fleet stepping.

    pipeline=False here: the blocking mode gives a clean one-model-step-
    per-tick plant chain (pipelined feedback of the PREVIOUS tick's x_evol
    would interleave two chains at half the physical rate)."""
    cfg = load_yaml_config(os.path.join(repo_root, "configs/iris_posctrl_mpc.yaml"))
    cfg["apg_mpc"]["max_iter"] = 15
    cfg["apg_mpc"]["max_no_improvement_iter"] = 15
    mesh = make_mesh((min(4, len(jax.devices())), 1),
                     devices=jax.devices()[: min(4, len(jax.devices()))])
    fleet = FleetEngine(cfg, mesh, batch=8, seed=0, pipeline=False)
    B = fleet.B
    rs = np.random.RandomState(0)
    states = np.tile(np.asarray(hover_state()), (B, 1)).astype(np.float32)
    targets = states.copy()
    targets[:, 0:2] += rs.uniform(-1.0, 1.0, (B, 2)).astype(np.float32)
    # targets arrive in the ENU API frame (position-hold configs convert)
    from sde4mbrl_px4_tpu.core.frames import ned2enu

    targets_enu = np.stack([np.asarray(ned2enu(t)) for t in targets])

    err0 = np.linalg.norm(states[:, 0:3] - targets[:, 0:3], axis=1)
    for k in range(70):   # 3.5 s of physical time at the 50 ms tick
        # (the posctrl weights give a gentle controller: halving a ~1 m
        # error takes ~3 s)
        u, x_evol, age = fleet.step(states, targets_enu)
        assert u.shape == (B, 4)
        assert np.isfinite(u).all()
        assert (u >= 1e-4 - 1e-6).all() and (u <= 1.0 + 1e-6).all()
        # plant = model prediction (perfect-model fleet sim)
        states = np.asarray(x_evol[:, 1, :])
    err = np.linalg.norm(states[:, 0:3] - targets[:, 0:3], axis=1)
    assert (err < 0.5 * err0 + 0.05).all(), (err0, err)


def test_fleet_pipelined_age(fleet):
    """Pipelined fleet steps return the previous tick's plans (age > 0)."""
    B = fleet.B
    states = np.tile(np.asarray(hover_state()), (B, 1)).astype(np.float32)
    fleet.reset(states)
    _, _, age0 = fleet.step(states, states)
    _, _, age1 = fleet.step(states, states)
    assert age0 == 0.0          # cold start collects its own solve
    assert age1 > 0.0           # steady state returns plan k-1


def test_fleet_batch_must_divide_mesh(repo_root):
    cfg = load_yaml_config(os.path.join(repo_root, "configs/iris_posctrl_mpc.yaml"))
    mesh = make_mesh((4, 1), devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="divide"):
        FleetEngine(cfg, mesh, batch=6)
