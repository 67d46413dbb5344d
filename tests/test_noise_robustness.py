"""Uncertainty-aware planning near state constraints: the property behind
examples/noise_robustness.py, pinned as a single deterministic solve.

A state_constr penalty is one-sided: a mean-dynamics planner (particles=1)
pays nothing until its MEAN trajectory crosses the bound, so it parks the
plan right at the reference even when that sits inside the noise band. A
particle planner rolls noisy paths, so the expected penalty is nonzero
BEFORE the mean crosses — the optimal plan backs off the bound in
proportion to the modeled diffusion. (Reference capability surface:
``num_particles``, ``iris_sitl_traj_mpc.yaml:52`` + the commented
``state_constr`` block, ``:16-29``.)"""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde4mbrl_px4_tpu.core.frames import ned2enu
from sde4mbrl_px4_tpu.core.types import hover_state

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLOOR_Z = -1.2


@pytest.fixture(scope="module")
def noisy_cfg(repo_root):
    """posctrl config with an altitude floor + inflated diffusion."""
    import yaml

    from sde4mbrl_px4_tpu.models.params_io import load_params, save_params

    cfg = yaml.safe_load(
        open(os.path.join(repo_root, "configs/iris_posctrl_mpc.yaml")))
    cfg["learned_model_params"] = os.path.join(
        repo_root, "configs/models/iris_sde.pkl")
    cfg["apg_mpc"]["max_iter"] = 60
    cfg["apg_mpc"]["max_no_improvement_iter"] = 60
    cfg["state_constr"] = {
        "state_id": [2], "state_bound": [[-5.0, FLOOR_Z]],
        "state_penalty": [300.0], "slack_scaling": [1.0],
    }
    params, meta = load_params(cfg["learned_model_params"])
    params = dict(params)
    params["diffusion_log_scale"] = np.float32(np.log(0.6))
    tmp = tempfile.NamedTemporaryFile(suffix=".pkl", delete=False)
    save_params(tmp.name, params, meta)
    cfg["learned_model_params"] = tmp.name
    yield cfg
    os.unlink(tmp.name)


def _terminal_z(cfg):
    from sde4mbrl_px4_tpu.engine.mpc_loader import make_mpc_from_config

    _, (reset_fn, mpc_fn), _, _ = make_mpc_from_config(dict(cfg))
    tgt = np.asarray(hover_state(), np.float32).copy()
    tgt[2] = -1.25                          # 5 cm above the floor: inside
    tgt_j = ned2enu(jnp.asarray(tgt))       # the noise band by design
    x0 = jnp.asarray(tgt)
    rng = jax.random.PRNGKey(0)
    st = reset_fn(x0, rng, tgt_j)
    sol = mpc_fn(x0, rng, st, 0.0, xdes=tgt_j)
    # steady tail of the planned mean trajectory
    return float(jnp.mean(sol.x_evol[-5:, 2]))


def test_particles_back_off_the_floor(noisy_cfg):
    z_mean = _terminal_z(dict(noisy_cfg))
    cfg_p = dict(noisy_cfg)
    cfg_p["num_particles"] = 32
    cfg_p["antithetic"] = True
    z_part = _terminal_z(cfg_p)
    # mean planner parks essentially at the reference; the particle planner
    # plans measurably HIGHER (more negative NED z) to keep the noisy paths
    # off the one-sided penalty
    assert z_part < z_mean - 0.01, (z_part, z_mean)
    # and the risk-averse reduction backs off at least as far
    cfg_r = dict(cfg_p)
    cfg_r["cost_params"] = dict(cfg_r["cost_params"], risk_lambda=2.0)
    z_risk = _terminal_z(cfg_r)
    assert z_risk < z_mean - 0.01, (z_risk, z_mean)
