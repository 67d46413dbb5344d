"""Golden-trace determinism (SURVEY §4 implication): replaying the same
MPC_FULL_STATE sequence through two fresh engines yields identical command
sequences — the foundation for command-tolerance regression testing."""
import os

import numpy as np
import pytest
import yaml

from sde4mbrl_px4_tpu.core.frames import enu2ned
from sde4mbrl_px4_tpu.core.types import CONTROL_STATES, hover_state


def _tiny(repo_root, with_traj):
    cfg = yaml.safe_load(open(os.path.join(repo_root, "configs/iris_posctrl_mpc.yaml")))
    cfg["horizon"] = 5
    cfg["num_short_dt"] = 5
    cfg["apg_mpc"]["max_iter"] = 15
    cfg["apg_mpc"]["max_no_improvement_iter"] = 15
    cfg["learned_model_params"] = os.path.join(repo_root, "configs/models/iris_sde.pkl")
    if with_traj:
        cfg["trajectory_path"] = os.path.join(repo_root, "configs/trajs/lemniscate.csv")
    return cfg


@pytest.fixture(scope="module")
def cfg_paths(repo_root, tmp_path_factory):
    d = tmp_path_factory.mktemp("det")
    tp, pp = d / "t.yaml", d / "p.yaml"
    tp.write_text(yaml.safe_dump(_tiny(repo_root, True)))
    pp.write_text(yaml.safe_dump(_tiny(repo_root, False)))
    return str(tp), str(pp)


def _replay(cfg_paths, seed=0):
    """Deterministic state trace -> command trace via solve_once/pick."""
    from sde4mbrl_px4_tpu.engine.controller import RecedingHorizonController

    c = RecedingHorizonController(*cfg_paths, seed=seed, now_fn=lambda: 0.0)
    rs = np.random.RandomState(42)
    cmds = []
    x = np.array(enu2ned(hover_state()), np.float32)
    for k in range(6):
        x_k = x + 0.05 * rs.randn(13).astype(np.float32)
        x_k[6:10] /= np.linalg.norm(x_k[6:10])
        t_usec = 1e6 + k * 50_000.0
        c.solve_once(x_k, CONTROL_STATES["pos"], -1.0,
                     np.asarray(hover_state()), t_usec)
        u6, w4, idx = c.pick_command(t_usec)
        cmds.append(np.concatenate([u6, w4, [idx]]))
    return np.stack(cmds)


@pytest.mark.slow
def test_engine_replay_determinism(cfg_paths):
    a = _replay(cfg_paths, seed=0)
    b = _replay(cfg_paths, seed=0)
    np.testing.assert_array_equal(a, b)


def test_seed_changes_nothing_with_deterministic_config(cfg_paths):
    """num_particles=1 => mean dynamics: the seed only feeds Brownian draws,
    so the command trace is seed-independent (reference flight config)."""
    a = _replay(cfg_paths, seed=0)
    b = _replay(cfg_paths, seed=123)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_command_trace_is_sane(cfg_paths):
    tr = _replay(cfg_paths)
    u = tr[:, :6]
    w = tr[:, 6:10]
    assert np.all(np.isfinite(tr))
    assert np.all(u[:, :4] >= 1e-4 - 1e-7) and np.all(u[:, :4] <= 1.0 + 1e-7)
    np.testing.assert_allclose(u[:, 4:], 0.0)          # iris pads to 6
    np.testing.assert_allclose(w[:, 0], u[:, :4].mean(1), atol=1e-6)
    # hovering near equilibrium: thrust near the hover command
    assert abs(float(np.median(w[:, 0])) - 0.71) < 0.2


# ---- stored golden: command-sequence tolerance across COMMITS ---------------

_GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "goldens", "iris_posctrl_trace.npz")


def test_command_trace_matches_stored_golden(cfg_paths):
    """BASELINE's north star is bit-tolerance-matched command sequences.
    The in-run determinism tests above can't catch a refactor that changes
    the numbers deterministically — this pins the replay trace to a golden
    recorded in-tree. Regenerate deliberately after an intended numerical
    change with SDE4MBRL_REGEN_GOLDEN=1 (and justify it in the commit)."""
    tr = _replay(cfg_paths, seed=0)
    if os.environ.get("SDE4MBRL_REGEN_GOLDEN") == "1":
        os.makedirs(os.path.dirname(_GOLDEN), exist_ok=True)
        np.savez(_GOLDEN, trace=tr)
        pytest.skip("golden regenerated")
    if not os.path.exists(_GOLDEN):
        pytest.fail("golden trace missing — run with SDE4MBRL_REGEN_GOLDEN=1")
    ref = np.load(_GOLDEN)["trace"]
    assert ref.shape == tr.shape
    # f32 CPU XLA is deterministic for a fixed jaxlib; across jaxlib
    # versions op fusion may reassociate — hence tolerance, not equality.
    np.testing.assert_allclose(tr, ref, atol=1e-4, rtol=1e-4)


_GOLDEN_TRAJ = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "goldens", "iris_traj_trace.npz")


def test_traj_trace_matches_stored_golden(cfg_paths):
    """Same anchor for the TRAJECTORY mode (exercises state_from_traj
    windowing + the traj solver's warm-start chain across commits)."""
    from sde4mbrl_px4_tpu.engine.controller import RecedingHorizonController

    c = RecedingHorizonController(*cfg_paths, seed=0, now_fn=lambda: 0.0)
    cmds = []
    x = np.array(enu2ned(hover_state()), np.float32)
    for k in range(6):
        t_usec = 1e6 + k * 50_000.0
        c.solve_once(x, CONTROL_STATES["traj"], 0.3 + 0.05 * k,
                     np.asarray(hover_state()), t_usec)
        u6, w4, idx = c.pick_command(t_usec)
        cmds.append(np.concatenate([u6, w4, [idx]]))
    tr = np.stack(cmds)
    if os.environ.get("SDE4MBRL_REGEN_GOLDEN") == "1":
        os.makedirs(os.path.dirname(_GOLDEN_TRAJ), exist_ok=True)
        np.savez(_GOLDEN_TRAJ, trace=tr)
        pytest.skip("golden regenerated")
    if not os.path.exists(_GOLDEN_TRAJ):
        pytest.fail("golden trace missing — run with SDE4MBRL_REGEN_GOLDEN=1")
    ref = np.load(_GOLDEN_TRAJ)["trace"]
    np.testing.assert_allclose(tr, ref, atol=1e-4, rtol=1e-4)
