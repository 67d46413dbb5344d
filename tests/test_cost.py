"""Unit tests for cost assembly (L3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde4mbrl_px4_tpu.cost.cost import CostParams, make_cost_fn
from sde4mbrl_px4_tpu.core.types import hover_state


def _cfg(n_u=4, **over):
    cp = {
        "uref": [0.5] * n_u,
        "uerr": 1.0,
        "perr": [1.0, 1.0, 2.0],
        "verr": [1.0, 1.0, 1.0],
        "qerr": [1.0, 1.0, 1.0],
        "werr": [1.0, 1.0, 1.0],
        "res_mult": 0.0,
        "u_slew_coeff": 0.0,
    }
    cp.update(over.pop("cost_params", {}))
    cfg = {"cost_params": cp, "discount": over.pop("discount", 1.0)}
    return CostParams.from_config(cfg, n_u)


def _paths(H, x=None):
    x = hover_state() if x is None else x
    return jnp.broadcast_to(x, (1, H + 1, 13))


def test_zero_at_reference():
    H = 5
    cp = _cfg()
    cost = make_cost_fn(cp, jnp.full((H,), 0.05))
    xp = _paths(H)
    u = jnp.broadcast_to(cp.uref, (H, 4))
    ref = jnp.broadcast_to(hover_state(), (H + 1, 13))
    assert float(cost(xp, None, u, ref)) == pytest.approx(0.0, abs=1e-10)


def test_position_error_weighting():
    H = 3
    cp = _cfg()
    cost = make_cost_fn(cp, jnp.full((H,), 0.05))
    x = hover_state().at[2].set(1.0)  # z offset of 1
    xp = _paths(H, x)
    u = jnp.broadcast_to(cp.uref, (H, 4))
    ref = jnp.broadcast_to(hover_state(), (H + 1, 13))
    # perr_z = 2, H stages => 2 * 1^2 * 3 = 6
    assert float(cost(xp, None, u, ref)) == pytest.approx(6.0, rel=1e-6)


def test_discount():
    H = 3
    cp = _cfg(discount=0.5)
    cost = make_cost_fn(cp, jnp.full((H,), 0.05))
    x = hover_state().at[0].set(1.0)
    xp = _paths(H, x)
    u = jnp.broadcast_to(cp.uref, (H, 4))
    ref = jnp.broadcast_to(hover_state(), (H + 1, 13))
    # perr_x=1: sum over k=1..3 of 0.5^k = 0.5+0.25+0.125
    assert float(cost(xp, None, u, ref)) == pytest.approx(0.875, rel=1e-6)


def test_control_effort():
    H = 2
    cp = _cfg()
    cost = make_cost_fn(cp, jnp.full((H,), 0.05))
    xp = _paths(H)
    u = jnp.broadcast_to(cp.uref + 0.1, (H, 4))
    ref = jnp.broadcast_to(hover_state(), (H + 1, 13))
    # uerr=1: 4 inputs * 0.1^2 * 2 stages = 0.08
    assert float(cost(xp, None, u, ref)) == pytest.approx(0.08, rel=1e-5)


def test_slew_penalty():
    H = 3
    cp = _cfg(cost_params={"u_slew_coeff": 2.0, "uerr": 0.0})
    cost = make_cost_fn(cp, jnp.full((H,), 0.05))
    xp = _paths(H)
    ref = jnp.broadcast_to(hover_state(), (H + 1, 13))
    u = jnp.stack([jnp.full(4, 0.5), jnp.full(4, 0.6), jnp.full(4, 0.6)])
    # u_prev defaults to uref=0.5: diffs are 0, 0.1, 0 per motor
    # 2.0 * 4 * 0.1^2 = 0.08
    assert float(cost(xp, None, u, ref)) == pytest.approx(0.08, rel=1e-5)


def test_slew_rate_constraint_penalty():
    H = 2
    dt = 0.05
    cp = _cfg(cost_params={
        "uerr": 0.0,
        "u_slew_constr": [[-1.0, 1.0]] * 4,
        "u_slew_constr_coeff": 10.0,
    })
    cost = make_cost_fn(cp, jnp.full((H,), dt))
    xp = _paths(H)
    ref = jnp.broadcast_to(hover_state(), (H + 1, 13))
    # rate = (0.6-0.5)/0.05 = 2.0 > hi=1.0 on all 4 motors at step 0
    u = jnp.stack([jnp.full(4, 0.6), jnp.full(4, 0.6)])
    expect = 10.0 * 4 * (2.0 - 1.0) ** 2
    assert float(cost(xp, None, u, ref)) == pytest.approx(expect, rel=1e-4)


def test_uncertainty_penalty():
    H = 2
    cp = _cfg(cost_params={"res_mult": 0.5, "uerr": 0.0})
    cost = make_cost_fn(cp, jnp.full((H,), 0.05))
    xp = _paths(H)
    ref = jnp.broadcast_to(hover_state(), (H + 1, 13))
    u = jnp.broadcast_to(cp.uref, (H, 4))
    sig = jnp.zeros((1, H, 13)).at[:, :, 3].set(2.0)
    # 0.5 * sum_k (2^2) = 0.5 * 8 = 4
    assert float(cost(xp, sig, u, ref)) == pytest.approx(4.0, rel=1e-5)


def test_attitude_error_double_cover():
    H = 2
    cp = _cfg()
    cost = make_cost_fn(cp, jnp.full((H,), 0.05))
    x = hover_state().at[6:10].set(jnp.array([-1.0, 0, 0, 0]))  # -q == q
    xp = _paths(H, x)
    u = jnp.broadcast_to(cp.uref, (H, 4))
    ref = jnp.broadcast_to(hover_state(), (H + 1, 13))
    assert float(cost(xp, None, u, ref)) == pytest.approx(0.0, abs=1e-9)


def test_particle_mean_reduction():
    H = 2
    cp = _cfg()
    cost = make_cost_fn(cp, jnp.full((H,), 0.05))
    u = jnp.broadcast_to(cp.uref, (H, 4))
    ref = jnp.broadcast_to(hover_state(), (H + 1, 13))
    x_off = hover_state().at[0].set(1.0)
    # Two particles: one on-target, one offset -> mean of (0, 2.0) = 1.0
    xp = jnp.stack([
        jnp.broadcast_to(hover_state(), (H + 1, 13)),
        jnp.broadcast_to(x_off, (H + 1, 13)),
    ])
    assert float(cost(xp, None, u, ref)) == pytest.approx(1.0, rel=1e-6)


def test_state_constraint_penalty():
    """state_constr schema (reference iris_sitl_traj_mpc.yaml:16-29):
    soft box on selected state components with slack scaling."""
    H = 2
    cfg = {
        "cost_params": {
            "uref": [0.5] * 4, "uerr": 0.0, "perr": [0., 0., 0.],
            "verr": [0.] * 3, "qerr": [0.] * 3, "werr": [0.] * 3,
            "res_mult": 0.0, "u_slew_coeff": 0.0,
        },
        "discount": 1.0,
        "state_constr": {
            "state_id": [3, 4],            # vx, vy
            "state_penalty": [10.0, 20.0],
            "slack_scaling": [2.0, 2.0],
            "state_bound": [[-0.5, 0.5], [-0.5, 0.5]],
            "slack_proximal": False,
            "constr_pen": 0.1,
        },
    }
    cp = CostParams.from_config(cfg, 4)
    cost = make_cost_fn(cp, jnp.full((H,), 0.05))
    x = hover_state().at[3].set(1.5)  # vx = 1.5 -> violation 1.0, scaled 0.5
    xp = jnp.broadcast_to(x, (1, H + 1, 13))
    u = jnp.broadcast_to(cp.uref, (H, 4))
    ref = jnp.broadcast_to(hover_state(), (H + 1, 13))
    # 0.1 * 10 * (0.5)^2 per stage * 2 stages = 0.5
    assert float(cost(xp, None, u, ref)) == pytest.approx(0.5, rel=1e-5)


def test_state_constraint_proximal_fields():
    """slack_proximal: True parses into the augmented-variable form
    (full behavior covered by tests/test_prox_slack.py)."""
    cfg = {
        "cost_params": {"uref": [0.5] * 4},
        "state_constr": {
            "state_id": [3], "state_penalty": [1.0],
            "state_bound": [[-1, 1]], "slack_proximal": True,
        },
    }
    cp = CostParams.from_config(cfg, 4)
    assert cp.slack_sel.shape == (1, 13)
    assert cp.state_pen13 is None
    assert float(cp.slack_lo[0]) == -1.0 and float(cp.slack_hi[0]) == 1.0


def test_risk_lambda_prices_outcome_spread(iris_model):
    """SURVEY §7 L3 risk reduction (mean + lambda*std): wide-outcome plans
    cost more under lambda > 0, the gradient stays finite, and lambda
    absent leaves the value bit-identical to the risk-neutral mean."""
    from sde4mbrl_px4_tpu.cost.cost import make_cost_fn

    cp0 = _cfg()
    cp_r = _cfg(cost_params={"risk_lambda": 2.0})

    H, P = 6, 16
    ts = jnp.full((H,), 0.05)
    f0 = make_cost_fn(cp0, ts)
    fr = make_cost_fn(cp_r, ts)
    rng = jax.random.PRNGKey(0)
    x_ref = jnp.broadcast_to(hover_state(), (H + 1, 13))
    u = jnp.full((H, 4), 0.71)
    # spread paths: per-particle random walks around hover
    xp = jnp.broadcast_to(hover_state(), (P, H + 1, 13)) \
        + 0.1 * jax.random.normal(rng, (P, H + 1, 13))
    j0 = float(f0(xp, None, u, x_ref))
    jr = float(fr(xp, None, u, x_ref))
    assert jr > j0  # spread is priced

    # identical particles: spread term ~ 0 (sqrt(eps) only)
    xp_same = jnp.broadcast_to(xp[0], (P, H + 1, 13))
    assert abs(float(fr(xp_same, None, u, x_ref))
               - float(f0(xp_same, None, u, x_ref))) < 1e-3

    # gradient stays finite through the risk term
    g = jax.grad(lambda uu: fr(xp, None, uu, x_ref))(u)
    assert np.isfinite(np.asarray(g)).all()


def test_risk_lambda_solves_via_config(repo_root):
    import os

    from sde4mbrl_px4_tpu.core.types import hover_state as hs
    from sde4mbrl_px4_tpu.engine.mpc_loader import make_mpc_from_config
    from sde4mbrl_px4_tpu.io.config import load_yaml_config

    cfg = load_yaml_config(os.path.join(repo_root, "configs/iris_posctrl_mpc.yaml"))
    cfg["num_particles"] = 8
    cfg["cost_params"]["risk_lambda"] = 1.0
    cfg["apg_mpc"]["max_iter"] = 5
    cfg, (reset_fn, mpc_fn), _, _ = make_mpc_from_config(cfg)
    x0 = hs()
    rng = jax.random.PRNGKey(0)
    st = reset_fn(x0, rng, x0)
    sol = jax.jit(mpc_fn)(x0, rng, st, jnp.float32(0.0), x0)
    assert np.isfinite(np.asarray(sol.u_opt)).all()
    assert np.isfinite(float(sol.opt_state.opt_cost))
