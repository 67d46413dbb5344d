"""Unit tests for the SDE rollout (L2): physics sanity, determinism,
particle statistics, time-step schedule."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde4mbrl_px4_tpu.core.types import hover_state
from sde4mbrl_px4_tpu.models.sde_model import NeuralSDE, init_params, diffusion_fn
from sde4mbrl_px4_tpu.models.vehicles import iris_config
from sde4mbrl_px4_tpu.ops.rollout import make_time_steps, rollout_mean, rollout_sde

_G = 9.81


def _zero_residual(params):
    """Strip the learned residual/diffusion so only the physics prior acts:
    zero the combined head layer (last trunk layer) and kill the noise scale."""
    p = jax.tree.map(lambda a: a, params)
    last = max(int(k[1:]) for k in p["net"] if k.startswith("w"))
    p["net"] = dict(p["net"])
    p["net"][f"w{last}"] = jnp.zeros_like(p["net"][f"w{last}"])
    p["net"][f"b{last}"] = jnp.zeros_like(p["net"][f"b{last}"])
    p["diffusion_log_scale"] = jnp.float32(-30.0)
    return p


def test_make_time_steps_schedule():
    ts = make_time_steps(20, 5, 0.01, 0.1)
    assert ts.shape == (20,)
    np.testing.assert_allclose(ts[:5], 0.01)
    np.testing.assert_allclose(ts[5:], 0.1)


def test_free_fall_matches_closed_form(iris_model):
    """Zero thrust => NED free fall: z(t) = g t^2 / 2, vz = g t."""
    model, params = iris_model
    p = _zero_residual(params)
    p["motor"]["log_gain"] = jnp.full((4,), -30.0)  # kill motor wrench
    H = 50
    ts = jnp.full((H,), 0.01)
    u = jnp.zeros((H, 4))
    path = rollout_mean(model, p, hover_state(), u, ts)
    T = 0.5
    dt = 0.01
    # Exact explicit-Euler closed form: z_N = g dt^2 N(N-1)/2, vz_N = g T.
    z_euler = _G * dt * dt * H * (H - 1) / 2
    assert abs(float(path[-1, 2]) - z_euler) < 1e-4
    assert abs(float(path[-1, 5]) - _G * T) < 1e-3
    # attitude untouched
    np.testing.assert_allclose(path[-1, 6:10], jnp.array([1, 0, 0, 0]), atol=1e-6)


def test_hover_equilibrium(iris_model):
    """uref hover thrust balances gravity at the physics prior."""
    model, params = iris_model
    p = _zero_residual(params)
    H = 20
    ts = jnp.full((H,), 0.05)
    u = jnp.full((H, 4), model.vehicle.hover_u)
    path = rollout_mean(model, p, hover_state(), u, ts)
    # Position drift stays tiny over 1 s.
    assert float(jnp.max(jnp.abs(path[:, 0:3]))) < 1e-3
    assert float(jnp.max(jnp.abs(path[:, 3:6]))) < 1e-3


def test_torque_produces_rotation(iris_model):
    """Differential motor commands produce roll/pitch rates of the right sign."""
    model, params = iris_model
    p = _zero_residual(params)
    H = 10
    ts = jnp.full((H,), 0.01)
    hov = model.vehicle.hover_u
    # front motors (positive body-x) get more thrust -> pitch-up torque (+tau_y).
    mix = model.vehicle.mixing
    u = jnp.full((H, 4), hov)
    u = u.at[:, 0].set(hov + 0.1).at[:, 1].set(hov - 0.1)  # m1 front-right, m2 rear-left
    path = rollout_mean(model, p, hover_state(), u, ts)
    tau = mix @ np.asarray(u[0])
    omega_end = np.asarray(path[-1, 10:13])
    # sign of final body rates matches sign of applied torque
    for ax in range(3):
        if abs(tau[1 + ax]) > 1e-6:
            assert np.sign(omega_end[ax]) == np.sign(tau[1 + ax])


def test_rollout_determinism(iris_model):
    model, params = iris_model
    H = 20
    ts = jnp.full((H,), 0.05)
    u = jnp.full((H, 4), 0.71)
    rng = jax.random.PRNGKey(7)
    a1, s1 = rollout_sde(model, params, hover_state(), u, ts, rng, 8)
    a2, s2 = rollout_sde(model, params, hover_state(), u, ts, rng, 8)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_particles_spread_scales_with_sigma(iris_model):
    model, params = iris_model
    H = 10
    ts = jnp.full((H,), 0.05)
    u = jnp.full((H, 4), 0.71)
    rng = jax.random.PRNGKey(3)

    p_small = jax.tree.map(lambda a: a, params)
    p_small["diffusion_log_scale"] = jnp.float32(np.log(0.01))
    p_big = jax.tree.map(lambda a: a, params)
    p_big["diffusion_log_scale"] = jnp.float32(np.log(1.0))

    xs_s, _ = rollout_sde(model, p_small, hover_state(), u, ts, rng, 64)
    xs_b, _ = rollout_sde(model, p_big, hover_state(), u, ts, rng, 64)
    spread_s = float(jnp.std(xs_s[:, -1, 3:6]))
    spread_b = float(jnp.std(xs_b[:, -1, 3:6]))
    assert spread_b > 10 * spread_s


def test_deterministic_flag_matches_mean(iris_model):
    model, params = iris_model
    H = 10
    ts = jnp.full((H,), 0.05)
    u = jnp.full((H, 4), 0.71)
    rng = jax.random.PRNGKey(5)
    xs, sigs = rollout_sde(model, params, hover_state(), u, ts, rng, 1, deterministic=True)
    mean_path = rollout_mean(model, params, hover_state(), u, ts)
    np.testing.assert_allclose(np.asarray(xs[0]), np.asarray(mean_path), atol=1e-6)
    assert sigs.shape == (1, H, 13)
    # diffusion reported positive on velocity rows, zero elsewhere
    assert float(jnp.min(sigs[..., 3:6])) > 0
    np.testing.assert_allclose(np.asarray(sigs[..., 0:3]), 0.0)
    np.testing.assert_allclose(np.asarray(sigs[..., 6:10]), 0.0)


def test_quaternion_stays_normalized(iris_model):
    model, params = iris_model
    H = 40
    ts = jnp.full((H,), 0.05)
    rng = jax.random.PRNGKey(11)
    u = jax.random.uniform(rng, (H, 4), minval=0.3, maxval=1.0)
    xs, _ = rollout_sde(model, params, hover_state(), u, ts, rng, 4)
    norms = jnp.linalg.norm(xs[..., 6:10], axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)


def test_antithetic_pairs_and_unbiasedness(iris_model):
    """draw_brownian(antithetic=True): exact (z, -z) particle pairing, and
    the particle-mean cost estimator stays unbiased while its variance
    drops vs iid sampling at equal particle count."""
    import jax

    from sde4mbrl_px4_tpu.ops.rollout import draw_brownian, rollout_sde
    from sde4mbrl_px4_tpu.core.types import hover_state

    model, params = iris_model
    z = draw_brownian(jax.random.PRNGKey(0), 5, 8, antithetic=True)
    np.testing.assert_array_equal(np.asarray(z[:, :4]), -np.asarray(z[:, 4:]))
    with pytest.raises(ValueError):
        draw_brownian(jax.random.PRNGKey(0), 5, 7, antithetic=True)

    # payoff: mean squared velocity along the path (even + odd components)
    x0 = hover_state()
    H, P = 8, 32
    u = jnp.full((H, 4), model.vehicle.hover_u * 1.1, jnp.float32)
    ts = jnp.full((H,), 0.05, jnp.float32)

    def estimate(rng, anti):
        xp, _ = rollout_sde(model, params, x0, u, ts, rng, P, antithetic=anti)
        return jnp.mean(jnp.sum(xp[:, -1, 3:6] ** 2, -1))

    est = jax.jit(jax.vmap(estimate, in_axes=(0, None)), static_argnums=1)
    rngs = jax.random.split(jax.random.PRNGKey(42), 192)
    e_iid = np.asarray(est(rngs, False))
    e_anti = np.asarray(est(rngs, True))
    # unbiased: the two estimator means agree within joint standard error
    se = np.sqrt(e_iid.var() / len(e_iid) + e_anti.var() / len(e_anti))
    assert abs(e_iid.mean() - e_anti.mean()) < 5 * se
    # variance reduction: strict improvement at equal particle count
    assert e_anti.var() < 0.8 * e_iid.var(), (e_anti.var(), e_iid.var())


def test_antithetic_config_solves(repo_root):
    """`antithetic: true` through the full MPC loader: solves, finite, and
    the config key routes the paired noise into the cost path."""
    import yaml

    from sde4mbrl_px4_tpu.engine.mpc_loader import make_mpc_from_config
    from sde4mbrl_px4_tpu.io.config import load_yaml_config
    from sde4mbrl_px4_tpu.core.types import hover_state

    cfg = load_yaml_config(os.path.join(repo_root, "configs/iris_posctrl_mpc.yaml"))
    cfg["num_particles"] = 8
    cfg["antithetic"] = True
    cfg["apg_mpc"]["max_iter"] = 5
    cfg, (reset_fn, mpc_fn), _, _ = make_mpc_from_config(cfg)
    x0 = hover_state()
    rng = jax.random.PRNGKey(0)
    st = reset_fn(x0, rng, x0)
    sol = jax.jit(mpc_fn)(x0, rng, st, jnp.float32(0.0), x0)
    assert np.isfinite(np.asarray(sol.u_opt)).all()
    assert np.isfinite(float(sol.opt_state.opt_cost))


def test_initial_state_spread(iris_model):
    """x0_spread: particles start from perturbed states with the requested
    std, quaternions stay unit, and the spread is reproducible per rng."""
    from sde4mbrl_px4_tpu.ops.rollout import rollout_sde
    from sde4mbrl_px4_tpu.core.types import hover_state

    model, params = iris_model
    x0 = hover_state()
    H, P = 4, 256
    u = jnp.full((H, 4), model.vehicle.hover_u, jnp.float32)
    ts = jnp.full((H,), 0.05, jnp.float32)
    std = np.zeros(13, np.float32)
    std[0:3] = 0.2          # position uncertainty only
    rng = jax.random.PRNGKey(3)
    xp, _ = rollout_sde(model, params, x0, u, ts, rng, P,
                        x0_spread=jnp.asarray(std))
    starts = np.asarray(xp[:, 0])
    assert abs(starts[:, 0].std() - 0.2) < 0.04      # requested spread
    np.testing.assert_allclose(starts[:, 3:6], 0.0, atol=1e-6)  # vel untouched
    np.testing.assert_allclose(np.linalg.norm(starts[:, 6:10], axis=1), 1.0,
                               atol=1e-5)
    xp2, _ = rollout_sde(model, params, x0, u, ts, rng, P,
                         x0_spread=jnp.asarray(std))
    np.testing.assert_array_equal(np.asarray(xp), np.asarray(xp2))
    # without spread: all particles share the exact start
    xp3, _ = rollout_sde(model, params, x0, u, ts, rng, P)
    assert np.ptp(np.asarray(xp3[:, 0]), axis=0).max() == 0.0


def test_initial_state_std_config_solves(repo_root):
    """`initial_state_std` end-to-end: scenario-robust solve runs, stays
    finite, and prices the uncertainty (expected cost above the
    certainty-equivalent solve's)."""
    import yaml

    from sde4mbrl_px4_tpu.engine.mpc_loader import make_mpc_from_config
    from sde4mbrl_px4_tpu.io.config import load_yaml_config
    from sde4mbrl_px4_tpu.core.types import hover_state

    def solve(std):
        cfg = load_yaml_config(
            os.path.join(repo_root, "configs/iris_posctrl_mpc.yaml"))
        cfg["num_particles"] = 16
        cfg["apg_mpc"]["max_iter"] = 15
        if std is not None:
            cfg["initial_state_std"] = std
        cfg, (reset_fn, mpc_fn), _, _ = make_mpc_from_config(cfg)
        x0 = hover_state()
        rng = jax.random.PRNGKey(0)
        st = reset_fn(x0, rng, x0)
        tgt = np.asarray(hover_state()).copy()
        tgt[2] = 1.0
        sol = jax.jit(mpc_fn)(x0, rng, st, jnp.float32(0.0), jnp.asarray(tgt))
        assert np.isfinite(np.asarray(sol.u_opt)).all()
        return float(sol.opt_state.opt_cost)

    c_robust = solve([0.15] * 3 + [0.1] * 3 + [0.0] * 4 + [0.05] * 3)
    c_nominal = solve(None)
    assert c_robust > c_nominal     # uncertainty is priced into the cost


def test_initial_state_std_requires_particles(repo_root):
    from sde4mbrl_px4_tpu.engine.mpc_loader import make_mpc_from_config
    from sde4mbrl_px4_tpu.io.config import load_yaml_config

    cfg = load_yaml_config(os.path.join(repo_root, "configs/iris_posctrl_mpc.yaml"))
    cfg["initial_state_std"] = 0.1        # num_particles stays 1
    with pytest.raises(ValueError, match="num_particles"):
        make_mpc_from_config(cfg)
