"""Parity tests: fused Pallas solve kernels (interpret mode on CPU) must
match the XLA rollout+cost implementation bit-for-tolerance."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde4mbrl_px4_tpu.core.types import hover_state
from sde4mbrl_px4_tpu.cost.cost import make_cost_fn
from sde4mbrl_px4_tpu.ops.pallas.solve_kernels import pallas_cost_oracle
from sde4mbrl_px4_tpu.ops.rollout import rollout_sde
from sde4mbrl_px4_tpu.solver.apg import CostOracle


def _setup(bundle_fixture, num_particles, deterministic, rng_seed=0):
    cfg, fns, sft, b = bundle_fixture
    H = int(b.time_steps.shape[0])
    n = b.model.n_u
    rng = jax.random.PRNGKey(rng_seed)
    x0 = hover_state().at[0].set(0.3).at[3].set(0.2)
    x_ref = jnp.broadcast_to(hover_state(), (H + 1, 13))
    u_prev = b.cost_params.uref
    cost_fn = make_cost_fn(b.cost_params, b.time_steps)

    def seq_cost(u_seq):
        xp, sg = rollout_sde(
            b.model, b.params, x0, u_seq, b.time_steps, rng, num_particles,
            deterministic=deterministic,
        )
        return cost_fn(xp, sg, u_seq, x_ref, u_prev)

    xla = CostOracle.from_fn(seq_cost)

    P = max(num_particles, 1)
    if deterministic:
        noise = jnp.zeros((P, H, 13), jnp.float32)
    else:
        noise = jnp.transpose(
            jax.random.normal(rng, (H, P, 13), jnp.float32), (1, 0, 2)
        )
    pk = pallas_cost_oracle(
        b.model, b.params, b.cost_params, b.time_steps, x0, x_ref, u_prev,
        noise, P, maxls=4, interpret=True,
    )
    return xla, pk, H, n


@pytest.fixture(scope="module")
def u_test():
    def make(H, n, seed=3):
        r = jax.random.uniform(jax.random.PRNGKey(seed), (H, n),
                               minval=0.3, maxval=0.95)
        return r
    return make


def test_value_parity_traj_config(iris_traj_bundle, u_test):
    xla, pk, H, n = _setup(iris_traj_bundle, 1, True)
    u = u_test(H, n)
    v_x = float(xla.value(u))
    v_p = float(pk.value(u))
    assert v_x == pytest.approx(v_p, rel=2e-5), (v_x, v_p)


def test_value_parity_posctrl_config(iris_pos_bundle, u_test):
    """posctrl exercises the slew-rate constraint penalty path."""
    xla, pk, H, n = _setup(iris_pos_bundle, 1, True)
    u = u_test(H, n, seed=5)
    assert float(xla.value(u)) == pytest.approx(float(pk.value(u)), rel=2e-5)


def test_value_batch_parity(iris_traj_bundle, u_test):
    xla, pk, H, n = _setup(iris_traj_bundle, 1, True)
    U = jnp.stack([u_test(H, n, seed=s) for s in range(4)])
    np.testing.assert_allclose(
        np.asarray(xla.value_batch(U)), np.asarray(pk.value_batch(U)), rtol=2e-5
    )


def test_grad_parity(iris_traj_bundle, u_test):
    xla, pk, H, n = _setup(iris_traj_bundle, 1, True)
    u = u_test(H, n)
    v_x, g_x = xla.value_and_grad(u)
    v_p, g_p = pk.value_and_grad(u)
    assert float(v_x) == pytest.approx(float(v_p), rel=2e-5)
    np.testing.assert_allclose(np.asarray(g_x), np.asarray(g_p), rtol=5e-4, atol=5e-5)


def test_grad_parity_posctrl(iris_pos_bundle, u_test):
    xla, pk, H, n = _setup(iris_pos_bundle, 1, True)
    u = u_test(H, n, seed=7)
    v_x, g_x = xla.value_and_grad(u)
    v_p, g_p = pk.value_and_grad(u)
    assert float(v_x) == pytest.approx(float(v_p), rel=2e-5)
    np.testing.assert_allclose(np.asarray(g_x), np.asarray(g_p), rtol=5e-4, atol=5e-5)


def test_stochastic_particles_parity(iris_traj_bundle, u_test):
    """P=4 Monte-Carlo paths with real Brownian noise: identical draws must
    give identical costs across both implementations."""
    xla, pk, H, n = _setup(iris_traj_bundle, 4, False)
    u = u_test(H, n, seed=11)
    assert float(xla.value(u)) == pytest.approx(float(pk.value(u)), rel=5e-5)


def test_kernel_mpc_solve_matches_xla(iris_pos_bundle):
    """Full mpc_fn built with use_pallas(interpret) vs XLA path: same plan."""
    from sde4mbrl_px4_tpu.engine.mpc_loader import make_mpc_from_config

    cfg0 = dict(iris_pos_bundle[0])
    cfg0["apg_mpc"] = dict(cfg0["apg_mpc"], max_iter=8)

    _, (reset_p, mpc_p), _, _ = make_mpc_from_config(dict(cfg0), use_pallas="interpret")
    _, (reset_x, mpc_x), _, _ = make_mpc_from_config(dict(cfg0), use_pallas=False)

    x0 = hover_state()
    rng = jax.random.PRNGKey(0)
    st_p = reset_p(x0, rng, x0)
    st_x = reset_x(x0, rng, x0)
    sol_p = mpc_p(x0, rng, st_p, 0.0, x0)
    sol_x = mpc_x(x0, rng, st_x, 0.0, x0)
    np.testing.assert_allclose(
        np.asarray(sol_p.u_opt), np.asarray(sol_x.u_opt), rtol=1e-4, atol=1e-5
    )
    assert float(sol_p.opt_state.opt_cost) == pytest.approx(
        float(sol_x.opt_state.opt_cost), rel=1e-4
    )
    # fused mean-trajectory kernel (x_evol) parity with rollout_mean
    np.testing.assert_allclose(
        np.asarray(sol_p.x_evol), np.asarray(sol_x.x_evol), rtol=1e-4, atol=1e-5
    )


def test_state_constraint_parity(iris_pos_bundle, u_test):
    """state_constr soft box penalties: kernel matches XLA, value and grad."""
    import copy

    from sde4mbrl_px4_tpu.cost.cost import CostParams

    cfg, fns, sft, b = iris_pos_bundle
    cfg2 = dict(cfg)
    cfg2["state_constr"] = {
        "state_id": [3, 4, 5, 10, 11, 12],
        "state_penalty": [10.0, 10.0, 20.0, 10.0, 10.0, 10.0],
        "slack_scaling": [3.0] * 6,
        "state_bound": [[-0.1, 0.1], [-0.1, 0.1], [-0.1, 0.1],
                        [-0.2, 0.2], [-0.2, 0.2], [-0.2, 0.2]],
        "slack_proximal": False,
        "constr_pen": 0.5,
    }
    cp = CostParams.from_config(cfg2, 4)
    H, n = 20, 4
    rng = jax.random.PRNGKey(0)
    x0 = hover_state().at[3].set(0.4)   # start with a violating velocity
    x_ref = jnp.broadcast_to(hover_state(), (H + 1, 13))
    noise = jnp.zeros((1, H, 13), jnp.float32)
    cost_fn = make_cost_fn(cp, b.time_steps)

    def seq_cost(u_seq):
        xp, sg = rollout_sde(b.model, b.params, x0, u_seq, b.time_steps, rng,
                             1, deterministic=True)
        return cost_fn(xp, sg, u_seq, x_ref, cp.uref)

    ora = pallas_cost_oracle(b.model, b.params, cp, b.time_steps, x0, x_ref,
                             cp.uref, noise, 1, 4, interpret=True)
    u = u_test(H, n, seed=13)
    v_x, g_x = jax.value_and_grad(seq_cost)(u)
    v_p, g_p = ora.value_and_grad(u)
    assert float(v_x) == pytest.approx(float(v_p), rel=2e-5)
    np.testing.assert_allclose(np.asarray(g_x), np.asarray(g_p), rtol=5e-4,
                               atol=5e-5)
    # the constraint actually contributes (cost with vs without)
    cp0 = CostParams.from_config(dict(cfg), 4)
    cost0 = make_cost_fn(cp0, b.time_steps)

    def seq_cost0(u_seq):
        xp, sg = rollout_sde(b.model, b.params, x0, u_seq, b.time_steps, rng,
                             1, deterministic=True)
        return cost0(xp, sg, u_seq, x_ref, cp0.uref)

    assert float(seq_cost(u)) > float(seq_cost0(u)) + 0.01


def test_chunked_particles_parity(iris_traj_bundle, u_test):
    """chunk=4 with P=8: in-kernel particle chunking must reproduce the
    unchunked value/batch/grad results (same draws, same mean reduction)."""
    cfg, fns, sft, b = iris_traj_bundle
    H = int(b.time_steps.shape[0])
    n = b.model.n_u
    rng = jax.random.PRNGKey(2)
    x0 = hover_state().at[0].set(0.3).at[3].set(0.2)
    x_ref = jnp.broadcast_to(hover_state(), (H + 1, 13))
    u_prev = b.cost_params.uref
    P = 8
    noise = jnp.transpose(
        jax.random.normal(rng, (H, P, 13), jnp.float32), (1, 0, 2)
    )
    whole = pallas_cost_oracle(
        b.model, b.params, b.cost_params, b.time_steps, x0, x_ref, u_prev,
        noise, P, maxls=4, interpret=True,
    )
    chunked = pallas_cost_oracle(
        b.model, b.params, b.cost_params, b.time_steps, x0, x_ref, u_prev,
        noise, P, maxls=4, interpret=True, chunk=4,
    )
    u = u_test(H, n, seed=17)
    assert float(whole.value(u)) == pytest.approx(float(chunked.value(u)), rel=2e-5)
    U = jnp.stack([u_test(H, n, seed=s) for s in range(3)])
    np.testing.assert_allclose(
        np.asarray(whole.value_batch(U)), np.asarray(chunked.value_batch(U)),
        rtol=2e-5,
    )
    v_w, g_w = whole.value_and_grad(u)
    v_c, g_c = chunked.value_and_grad(u)
    assert float(v_w) == pytest.approx(float(v_c), rel=2e-5)
    np.testing.assert_allclose(np.asarray(g_w), np.asarray(g_c), rtol=5e-4,
                               atol=5e-5)
