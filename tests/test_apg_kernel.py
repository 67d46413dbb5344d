"""Mega-kernel parity: the whole-solve APG kernel must match the XLA
apg_solve (vector-linesearch path) on real MPC problems."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde4mbrl_px4_tpu.core.types import hover_state
from sde4mbrl_px4_tpu.cost.cost import CostParams, make_cost_fn
from sde4mbrl_px4_tpu.ops.pallas.apg_kernel import pallas_apg_solve
from sde4mbrl_px4_tpu.ops.rollout import rollout_sde
from sde4mbrl_px4_tpu.solver.apg import apg_solve


def _solve_both(bundle_fixture, max_iter=10, x_off=(0.3, 0.2), sc_cfg=None,
                num_particles=1, precond=None, **apg_overrides):
    cfg, fns, sft, b = bundle_fixture
    H, n = 20, b.model.n_u
    apg = b.apg_config._replace(max_iter=max_iter,
                                max_no_improvement_iter=max_iter,
                                **apg_overrides)
    cp = b.cost_params
    if sc_cfg is not None:
        cfg2 = dict(cfg)
        cfg2["state_constr"] = sc_cfg
        cp = CostParams.from_config(cfg2, n)

    rng = jax.random.PRNGKey(0)
    x0 = hover_state().at[0].set(x_off[0]).at[3].set(x_off[1])
    x_ref = jnp.broadcast_to(hover_state(), (H + 1, 13))
    u_prev = cp.uref
    u_init = jnp.broadcast_to(cp.uref, (H, n)) + 0.02

    P = max(num_particles, 1)
    deterministic = num_particles <= 1
    if deterministic:
        noise = jnp.zeros((P, H, 13), jnp.float32)
    else:
        noise = jnp.transpose(jax.random.normal(rng, (H, P, 13)), (1, 0, 2))

    # XLA reference
    cost_fn = make_cost_fn(cp, b.time_steps)

    def seq_cost(u_seq):
        xp, sg = rollout_sde(b.model, b.params, x0, u_seq, b.time_steps, rng,
                             P, deterministic=deterministic)
        return cost_fn(xp, sg, u_seq, x_ref, u_prev)

    st_x = apg_solve(seq_cost, u_init, b.lb, b.ub, apg, precond=precond)

    st_p = pallas_apg_solve(
        b.model, b.params, cp, apg, b.time_steps, x0, x_ref, u_prev,
        noise, P, b.lb, b.ub, u_init, interpret=True,
        deterministic=deterministic, precond=precond,
    )
    return st_x, st_p


@pytest.mark.slow
def test_mega_solve_parity_traj(iris_traj_bundle):
    st_x, st_p = _solve_both(iris_traj_bundle, max_iter=10)
    assert int(st_p.num_steps) == int(st_x.num_steps)
    np.testing.assert_allclose(np.asarray(st_p.yk), np.asarray(st_x.yk),
                               rtol=2e-4, atol=2e-5)
    assert float(st_p.opt_cost) == pytest.approx(float(st_x.opt_cost), rel=2e-4)
    assert float(st_p.init_cost) == pytest.approx(float(st_x.init_cost), rel=2e-5)
    assert float(st_p.avg_linesearch) == pytest.approx(
        float(st_x.avg_linesearch), abs=1e-5)
    assert float(st_p.stepsize) == pytest.approx(float(st_x.stepsize), rel=1e-4)
    assert float(st_p.avg_stepsize) == pytest.approx(
        float(st_x.avg_stepsize), rel=1e-4)


def test_mega_solve_parity_posctrl_with_slew(iris_pos_bundle):
    """posctrl exercises the slew-rate constraint in cost AND gradient."""
    st_x, st_p = _solve_both(iris_pos_bundle, max_iter=8)
    assert int(st_p.num_steps) == int(st_x.num_steps)
    np.testing.assert_allclose(np.asarray(st_p.yk), np.asarray(st_x.yk),
                               rtol=5e-4, atol=5e-5)
    assert float(st_p.opt_cost) == pytest.approx(float(st_x.opt_cost), rel=5e-4)


@pytest.mark.slow
def test_mega_solve_state_constraints(iris_pos_bundle):
    sc = {
        "state_id": [3, 4, 5],
        "state_penalty": [10.0, 10.0, 20.0],
        "slack_scaling": [3.0, 3.0, 3.0],
        "state_bound": [[-0.1, 0.1], [-0.1, 0.1], [-0.1, 0.1]],
        "slack_proximal": False,
        "constr_pen": 0.5,
    }
    st_x, st_p = _solve_both(iris_pos_bundle, max_iter=6, x_off=(0.2, 0.5),
                             sc_cfg=sc)
    np.testing.assert_allclose(np.asarray(st_p.yk), np.asarray(st_x.yk),
                               rtol=5e-4, atol=5e-5)


@pytest.mark.slow
def test_mega_solve_particles(iris_traj_bundle):
    """P=4 Monte-Carlo paths through the mega-kernel."""
    st_x, st_p = _solve_both(iris_traj_bundle, max_iter=5, num_particles=4)
    np.testing.assert_allclose(np.asarray(st_p.yk), np.asarray(st_x.yk),
                               rtol=5e-4, atol=5e-5)
    assert float(st_p.opt_cost) == pytest.approx(float(st_x.opt_cost), rel=5e-4)


def test_mega_solve_chunked_particles(iris_traj_bundle):
    """P=8 chunked at 4 must match the unchunked mega-kernel solve."""
    cfg, fns, sft, b = iris_traj_bundle
    H, n = 20, b.model.n_u
    apg = b.apg_config._replace(max_iter=5, max_no_improvement_iter=5)
    cp = b.cost_params
    rng = jax.random.PRNGKey(1)
    x0 = hover_state().at[0].set(0.3).at[3].set(0.2)
    x_ref = jnp.broadcast_to(hover_state(), (H + 1, 13))
    u_prev = cp.uref
    u_init = jnp.broadcast_to(cp.uref, (H, n)) + 0.02
    P = 8
    noise = jnp.transpose(jax.random.normal(rng, (H, P, 13)), (1, 0, 2))
    kw = dict(interpret=True, deterministic=False)
    st_w = pallas_apg_solve(b.model, b.params, cp, apg, b.time_steps, x0,
                            x_ref, u_prev, noise, P, b.lb, b.ub, u_init, **kw)
    st_c = pallas_apg_solve(b.model, b.params, cp, apg, b.time_steps, x0,
                            x_ref, u_prev, noise, P, b.lb, b.ub, u_init,
                            chunk=4, **kw)
    assert int(st_c.num_steps) == int(st_w.num_steps)
    np.testing.assert_allclose(np.asarray(st_c.yk), np.asarray(st_w.yk),
                               rtol=5e-4, atol=5e-5)
    assert float(st_c.opt_cost) == pytest.approx(float(st_w.opt_cost), rel=2e-4)


def test_mega_solve_parity_stepsize_carry(iris_traj_bundle):
    """Warm solve with a carried t_init: kernel and XLA paths must stay in
    lockstep (same iterations, same iterate)."""
    cfg, fns, sft, b = iris_traj_bundle
    H, n = 20, b.model.n_u
    apg = b.apg_config._replace(max_iter=10, max_no_improvement_iter=10)
    cp = b.cost_params
    rng = jax.random.PRNGKey(0)
    x0 = hover_state().at[0].set(0.3).at[3].set(0.2)
    x_ref = jnp.broadcast_to(hover_state(), (H + 1, 13))
    u_prev = cp.uref
    u_init = jnp.broadcast_to(cp.uref, (H, n)) + 0.02
    noise = jnp.zeros((1, H, 13), jnp.float32)
    cost_fn = make_cost_fn(cp, b.time_steps)

    def seq_cost(u_seq):
        xp, sg = rollout_sde(b.model, b.params, x0, u_seq, b.time_steps, rng,
                             1, deterministic=True)
        return cost_fn(xp, sg, u_seq, x_ref, u_prev)

    t_carry = jnp.float32(0.31)    # mid-schedule carried stepsize
    st_x = apg_solve(seq_cost, u_init, b.lb, b.ub, apg, t_init=t_carry)
    st_p = pallas_apg_solve(
        b.model, b.params, cp, apg, b.time_steps, x0, x_ref, u_prev,
        noise, 1, b.lb, b.ub, u_init, interpret=True, deterministic=True,
        t_init=t_carry,
    )
    assert int(st_p.num_steps) == int(st_x.num_steps)
    np.testing.assert_allclose(np.asarray(st_p.yk), np.asarray(st_x.yk),
                               rtol=2e-4, atol=2e-5)
    assert float(st_p.stepsize) == pytest.approx(float(st_x.stepsize), rel=1e-4)
    # carried-vs-cold must differ (proves the carry reached the kernel)
    st_cold = pallas_apg_solve(
        b.model, b.params, cp, apg, b.time_steps, x0, x_ref, u_prev,
        noise, 1, b.lb, b.ub, u_init, interpret=True, deterministic=True,
    )
    assert float(st_cold.avg_stepsize) != pytest.approx(
        float(st_p.avg_stepsize), rel=1e-6)


def test_mega_solve_exported_trajectory(iris_traj_bundle):
    """return_traj=True: the trajectory recovered from the exit sweep must
    equal the dedicated mean-trajectory kernel's x_evol for the same plan."""
    from sde4mbrl_px4_tpu.ops.pallas.solve_kernels import pallas_cost_oracle

    cfg, fns, sft, b = iris_traj_bundle
    H, n = 20, b.model.n_u
    apg = b.apg_config._replace(max_iter=6, max_no_improvement_iter=6)
    cp = b.cost_params
    rng = jax.random.PRNGKey(0)
    x0 = hover_state().at[0].set(0.3).at[3].set(0.2)
    x_ref = jnp.broadcast_to(hover_state(), (H + 1, 13))
    u_prev = cp.uref
    u_init = jnp.broadcast_to(cp.uref, (H, n)) + 0.02
    noise = jnp.zeros((1, H, 13), jnp.float32)
    st, x_evol = pallas_apg_solve(
        b.model, b.params, cp, apg, b.time_steps, x0, x_ref, u_prev,
        noise, 1, b.lb, b.ub, u_init, interpret=True, deterministic=True,
        return_traj=True,
    )
    oracle = pallas_cost_oracle(b.model, b.params, cp, b.time_steps, x0,
                                x_ref, u_prev, noise, 1, apg.maxls,
                                interpret=True)
    x_ref_traj = oracle.trajectory(st.yk)
    assert x_evol.shape == (H + 1, 13)
    np.testing.assert_allclose(np.asarray(x_evol), np.asarray(x_ref_traj),
                               rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError):
        pallas_apg_solve(
            b.model, b.params, cp, apg, b.time_steps, x0, x_ref, u_prev,
            jnp.zeros((4, H, 13), jnp.float32), 4, b.lb, b.ub, u_init,
            interpret=True, return_traj=True)


def test_mega_solve_parity_precond(iris_traj_bundle):
    """Diagonal-metric step (proj(y - t*D*g), <d,D^{-1}d> Armijo quadratic):
    kernel and XLA paths in lockstep, and D must actually reach the kernel
    (the preconditioned solve differs from the unpreconditioned one)."""
    H = 20
    n = iris_traj_bundle[3].model.n_u
    # horizon-decaying metric mimicking the measured MPC curvature shape
    # (~580x decay row 0 -> row H-1; tools/curvature_probe.py)
    d_row = jnp.exp(-jnp.linspace(0.0, 4.0, H))       # 1 .. e^-4
    D = jnp.broadcast_to(d_row[:, None], (H, n))
    st_x, st_p = _solve_both(iris_traj_bundle, max_iter=8, precond=D)
    assert int(st_p.num_steps) == int(st_x.num_steps)
    np.testing.assert_allclose(np.asarray(st_p.yk), np.asarray(st_x.yk),
                               rtol=2e-4, atol=2e-5)
    assert float(st_p.opt_cost) == pytest.approx(float(st_x.opt_cost), rel=2e-4)
    assert float(st_p.stepsize) == pytest.approx(float(st_x.stepsize), rel=1e-4)
    st_plain = _solve_both(iris_traj_bundle, max_iter=8)[1]
    assert not np.allclose(np.asarray(st_plain.yk), np.asarray(st_p.yk),
                           rtol=1e-6, atol=1e-7)


def test_mega_solve_parity_bb(iris_traj_bundle):
    """reset_option='bb' (Barzilai–Borwein trial stepsize): kernel/XLA
    lockstep, with and without the diagonal metric."""
    H = 20
    n = iris_traj_bundle[3].model.n_u
    st_x, st_p = _solve_both(iris_traj_bundle, max_iter=8, reset_option="bb")
    assert int(st_p.num_steps) == int(st_x.num_steps)
    np.testing.assert_allclose(np.asarray(st_p.yk), np.asarray(st_x.yk),
                               rtol=2e-4, atol=2e-5)
    assert float(st_p.stepsize) == pytest.approx(float(st_x.stepsize), rel=1e-4)
    assert float(st_p.avg_stepsize) == pytest.approx(
        float(st_x.avg_stepsize), rel=2e-4)

    d_row = jnp.exp(-jnp.linspace(0.0, 4.0, H))
    D = jnp.broadcast_to(d_row[:, None], (H, n))
    st_x2, st_p2 = _solve_both(iris_traj_bundle, max_iter=8,
                               reset_option="bb", precond=D)
    assert int(st_p2.num_steps) == int(st_x2.num_steps)
    np.testing.assert_allclose(np.asarray(st_p2.yk), np.asarray(st_x2.yk),
                               rtol=2e-4, atol=2e-5)


def test_mega_solve_parity_no_momentum_restart(iris_traj_bundle):
    """momentum_restart=False (global k/(k+3) schedule) must also stay in
    kernel/XLA lockstep — the flag is YAML-exposed, so both variants are
    contract surface."""
    cfg, fns, sft, b = iris_traj_bundle
    H, n = 20, b.model.n_u
    apg = b.apg_config._replace(max_iter=10, max_no_improvement_iter=10,
                                momentum_restart=False)
    cp = b.cost_params
    rng = jax.random.PRNGKey(0)
    x0 = hover_state().at[0].set(0.3).at[3].set(0.2)
    x_ref = jnp.broadcast_to(hover_state(), (H + 1, 13))
    u_prev = cp.uref
    u_init = jnp.broadcast_to(cp.uref, (H, n)) + 0.02
    noise = jnp.zeros((1, H, 13), jnp.float32)
    cost_fn = make_cost_fn(cp, b.time_steps)

    def seq_cost(u_seq):
        xp, sg = rollout_sde(b.model, b.params, x0, u_seq, b.time_steps, rng,
                             1, deterministic=True)
        return cost_fn(xp, sg, u_seq, x_ref, u_prev)

    st_x = apg_solve(seq_cost, u_init, b.lb, b.ub, apg)
    st_p = pallas_apg_solve(
        b.model, b.params, cp, apg, b.time_steps, x0, x_ref, u_prev,
        noise, 1, b.lb, b.ub, u_init, interpret=True, deterministic=True)
    assert int(st_p.num_steps) == int(st_x.num_steps)
    np.testing.assert_allclose(np.asarray(st_p.yk), np.asarray(st_x.yk),
                               rtol=2e-4, atol=2e-5)
    assert float(st_p.opt_cost) == pytest.approx(float(st_x.opt_cost), rel=2e-4)


def test_manual_bwd_vs_traced_vjp_kernel(iris_traj_bundle, monkeypatch):
    """Direct kernel-vs-kernel A/B: the hand-derived reverse sweep
    (bodies.manual_bwd_step) vs the traced-VJP reverse sweep must produce
    the same solve (iterate, iteration count, gradient-norm stat)."""
    monkeypatch.setenv("SDE4MBRL_MANUAL_BWD", "1")
    _, st_on = _solve_both(iris_traj_bundle, max_iter=8)
    monkeypatch.setenv("SDE4MBRL_MANUAL_BWD", "0")
    _, st_off = _solve_both(iris_traj_bundle, max_iter=8)
    assert int(st_on.num_steps) == int(st_off.num_steps)
    np.testing.assert_allclose(np.asarray(st_on.yk), np.asarray(st_off.yk),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(st_on.grad_sqr), float(st_off.grad_sqr),
                               rtol=1e-4)
    np.testing.assert_allclose(float(st_on.opt_cost), float(st_off.opt_cost),
                               rtol=1e-6)
