"""Unit tests for the APG solver (L4): convex problems with known optima,
box projection, stats semantics, early stopping."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde4mbrl_px4_tpu.solver.apg import APGConfig, APGState, apg_solve, box_project


def _solve_quadratic(target, lb=0.0, ub=1.0, **over):
    """min ||u - target||^2 over the box."""
    cfg = APGConfig(
        max_iter=over.pop("max_iter", 300),
        max_no_improvement_iter=over.pop("max_no_improvement_iter", 50),
        init_stepsize=over.pop("init_stepsize", 0.01),
        max_stepsize=over.pop("max_stepsize", 1.0),
        **over,
    )
    H, n = target.shape

    def cost(u):
        d = u - target
        return jnp.sum(d * d)

    u0 = jnp.full((H, n), 0.5)
    lbv, ubv = jnp.full((n,), lb), jnp.full((n,), ub)
    return apg_solve(cost, u0, lbv, ubv, cfg)


def test_quadratic_interior_optimum():
    target = jnp.full((5, 3), 0.7)
    st = _solve_quadratic(target)
    np.testing.assert_allclose(np.asarray(st.yk), 0.7, atol=1e-3)
    assert float(st.opt_cost) < 1e-5
    assert float(st.init_cost) == pytest.approx(5 * 3 * 0.04, rel=1e-5)


def test_box_clipping_active():
    """Unconstrained optimum outside the box -> solution on the boundary."""
    target = jnp.full((4, 2), 1.5)
    st = _solve_quadratic(target)
    np.testing.assert_allclose(np.asarray(st.yk), 1.0, atol=1e-6)


def test_ill_conditioned_quadratic():
    """Anisotropic quadratic (condition number 100): APG still converges."""
    scales = jnp.array([10.0, 1.0])
    target = jnp.full((3, 2), 0.6)

    def cost(u):
        d = (u - target) * scales
        return jnp.sum(d * d)

    cfg = APGConfig(max_iter=1000, max_no_improvement_iter=200, rtol=1e-8)
    st = apg_solve(cost, jnp.full((3, 2), 0.5), jnp.zeros(2), jnp.ones(2), cfg)
    np.testing.assert_allclose(np.asarray(st.yk), 0.6, atol=1e-2)


def test_precond_exact_metric_kills_conditioning():
    """An exact diagonal preconditioner (D = 1/diag Hessian, rescaled) makes
    the anisotropic quadratic behave like the isotropic one: same minimizer,
    far fewer iterations than unpreconditioned."""
    scales = jnp.array([30.0, 1.0])      # Hessian diag = 2*scales^2
    target = jnp.full((3, 2), 0.6)

    def cost(u):
        d = (u - target) * scales
        return jnp.sum(d * d)

    cfg = APGConfig(max_iter=2000, max_no_improvement_iter=400, rtol=1e-9,
                    atol=1e-10)
    u0 = jnp.full((3, 2), 0.5)
    st_plain = apg_solve(cost, u0, jnp.zeros(2), jnp.ones(2), cfg)
    hdiag = 2.0 * scales**2
    D = jnp.broadcast_to(jnp.min(hdiag) / hdiag, (3, 2))   # max(D)=1
    st_pre = apg_solve(cost, u0, jnp.zeros(2), jnp.ones(2), cfg, precond=D)
    np.testing.assert_allclose(np.asarray(st_pre.yk), 0.6, atol=1e-3)
    assert float(st_pre.num_steps) < 0.5 * float(st_plain.num_steps)


def test_bb_reset_option_converges_faster():
    """reset_option='bb': Barzilai–Borwein trial stepsize must converge to
    the same optimum and land trial steps near 1/L (fewer iterations on the
    ramp-limited regime: tiny init_stepsize, mild increase_factor)."""
    target = jnp.full((4, 3), 0.8)

    def cost(u):
        d = u - target
        return jnp.sum(d * d)

    base = dict(max_iter=500, max_no_improvement_iter=100,
                init_stepsize=1e-4, increase_factor=1.1, rtol=1e-9)
    u0 = jnp.full((4, 3), 0.5)
    st_inc = apg_solve(cost, u0, jnp.zeros(3), jnp.ones(3),
                       APGConfig(reset_option="increase", **base))
    st_bb = apg_solve(cost, u0, jnp.zeros(3), jnp.ones(3),
                      APGConfig(reset_option="bb", **base))
    np.testing.assert_allclose(np.asarray(st_bb.yk), 0.8, atol=1e-3)
    assert float(st_bb.num_steps) < float(st_inc.num_steps)


def test_stats_fields_populated():
    target = jnp.full((5, 3), 0.7)
    st = _solve_quadratic(target)
    assert float(st.num_steps) >= 1
    assert float(st.avg_linesearch) >= 1.0
    assert float(st.avg_stepsize) > 0
    assert float(st.stepsize) > 0
    assert float(st.opt_cost) <= float(st.init_cost)
    assert float(st.grad_sqr) >= 0


def test_early_stop_at_optimum():
    """Starting at the optimum stops almost immediately via atol/rtol."""
    target = jnp.full((4, 2), 0.5)
    st = _solve_quadratic(target)
    assert float(st.num_steps) <= 3
    assert float(st.opt_cost) == pytest.approx(0.0, abs=1e-10)


def test_max_iter_respected():
    target = jnp.full((4, 2), 0.9)
    st = _solve_quadratic(target, max_iter=7, max_no_improvement_iter=1000)
    assert float(st.num_steps) <= 7


def test_monotone_best_cost():
    """opt_cost is the best iterate's cost - never above init."""
    rs = np.random.RandomState(0)
    A = jnp.asarray(rs.randn(6, 6).astype(np.float32))

    def cost(u):
        v = (A @ u).ravel()
        return jnp.sum(v * v) + jnp.sum(jnp.sin(3 * u))

    cfg = APGConfig(max_iter=100, max_no_improvement_iter=30)
    st = apg_solve(cost, jnp.full((6, 2), 0.5), jnp.zeros(2), jnp.ones(2), cfg)
    assert float(st.opt_cost) <= float(st.init_cost) + 1e-9


def test_no_linesearch_mode():
    cfg = APGConfig(use_linesearch=False, stepsize=0.1, max_iter=200,
                    max_no_improvement_iter=50)
    target = jnp.full((3, 2), 0.7)

    def cost(u):
        d = u - target
        return jnp.sum(d * d)

    st = apg_solve(cost, jnp.full((3, 2), 0.5), jnp.zeros(2), jnp.ones(2), cfg)
    np.testing.assert_allclose(np.asarray(st.yk), 0.7, atol=1e-3)


def test_conservative_reset_option():
    cfg = APGConfig(reset_option="conservative", max_iter=300,
                    max_no_improvement_iter=50)
    target = jnp.full((3, 2), 0.8)

    def cost(u):
        d = u - target
        return jnp.sum(d * d)

    st = apg_solve(cost, jnp.full((3, 2), 0.5), jnp.zeros(2), jnp.ones(2), cfg)
    np.testing.assert_allclose(np.asarray(st.yk), 0.8, atol=1e-2)


def test_moment_scale_constant():
    cfg = APGConfig(moment_scale=0.5, max_iter=300, max_no_improvement_iter=50)
    target = jnp.full((3, 2), 0.8)

    def cost(u):
        d = u - target
        return jnp.sum(d * d)

    st = apg_solve(cost, jnp.full((3, 2), 0.5), jnp.zeros(2), jnp.ones(2), cfg)
    np.testing.assert_allclose(np.asarray(st.yk), 0.8, atol=1e-2)


def test_box_project():
    u = jnp.array([[-1.0, 0.5, 2.0]])
    np.testing.assert_allclose(
        np.asarray(box_project(u, jnp.float32(0.0), jnp.float32(1.0))),
        [[0.0, 0.5, 1.0]],
    )


def test_from_config_parses_reference_schema():
    cfg = {
        "apg_mpc": {
            "stepsize": 1.0,
            "max_iter": 200,
            "max_no_improvement_iter": 200,
            "moment_scale": None,
            "beta_init": 0.25,
            "atol": 1e-8,
            "rtol": 1e-6,
            "linesearch": {
                "init_stepsize": 0.01,
                "max_stepsize": 1.0,
                "coef": 0.01,
                "decrease_factor": 0.7,
                "increase_factor": 1.3,
                "reset_option": "increase",
                "maxls": 4,
            },
        }
    }
    a = APGConfig.from_config(cfg)
    assert a.max_iter == 200 and a.use_linesearch and a.maxls == 4
    assert a.moment_scale is None and a.reset_option == "increase"


def test_vmappable():
    """The solver is a pure function: vmap over a batch of targets."""
    targets = jnp.stack([jnp.full((3, 2), 0.3), jnp.full((3, 2), 0.9)])
    cfg = APGConfig(max_iter=200, max_no_improvement_iter=50)

    def solve_one(tgt):
        return apg_solve(
            lambda u: jnp.sum((u - tgt) ** 2),
            jnp.full((3, 2), 0.5), jnp.zeros(2), jnp.ones(2), cfg
        ).yk

    out = jax.vmap(solve_one)(targets)
    np.testing.assert_allclose(np.asarray(out[0]), 0.3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(out[1]), 0.9, atol=1e-2)


def test_stepsize_carry_skips_ramp():
    """t_init (the previous solve's APGState.stepsize) resumes the
    linesearch at a workable step: a warm re-solve converges in fewer
    iterations than one re-ramping from init_stepsize."""
    target = jnp.full((5, 3), 0.7)
    cfg = APGConfig(max_iter=300, max_no_improvement_iter=50,
                    init_stepsize=0.001)

    def cost(u):
        d = u - target
        return jnp.sum(d * d)

    u0 = jnp.full((5, 3), 0.5)
    lbv, ubv = jnp.zeros(3), jnp.ones(3)
    st1 = apg_solve(cost, u0, lbv, ubv, cfg)
    # warm restart near the optimum, with and without the carried stepsize
    u_warm = st1.yk + 0.01
    st_cold = apg_solve(cost, u_warm, lbv, ubv, cfg)
    st_carry = apg_solve(cost, u_warm, lbv, ubv, cfg, t_init=st1.stepsize)
    assert float(st_carry.num_steps) < float(st_cold.num_steps)
    np.testing.assert_allclose(np.asarray(st_carry.yk), 0.7, atol=1e-3)
    # non-positive t_init falls back to init_stepsize exactly
    st_zero = apg_solve(cost, u_warm, lbv, ubv, cfg, t_init=jnp.float32(0.0))
    assert float(st_zero.num_steps) == float(st_cold.num_steps)
    assert float(st_zero.opt_cost) == pytest.approx(float(st_cold.opt_cost))


def test_momentum_restart_counter():
    """momentum_restart=True re-grows beta from beta_init after an adaptive
    restart instead of keeping the global k/(k+3) schedule; both variants
    must still converge on an ill-conditioned problem."""
    scales = jnp.array([30.0, 1.0])
    target = jnp.full((3, 2), 0.6)

    def cost(u):
        d = (u - target) * scales
        return jnp.sum(d * d)

    u0 = jnp.full((3, 2), 0.5)
    lbv, ubv = jnp.zeros(2), jnp.ones(2)
    base = dict(max_iter=1000, max_no_improvement_iter=200, rtol=1e-8)
    st_on = apg_solve(cost, u0, lbv, ubv, APGConfig(momentum_restart=True, **base))
    st_off = apg_solve(cost, u0, lbv, ubv, APGConfig(momentum_restart=False, **base))
    np.testing.assert_allclose(np.asarray(st_on.yk), 0.6, atol=1e-2)
    np.testing.assert_allclose(np.asarray(st_off.yk), 0.6, atol=1e-2)
    # neither variant may stall at the iteration cap on this problem (the
    # restart's measured win is removing max_iter pinning on flight configs;
    # per-problem iteration counts can go either way, so don't compare them)
    assert float(st_on.num_steps) < 1000
    assert float(st_off.num_steps) < 1000
