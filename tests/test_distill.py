"""Amortized-policy solver family (models/policy.py, learning/distill.py,
``solver: policy`` in engine/mpc_loader.py): feature invariances, hover
init, solver contract, distillation learning signal, checkpoint IO."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde4mbrl_px4_tpu.core.types import hover_state
from sde4mbrl_px4_tpu.models.policy import (
    featurize, init_policy, policy_apply, policy_feat_dim,
)


@pytest.fixture(scope="module")
def small_cfg(repo_root):
    import yaml

    cfg = yaml.safe_load(open(os.path.join(repo_root, "configs/iris_posctrl_mpc.yaml")))
    cfg["horizon"] = 6
    cfg["num_short_dt"] = 6
    cfg["apg_mpc"]["max_iter"] = 15
    cfg["apg_mpc"]["max_no_improvement_iter"] = 15
    cfg["learned_model_params"] = os.path.join(repo_root, "configs/models/iris_sde.pkl")
    return cfg


def test_featurize_translation_invariant():
    """Shifting state and reference window by the same world offset must not
    change the policy input (the feature set is relative by construction)."""
    x = np.asarray(hover_state()).copy()
    x[3:6] = [0.3, -0.2, 0.1]
    x[10:13] = [0.05, -0.1, 0.2]
    H = 6
    ref = np.tile(np.asarray(hover_state()), (H + 1, 1))
    ref[:, 0] = np.linspace(0, 2, H + 1)
    u_prev = np.full((4,), 0.7, np.float32)
    f0 = featurize(jnp.asarray(x), jnp.asarray(ref), jnp.asarray(u_prev))
    off = np.array([5.0, -3.0, 2.0], np.float32)
    x2 = x.copy(); x2[0:3] += off
    ref2 = ref.copy(); ref2[:, 0:3] += off
    f1 = featurize(jnp.asarray(x2), jnp.asarray(ref2), jnp.asarray(u_prev))
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=1e-5)
    assert f0.shape == (policy_feat_dim(H, 4),)


def test_featurize_quaternion_double_cover():
    """q and -q are the same attitude — identical features."""
    x = np.asarray(hover_state()).copy()
    x[6:10] = [0.9, 0.1, -0.2, 0.4]
    x[6:10] /= np.linalg.norm(x[6:10])
    ref = np.tile(np.asarray(hover_state()), (7, 1))
    u_prev = np.full((4,), 0.7, np.float32)
    f0 = featurize(jnp.asarray(x), jnp.asarray(ref), jnp.asarray(u_prev))
    x2 = x.copy(); x2[6:10] = -x2[6:10]
    f1 = featurize(jnp.asarray(x2), jnp.asarray(ref), jnp.asarray(u_prev))
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=1e-5)


def test_untrained_policy_hovers():
    """The head bias init puts the fresh policy at uref everywhere."""
    H, n_u = 6, 4
    lb, ub = np.full(n_u, 1e-4), np.ones(n_u)
    uref = np.full(n_u, 0.71, np.float32)
    p = init_policy(jax.random.PRNGKey(0), H, n_u, lb, ub, uref)
    x = jnp.asarray(hover_state())
    ref = jnp.tile(x, (H + 1, 1))
    u = policy_apply(jax.tree.map(jnp.asarray, p),
                     featurize(x, ref, jnp.asarray(uref)),
                     jnp.asarray(lb), jnp.asarray(ub))
    assert u.shape == (H, n_u)
    np.testing.assert_allclose(np.asarray(u), 0.71, atol=0.02)


def test_solver_policy_contract(small_cfg):
    """``solver: policy`` satisfies the reference mpc_fn contract
    (``sde_control.py:412``): shapes, box feasibility, APGState fields,
    shifted warm start, jit-stability."""
    from sde4mbrl_px4_tpu.engine.mpc_loader import make_mpc_from_config

    cfg = dict(small_cfg); cfg["solver"] = "policy"
    c, (reset_fn, mpc_fn), sft, bundle = make_mpc_from_config(cfg)
    assert sft is None
    x = jnp.asarray(hover_state())
    rng = jax.random.PRNGKey(0)
    st = reset_fn(x, rng, x)
    sol = jax.jit(mpc_fn)(x, rng, st, 0.0, xdes=x)
    H, n_u = 6, 4
    assert sol.u_opt.shape == (H, n_u)
    assert sol.x_evol.shape == (H + 1, 13)
    u = np.asarray(sol.u_opt)
    assert (u >= np.asarray(bundle.lb) - 1e-6).all()
    assert (u <= np.asarray(bundle.ub) + 1e-6).all()
    assert float(sol.opt_state.num_steps) == 0.0
    assert np.isfinite(float(sol.opt_state.opt_cost))
    # next solve consumes the shifted warm start without recompiling
    sol2 = jax.jit(mpc_fn)(x, sol.rng, sol.opt_state, 0.0, xdes=x)
    assert sol2.u_opt.shape == (H, n_u)


def test_policy_refine_contract(small_cfg):
    """``policy: {refine_iters: N}`` — amortized init + short APG polish:
    num_steps reports the refinement iterations, commands stay in the box,
    and the warm start is cold-gated (first solve seeds from the network,
    steady solves from the shifted previous plan)."""
    from sde4mbrl_px4_tpu.engine.mpc_loader import make_mpc_from_config

    cfg = dict(small_cfg)
    cfg["solver"] = "policy"
    cfg["policy"] = {"hidden": [32], "refine_iters": 4}
    _, (reset_fn, mpc_fn), _, bundle = make_mpc_from_config(cfg)
    x = jnp.asarray(hover_state()).at[0].add(1.0)
    tgt = jnp.asarray(hover_state())
    rng = jax.random.PRNGKey(0)
    st = reset_fn(x, rng, x)
    assert float(st.num_steps) == 0.0            # cold
    jm = jax.jit(mpc_fn)
    sol = jm(x, rng, st, 0.0, tgt)
    assert float(sol.opt_state.num_steps) == 4.0  # refinement iterations ran
    u = np.asarray(sol.u_opt)
    assert (u >= np.asarray(bundle.lb) - 1e-6).all()
    assert (u <= np.asarray(bundle.ub) + 1e-6).all()
    # refinement improves on the network's plan (cost telemetry decreases)
    assert float(sol.opt_state.opt_cost) <= float(sol.opt_state.init_cost)
    # second solve consumes the shifted warm start, same shapes, no retrace
    sol2 = jm(sol.x_evol[1], sol.rng, sol.opt_state, 0.0, tgt)
    assert sol2.u_opt.shape == sol.u_opt.shape

    cfg_bad = dict(small_cfg)
    cfg_bad["solver"] = "policy"
    cfg_bad["policy"] = {"refine_iters": -1}
    with pytest.raises(ValueError, match="refine_iters"):
        make_mpc_from_config(cfg_bad)


def test_solver_policy_rejects_prox_slack(small_cfg):
    from sde4mbrl_px4_tpu.engine.mpc_loader import make_mpc_from_config

    cfg = dict(small_cfg)
    cfg["solver"] = "policy"
    cfg["state_constr"] = {
        "state_id": [2], "state_bound": [[-5.0, 0.0]],
        "state_penalty": [10.0], "slack_scaling": [1.0],
        "slack_proximal": True,
    }
    with pytest.raises(ValueError, match="slack_proximal"):
        make_mpc_from_config(cfg)


@pytest.mark.slow
def test_distillation_learns_expert(small_cfg):
    """End-to-end: sample → converged-APG labels → train. The trained policy
    must (a) cut the supervised loss and (b) beat the untrained hover policy
    at matching the expert's first commanded control on held-out states."""
    from sde4mbrl_px4_tpu.engine.mpc_loader import make_mpc_from_config
    from sde4mbrl_px4_tpu.learning.distill import (
        DistillConfig, build_features, label_states, sample_states,
        train_policy,
    )

    dcfg = DistillConfig(
        n_states=96, expert_max_iter=40, hidden=(64, 64),
        batch_size=64, steps=400, pos_std=0.4, vel_std=0.3,
        tilt_std=0.1, yaw_std=0.2, rate_std=0.3, seed=3)
    cfg = dict(small_cfg)
    _, _, _, bundle = make_mpc_from_config(dict(cfg))
    rng = jax.random.PRNGKey(1)
    xs, ts, xdes, ups = sample_states(bundle, dcfg.n_states, rng, dcfg)
    labels = label_states(cfg, xs, ts, xdes, jax.random.PRNGKey(2), dcfg,
                          u_prevs=ups)
    assert labels.shape == (dcfg.n_states, 6, 4)
    feats = build_features(bundle, xs, ts, xdes, ups)
    n_tr = 80
    params, stats = train_policy(
        feats[:n_tr], labels[:n_tr], bundle.lb, bundle.ub,
        bundle.cost_params.uref, dcfg)
    assert stats["losses"][-1] < 0.5 * stats["losses"][0]

    # held-out first-step command error vs the hover baseline
    pred = policy_apply(params, feats[n_tr:], bundle.lb, bundle.ub)
    err = float(jnp.mean(jnp.abs(pred[:, 0] - labels[n_tr:, 0])))
    hover = jnp.broadcast_to(bundle.cost_params.uref, labels[n_tr:, 0].shape)
    err_hover = float(jnp.mean(jnp.abs(hover - labels[n_tr:, 0])))
    assert err < err_hover, (err, err_hover)

    # A TRAINED checkpoint serves through the refine_iters hybrid: the
    # cold first solve seeds from the network's plan (init_cost is the
    # network plan's cost) and the short polish only improves it. (Whether
    # the network init beats hover is not decidable at this toy horizon —
    # a 0.3 s lookahead barely moves the horizon cost; the closed-loop
    # frontier is measured in engine/mpc_loader.py and
    # examples/policy_distill.py instead.)
    from sde4mbrl_px4_tpu.learning.distill import save_policy
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        ckpt = os.path.join(td, "pol.pkl")
        save_policy(ckpt, jax.tree.map(np.asarray, params))
        cfg_pol = dict(cfg)
        cfg_pol["solver"] = "policy"
        cfg_pol["policy"] = {"params_path": ckpt, "refine_iters": 2,
                             "hidden": list(dcfg.hidden)}
        _, (reset_p, mpc_p), _, _ = make_mpc_from_config(cfg_pol)
        x0 = jnp.asarray(hover_state()).at[0:3].add(
            jnp.asarray([1.0, -0.7, 0.4]))
        tgt = jnp.asarray(hover_state())
        rng = jax.random.PRNGKey(9)
        sp = mpc_p(x0, rng, reset_p(x0, rng, x0), 0.0, xdes=tgt)
        assert float(sp.opt_state.num_steps) == 2.0
        assert (float(sp.opt_state.opt_cost)
                <= float(sp.opt_state.init_cost) + 1e-6)


@pytest.mark.slow
def test_label_states_mesh_matches_unsharded(small_cfg):
    """Mesh-sharded labeling == plain vmap labeling (same expert, same
    rngs), including a batch that does NOT divide the dp axis (padded)."""
    from sde4mbrl_px4_tpu.engine.mpc_loader import make_mpc_from_config
    from sde4mbrl_px4_tpu.learning.distill import (
        DistillConfig, label_states, sample_states,
    )
    from sde4mbrl_px4_tpu.parallel.mesh import make_mesh

    dcfg = DistillConfig(n_states=10, expert_max_iter=12)
    cfg = dict(small_cfg)
    _, _, _, bundle = make_mpc_from_config(dict(cfg))
    xs, ts, xdes, ups = sample_states(bundle, 10, jax.random.PRNGKey(5), dcfg)
    mesh = make_mesh((len(jax.devices()), 1))
    lab_mesh = label_states(cfg, xs, ts, xdes, jax.random.PRNGKey(6), dcfg,
                            mesh=mesh, u_prevs=ups)
    lab_ref = label_states(cfg, xs, ts, xdes, jax.random.PRNGKey(6), dcfg,
                           u_prevs=ups)
    assert lab_mesh.shape == (10, 6, 4)
    np.testing.assert_allclose(np.asarray(lab_mesh), np.asarray(lab_ref),
                               atol=2e-4)


def test_dagger_harvest_covers_engagement(small_cfg):
    """The DAgger state harvest rolls the policy closed-loop from
    independent (start, target) pairs — visited states must differ across
    rollouts and stay finite (the aggregation set the retrain consumes)."""
    from sde4mbrl_px4_tpu.engine.mpc_loader import make_mpc_from_config
    from sde4mbrl_px4_tpu.learning.distill import DistillConfig, _dagger_states

    cfg = dict(small_cfg)
    _, _, _, bundle = make_mpc_from_config(dict(cfg))
    lb, ub = np.asarray(bundle.lb), np.asarray(bundle.ub)
    p = jax.tree.map(jnp.asarray, init_policy(
        jax.random.PRNGKey(0), 6, 4, lb, ub,
        np.asarray(bundle.cost_params.uref), hidden=(32,)))
    dcfg = DistillConfig(dagger_rollouts=4, dagger_steps=5)
    xs, ts, xdes, ups = _dagger_states(cfg, bundle, p, dcfg,
                                       jax.random.PRNGKey(7))
    assert xs.shape == (20, 13) and ts.shape == (20,) and xdes.shape == (20, 13)
    assert ups.shape == (20, 4)
    assert np.isfinite(np.asarray(xs)).all()
    # harvested u_prev context stays inside the input box (it's a policy
    # output fed back, so feasibility is a property worth pinning)
    assert (np.asarray(ups) >= np.asarray(bundle.lb) - 1e-6).all()
    assert (np.asarray(ups) <= np.asarray(bundle.ub) + 1e-6).all()
    # rollouts start from distinct positions
    first_step = np.asarray(xs.reshape(5, 4, 13)[0])
    assert np.std(first_step[:, 0]) > 0.1


def test_policy_checkpoint_roundtrip(small_cfg, tmp_path):
    """save_policy → ``policy.params_path`` serving; horizon mismatch is a
    load-time error, not silent garbage."""
    from sde4mbrl_px4_tpu.engine.mpc_loader import make_mpc_from_config
    from sde4mbrl_px4_tpu.learning.distill import load_policy, save_policy

    lb, ub = np.full(4, 1e-4), np.ones(4)
    p = init_policy(jax.random.PRNGKey(0), 6, 4, lb, ub,
                    np.full(4, 0.71, np.float32), hidden=(32,))
    path = str(tmp_path / "pol.pkl")
    save_policy(path, p, {"note": "test"})
    p2, meta = load_policy(path)
    assert meta["note"] == "test"
    np.testing.assert_allclose(np.asarray(p2["net"]["w0"]), p["net"]["w0"])

    cfg = dict(small_cfg)
    cfg["solver"] = "policy"
    cfg["policy"] = {"params_path": path}
    _, (reset_fn, mpc_fn), _, bundle = make_mpc_from_config(cfg)
    x = jnp.asarray(hover_state())
    sol = mpc_fn(x, jax.random.PRNGKey(0), reset_fn(x, jax.random.PRNGKey(0), x))
    assert sol.u_opt.shape == (6, 4)

    cfg_bad = dict(cfg); cfg_bad["horizon"] = 8; cfg_bad["num_short_dt"] = 8
    with pytest.raises(ValueError, match="horizon"):
        make_mpc_from_config(cfg_bad)


def test_policy_missing_checkpoint_is_an_error(small_cfg, tmp_path):
    """A typo'd ``policy.params_path`` must refuse to load, not silently
    serve an untrained hover policy; omitting params_path still gives the
    untrained init (training/bench use)."""
    from sde4mbrl_px4_tpu.engine.mpc_loader import make_mpc_from_config

    cfg = dict(small_cfg)
    cfg["solver"] = "policy"
    cfg["policy"] = {"params_path": str(tmp_path / "nope.pkl")}
    with pytest.raises(ValueError, match="does not exist"):
        make_mpc_from_config(cfg)

    cfg_ok = dict(small_cfg)
    cfg_ok["solver"] = "policy"
    cfg_ok["policy"] = {"hidden": [32]}
    _, (reset_fn, mpc_fn), _, _ = make_mpc_from_config(cfg_ok)
    x = jnp.asarray(hover_state())
    sol = mpc_fn(x, jax.random.PRNGKey(0),
                 reset_fn(x, jax.random.PRNGKey(0), x))
    assert sol.u_opt.shape == (6, 4)
