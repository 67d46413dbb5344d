"""MPC distillation: amortize the APG solver into a one-shot policy (L6).

The reference spends up to 200 APG iterations × 4 linesearch evals per
control period recomputing a plan from scratch-ish warm starts
(``launch/iris_sitl_traj_mpc.yaml:60``, ``sde_control.py:420-425``). This
module distills those converged solves into the policy network of
``models/policy.py``:

1. **Collect** training states by perturbing the reference trajectory (or
   the hover/pos-control envelope) — position, velocity, attitude, rate
   noise spanning the engagement envelope the controller actually sees;
2. **Label** every state with a converged APG solve, batched over the
   device mesh (``parallel/batched.py`` scenario-DP: the labeling pass
   runs at the measured 11k solves/s/chip regime — the dataset costs
   seconds, not hours);
3. **Train** the policy supervised (normalized-control MSE, horizon-decay
   weighting), one jitted update step with donated optimizer state;
4. optional **DAgger rounds**: roll the current policy closed-loop through
   the SDE plant and relabel the states it visits, fixing covariate shift.

Serving: save with ``save_policy`` and point a config at it
(``solver: policy`` + ``policy: {params_path: ...}``) — the engine,
telemetry, fleet, and mesh machinery are unchanged
(``engine/mpc_loader.py``).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sde4mbrl_px4_tpu.core.frames import enu2ned
from sde4mbrl_px4_tpu.core import quaternion as quat
from sde4mbrl_px4_tpu.models.policy import (
    POLICY_KIND,
    featurize,
    init_policy,
    policy_apply,
)
from sde4mbrl_px4_tpu.models.params_io import load_params, save_params

__all__ = [
    "DistillConfig",
    "sample_states",
    "label_states",
    "build_features",
    "train_policy",
    "distill_policy",
    "save_policy",
    "load_policy",
]


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    n_states: int = 4096
    pos_std: float = 0.5          # m, NED (fine noise around the anchor)
    target_std: float = 2.0       # m, pos-control start↔target separation:
                                  # starts and targets are drawn INDEPENDENTLY
                                  # so the dataset covers the engagement
                                  # transient (a policy trained only near its
                                  # target diverges on a 2 m step input —
                                  # measured on the fleet demo)
    vel_std: float = 1.0          # m/s (mid-transient speeds, not just hover)
    tilt_std: float = 0.25        # rad (roll/pitch perturbation)
    yaw_std: float = 0.3          # rad
    rate_std: float = 0.5         # rad/s
    expert_max_iter: int = 300    # labeling budget (> flight budget: labels
                                  # should be converged, not real-time)
    hidden: Tuple[int, ...] = (256, 256)
    batch_size: int = 256
    steps: int = 3000
    lr: float = 1e-3
    weight_decay: float = 1e-5
    horizon_tau: float = 0.5      # loss weight exp(-k/(tau*H)) along horizon:
                                  # step 0 is what gets flown; the tail only
                                  # shapes the predicted trajectory
    dagger_rounds: int = 0
    dagger_rollouts: int = 32     # parallel policy rollouts per DAgger round
    dagger_steps: int = 100       # closed-loop plant steps per rollout
    seed: int = 0


# ---------------------------------------------------------------------------
# dataset


def _expert_cfg(cfg: Dict[str, Any], dcfg: DistillConfig) -> Dict[str, Any]:
    """The labeling expert: same problem, APG solver, converged budget."""
    ecfg = dict(cfg)
    ecfg.pop("solver", None)
    ecfg.pop("policy", None)
    apg = dict(ecfg.get("apg_mpc", {}))
    apg["max_iter"] = int(max(apg.get("max_iter", 200), dcfg.expert_max_iter))
    apg["max_no_improvement_iter"] = apg["max_iter"]
    ecfg["apg_mpc"] = apg
    return ecfg


def sample_states(
    bundle,
    n: int,
    rng: jax.Array,
    dcfg: DistillConfig = DistillConfig(),
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """→ ``(xs[n,13] NED, ts[n], xdes[n,13] ENU, u_prevs[n,n_u])``.

    Trajectory configs: anchor at ``state_from_traj(t)`` for uniform random
    ``t`` over the table, then perturb. Pos-control configs: anchor at a
    random hover target and offset the start (``xdes`` is ENU at the public
    boundary, matching ``mpc_fn``'s convention, ``engine/mpc_loader.py``).
    ``u_prevs`` is the previous-command context (a policy/expert input via
    the slew cost and the feature vector): uref plus noise, inside the box.
    """
    ks = jax.random.split(rng, 8)
    sft = bundle.state_from_traj
    if sft is not None:
        # table horizon: sample over [0, T_table); sft clamps past the end.
        T = float(getattr(sft, "t_max", 10.0))
        ts = jax.random.uniform(ks[0], (n,), minval=0.0, maxval=T)
        anchors_enu = sft(ts)                                 # (n,13) ENU (batched sampler)
        anchors = enu2ned(anchors_enu)                        # NED (batched)
        xdes = anchors_enu                                    # unused in traj mode
    else:
        ts = jnp.zeros((n,), jnp.float32)
        from sde4mbrl_px4_tpu.core.types import hover_state

        hov = jnp.asarray(hover_state())
        k_t, k_s, k_y = jax.random.split(ks[5], 3)
        targets = jnp.tile(hov, (n, 1))
        targets = targets.at[:, 0:3].add(
            dcfg.target_std * jax.random.normal(k_t, (n, 3), jnp.float32))
        # Target attitude: yaw-only, uniform over the circle. The mission
        # layer zeroes roll/pitch of target quaternions (reference
        # ``basic_control.py:545-553``) but the yaw is free — and an
        # ENU-identity setpoint is a LARGE NED yaw target after frame
        # conversion, so a policy trained only on identity-NED attitudes
        # diverges on the first real fleet target (measured).
        yaws = jax.random.uniform(k_y, (n,), minval=-np.pi, maxval=np.pi)
        targets = targets.at[:, 6:10].set(jax.vmap(quat.q_from_yaw)(yaws))
        # starts drawn independently of targets: the relative-position
        # features must span the full engagement envelope
        anchors = jnp.tile(hov, (n, 1))
        anchors = anchors.at[:, 0:3].add(
            dcfg.target_std * jax.random.normal(k_s, (n, 3), jnp.float32))
        xdes = enu2ned(targets)                               # ENU target (involution)
    # perturb: position / velocity / attitude / rates
    xs = anchors
    xs = xs.at[:, 0:3].add(dcfg.pos_std * jax.random.normal(ks[1], (n, 3)))
    xs = xs.at[:, 3:6].add(dcfg.vel_std * jax.random.normal(ks[2], (n, 3)))
    ang = jnp.concatenate([
        dcfg.tilt_std * jax.random.normal(ks[3], (n, 2)),
        dcfg.yaw_std * jax.random.normal(ks[6], (n, 1)),
    ], axis=1)
    dq = jax.vmap(quat.q_from_euler)(ang[:, 0], ang[:, 1], ang[:, 2])
    q_new = jax.vmap(quat.qmul)(xs[:, 6:10], dq)
    xs = xs.at[:, 6:10].set(jax.vmap(quat.qnormalize)(q_new))
    xs = xs.at[:, 10:13].add(dcfg.rate_std * jax.random.normal(ks[4], (n, 3)))
    n_u = bundle.model.n_u
    u_prevs = jnp.clip(
        jnp.broadcast_to(bundle.cost_params.uref, (n, n_u))
        + 0.1 * jax.random.normal(ks[7], (n, n_u), jnp.float32),
        bundle.lb, bundle.ub)
    return (xs.astype(jnp.float32), ts.astype(jnp.float32),
            xdes.astype(jnp.float32), u_prevs.astype(jnp.float32))


def label_states(
    cfg: Dict[str, Any],
    xs: jax.Array,
    ts: jax.Array,
    xdes: jax.Array,
    rng: jax.Array,
    dcfg: DistillConfig = DistillConfig(),
    mesh=None,
    u_prevs: Optional[jax.Array] = None,
) -> jax.Array:
    """Converged expert plans ``u*[n, H, n_u]`` for each state.

    With a ``mesh``, labeling shards scenario-DP over the devices
    (``parallel/batched.py``); otherwise a plain jitted ``vmap``.
    ``u_prevs`` seeds the expert's warm-start row 0, so the label actually
    DEPENDS on the previous-command feature (the slew cost reads
    ``opt_state.yk[0]``, ``engine/mpc_loader.py``) — otherwise the policy
    would correctly learn to ignore that input.
    """
    ecfg = _expert_cfg(cfg, dcfg)
    n = int(xs.shape[0])
    rngs = jax.random.split(rng, n)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from sde4mbrl_px4_tpu.parallel.batched import make_batched_mpc

        # pad to a dp-divisible batch (sharded leading axis), slice back
        dp = int(mesh.shape["dp"])
        pad = (-n) % dp
        if pad:
            xs = jnp.concatenate([xs, jnp.tile(xs[-1:], (pad, 1))])
            ts = jnp.concatenate([ts, jnp.tile(ts[-1:], (pad,))])
            xdes = jnp.concatenate([xdes, jnp.tile(xdes[-1:], (pad, 1))])
            rngs = jnp.concatenate([rngs, jnp.tile(rngs[-1:], (pad, 1))])
            if u_prevs is not None:
                u_prevs = jnp.concatenate(
                    [u_prevs, jnp.tile(u_prevs[-1:], (pad, 1))])
        reset_b, mpc_b, bundle = make_batched_mpc(ecfg, mesh)
        sh = NamedSharding(mesh, P("dp", None))
        xs = jax.device_put(xs, sh)
        st = reset_b(xs, rngs, xdes)
        if u_prevs is not None:
            n_u = bundle.model.n_u
            st = st._replace(yk=st.yk.at[:, 0, :n_u].set(u_prevs))
        u_opt, _, _, _ = mpc_b(xs, rngs, st, ts, xdes)
        return u_opt[:n]
    from sde4mbrl_px4_tpu.engine.mpc_loader import make_mpc_from_config

    _, (reset_fn, mpc_fn), _, bundle = make_mpc_from_config(ecfg)
    n_u = bundle.model.n_u

    @jax.jit
    def _solve(x, key, t, xd, up):
        st = reset_fn(x, key, xd)
        if up is not None:
            st = st._replace(yk=st.yk.at[0, :n_u].set(up))
        sol = mpc_fn(x, key, st, curr_t=t, xdes=xd)
        return sol.u_opt

    if u_prevs is None:
        u_prevs = jnp.broadcast_to(
            jnp.asarray(bundle.cost_params.uref), (n, n_u))
    return jax.vmap(_solve)(xs, rngs, ts, xdes, u_prevs)


def build_features(bundle, xs: jax.Array, ts: jax.Array, xdes: jax.Array,
                   u_prevs: Optional[jax.Array] = None) -> jax.Array:
    """Policy inputs for a batch of states — the SAME reference window the
    ``solver: policy`` serving path builds (``engine/mpc_loader.py``
    ``_build_ref``: trajectory knots in NED, or the broadcast NED target).
    ``u_prevs`` defaults to uref (hover context)."""
    sft = bundle.state_from_traj
    knots = bundle.knot_times
    if u_prevs is None:
        u_prevs = jnp.broadcast_to(
            jnp.asarray(bundle.cost_params.uref),
            (xs.shape[0], bundle.model.n_u))

    def _one(x, t, xd, up):
        if sft is not None:
            ref = sft(t + knots)
            ref = enu2ned(ref) if bundle.convert_to_enu else ref
        else:
            tgt = enu2ned(xd) if bundle.convert_to_enu else xd
            ref = jnp.broadcast_to(tgt, (knots.shape[0], 13))
        return featurize(x, ref, up)

    return jax.vmap(_one)(xs, ts, xdes, u_prevs)


# ---------------------------------------------------------------------------
# training


def train_policy(
    feats: jax.Array,
    labels: jax.Array,
    lb: jax.Array,
    ub: jax.Array,
    uref: jax.Array,
    dcfg: DistillConfig = DistillConfig(),
    params: Optional[Dict[str, Any]] = None,
    verbose: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Supervised distillation → ``(policy_params, stats)``.

    Loss: MSE in normalized-control space ``(u − lb)/(ub − lb)`` with
    exponential horizon-decay weights — the first plan step is the command
    that actually reaches the motors (``sde_control.py:300-308`` picks by
    time index near 0), later steps only shape the predicted trajectory.
    """
    import optax

    n, H, n_u = labels.shape
    rng = jax.random.PRNGKey(dcfg.seed)
    if params is None:
        params = jax.tree.map(jnp.asarray, init_policy(
            rng, H, n_u, np.asarray(lb), np.asarray(ub), np.asarray(uref),
            hidden=dcfg.hidden))
    span = ub - lb
    y = (labels - lb) / span                                   # (n, H, n_u)
    w = jnp.exp(-jnp.arange(H) / (dcfg.horizon_tau * H))[:, None]
    w = w / jnp.mean(w)

    # Differentiate the NETWORK subtree only — the checkpoint also carries
    # integer shape metadata (meta_H/meta_n_u), which grad must not touch.
    meta = {k: v for k, v in params.items() if k != "net"}
    net = params["net"]

    # Warmup + cosine decay to ~1% of peak: a constant lr leaves the loss
    # bouncing at the noise floor of the peak step size, and the u[0]
    # precision the flight consumes is made of exactly that floor.
    sched = optax.warmup_cosine_decay_schedule(
        init_value=dcfg.lr * 0.1, peak_value=dcfg.lr,
        warmup_steps=max(10, dcfg.steps // 50),
        decay_steps=dcfg.steps, end_value=dcfg.lr * 0.01)
    tx = optax.adamw(sched, weight_decay=dcfg.weight_decay)
    opt_state = tx.init(net)

    def loss_fn(nn, f, yy):
        pred = policy_apply({**meta, "net": nn}, f, lb, ub)    # (B, H, n_u)
        pn = (pred - lb) / span
        return jnp.mean(w * (pn - yy) ** 2)

    @jax.jit
    def update(nn, o, f, yy):
        l, g = jax.value_and_grad(loss_fn)(nn, f, yy)
        upd, o = tx.update(g, o, nn)
        return optax.apply_updates(nn, upd), o, l

    bs = min(dcfg.batch_size, n)
    losses = []
    key = jax.random.PRNGKey(dcfg.seed + 1)
    t0 = time.perf_counter()
    for step in range(dcfg.steps):
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (bs,), 0, n)
        net, opt_state, l = update(net, opt_state, feats[idx], y[idx])
        if step % 200 == 0 or step == dcfg.steps - 1:
            losses.append(float(l))
            if verbose:
                print(f"  distill step {step}: loss {float(l):.6f}")
    stats = {"losses": losses, "train_s": time.perf_counter() - t0,
             "n": n, "H": H, "n_u": n_u}
    return {**meta, "net": net}, stats


def distill_policy(
    cfg: Dict[str, Any],
    dcfg: DistillConfig = DistillConfig(),
    mesh=None,
    verbose: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Full pipeline: sample → label (batched expert) → train
    (→ optional DAgger rounds). Returns ``(policy_params, stats)``."""
    from sde4mbrl_px4_tpu.engine.mpc_loader import make_mpc_from_config

    _, _, _, bundle = make_mpc_from_config(dict(cfg))
    rng = jax.random.PRNGKey(dcfg.seed)
    k_s, k_l, k_d = jax.random.split(rng, 3)
    xs, ts, xdes, ups = sample_states(bundle, dcfg.n_states, k_s, dcfg)
    t0 = time.perf_counter()
    labels = jax.block_until_ready(
        label_states(cfg, xs, ts, xdes, k_l, dcfg, mesh=mesh, u_prevs=ups))
    label_s = time.perf_counter() - t0
    feats = build_features(bundle, xs, ts, xdes, ups)
    params, stats = train_policy(
        feats, labels, bundle.lb, bundle.ub, bundle.cost_params.uref,
        dcfg, verbose=verbose)
    stats["label_s"] = label_s

    for rd in range(dcfg.dagger_rounds):
        xs2, ts2, xdes2, ups2 = _dagger_states(cfg, bundle, params, dcfg,
                                               jax.random.fold_in(k_d, rd))
        lab2 = label_states(cfg, xs2, ts2, xdes2,
                            jax.random.fold_in(k_l, rd + 1), dcfg, mesh=mesh,
                            u_prevs=ups2)
        feats = jnp.concatenate(
            [feats, build_features(bundle, xs2, ts2, xdes2, ups2)])
        labels = jnp.concatenate([labels, lab2])
        params, st2 = train_policy(
            feats, labels, bundle.lb, bundle.ub, bundle.cost_params.uref,
            dcfg, params=params, verbose=verbose)
        stats[f"dagger{rd}_losses"] = st2["losses"]
    return params, stats


def _dagger_states(cfg, bundle, params, dcfg: DistillConfig, rng: jax.Array):
    """States the CURRENT policy visits — the DAgger aggregation set.

    ``dagger_rollouts`` independent closed-loop flights (policy in the loop,
    mean dynamics as the plant, one ``lax.scan`` over the whole batch):
    trajectory configs stagger start times along the table; pos-control
    configs draw independent (start, target) pairs so the harvested states
    cover the engagement transient the policy actually produces — including
    its own mistakes, which is the point (covariate shift is what made the
    pre-DAgger fleet demo diverge)."""
    from sde4mbrl_px4_tpu.ops.rollout import rollout_mean

    sft = bundle.state_from_traj
    knots = bundle.knot_times
    dt0 = bundle.time_steps[0]
    n_u = bundle.model.n_u
    B = int(dcfg.dagger_rollouts)
    T = int(dcfg.dagger_steps)
    k0, k1 = jax.random.split(rng)

    if sft is not None:
        T_tab = float(getattr(sft, "t_max", 10.0))
        t0s = jax.random.uniform(k0, (B,), minval=0.0,
                                 maxval=max(T_tab - T * float(dt0), 1e-3))
        x0 = enu2ned(sft(t0s))                                 # (B, 13)
        xdes_b = sft(jnp.zeros((B,), jnp.float32))             # unused in traj mode
    else:
        from sde4mbrl_px4_tpu.core.types import hover_state

        hov = jnp.asarray(hover_state())
        ka, kb, kc = jax.random.split(k1, 3)
        x0 = jnp.tile(hov, (B, 1)).at[:, 0:3].add(
            dcfg.target_std * jax.random.normal(ka, (B, 3), jnp.float32))
        tgt = jnp.tile(hov, (B, 1)).at[:, 0:3].add(
            dcfg.target_std * jax.random.normal(kb, (B, 3), jnp.float32))
        yaws = jax.random.uniform(kc, (B,), minval=-np.pi, maxval=np.pi)
        tgt = tgt.at[:, 6:10].set(jax.vmap(quat.q_from_yaw)(yaws))
        t0s = jnp.zeros((B,), jnp.float32)
        xdes_b = enu2ned(tgt)                                  # ENU boundary

    u_prev0 = jnp.tile(jnp.asarray(bundle.cost_params.uref), (B, 1))

    def _ref_one(t, xd):
        if sft is not None:
            ref = sft(t + knots)
            return enu2ned(ref) if bundle.convert_to_enu else ref
        tgt1 = enu2ned(xd) if bundle.convert_to_enu else xd
        return jnp.broadcast_to(tgt1, (knots.shape[0], 13))

    def step(carry, _):
        x, u_prev, t = carry                                   # (B,13),(B,n_u),(B,)
        ref = jax.vmap(_ref_one)(t, xdes_b)                    # (B,H+1,13)
        feats = jax.vmap(featurize)(x, ref, u_prev)
        plan = policy_apply(params, feats, bundle.lb, bundle.ub)  # (B,H,n_u)
        x_next = jax.vmap(
            lambda xx, pp: rollout_mean(bundle.model, bundle.params, xx, pp,
                                        bundle.time_steps)[1])(x, plan)
        return (x_next, plan[:, 0], t + dt0), (x, u_prev, t)

    (_, _, _), (xs, ups, ts) = jax.lax.scan(
        step, (x0, u_prev0, t0s), None, length=T)
    # u_prev is harvested ALONGSIDE x: the command context in effect when
    # the policy visited x — the same pairing the labeling expert warm-starts
    # with and build_features conditions on (covariate shift in u_prev is
    # part of what DAgger fixes, not just shift in x).
    xs = xs.reshape(B * T, 13)
    ups = ups.reshape(B * T, n_u)
    ts = ts.reshape(B * T)
    xdes = jnp.tile(xdes_b, (T, 1, 1)).reshape(B * T, 13)
    return xs, ts, xdes, ups


# ---------------------------------------------------------------------------
# checkpoint IO


def save_policy(path: str, params: Dict[str, Any], meta: Optional[Dict[str, Any]] = None) -> None:
    m = {"kind": POLICY_KIND}
    m.update(meta or {})
    save_params(path, params, m)


def load_policy(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    params, meta = load_params(path)
    if meta.get("kind") not in (None, POLICY_KIND):
        raise ValueError(f"{path!r} is not a {POLICY_KIND} checkpoint: {meta}")
    return jax.tree.map(jnp.asarray, params), meta
