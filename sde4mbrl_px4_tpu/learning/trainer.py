"""Neural-SDE model learning from flight data (L1/L6).

The reference repo consumes pre-trained checkpoints
(``learned_model_params``, ``launch/iris_sitl_traj_mpc.yaml:3``) produced
by its external companion library; training itself is out of that repo
(SURVEY.md §5 "No training in this repo"). A complete standalone framework
must close that loop — this module fits the physics-constrained SDE of
``models/sde_model.py`` to logged (state, control) sequences:

- **multi-step strong loss**: Gaussian negative log-likelihood of the
  K-step Euler-Maruyama mean prediction against the logged states, with
  the learned diffusion as the (state-dependent) predictive scale on the
  velocity states — jointly identifies drift residual, motor gains, and
  diffusion magnitude;
- TPU-first: windows are batched into one big leading dimension through
  the model (MXU-shaped), the whole update step is one jitted program
  with donated optimizer state, and the batch axis shards over the mesh's
  ``dp`` axis for multi-chip training (``parallel/mesh.py``).

Data format: arrays ``t (N,)``, ``x (N, 13)``, ``u (N, n_u)`` sampled at a
fixed rate (e.g. decoded MPC_FULL_STATE logs), or an ``.npz`` with those
keys.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sde4mbrl_px4_tpu.models.sde_model import NeuralSDE, drift_and_sigma
from sde4mbrl_px4_tpu.core import quaternion as quat

__all__ = ["TrainConfig", "TrajectoryDataset", "make_loss_fn", "train_sde"]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    window: int = 8              # prediction steps per training window
    batch_size: int = 256
    steps: int = 2000
    lr: float = 1e-3
    weight_decay: float = 1e-5
    sigma_floor: float = 1e-3    # numerical floor on predictive scale
    pos_weight: float = 1.0      # extra weight on position prediction
    seed: int = 0


def sequence_from_flight_log(path: str, n_u: int = 4):
    """``(t, x, u)`` — the longest contiguous commanded segment of a
    recorded flight (``io/flight_log.py`` .npz: ``t``, ``state``,
    ``cmd_motors``). Rows before the first command (engagement) are
    dropped. Shared by training (``TrajectoryDataset.from_flight_log``)
    and model evaluation (``learning/evaluate.py``)."""
    from sde4mbrl_px4_tpu.io.flight_log import load_flight_log

    d = load_flight_log(path)
    t, x = d["t"], d["state"]
    u = d["cmd_motors"][:, :n_u]
    have = ~np.isnan(u).any(axis=1) & (np.abs(u).sum(axis=1) > 0)
    # longest contiguous commanded run
    best = (0, 0)
    i = 0
    n = len(have)
    while i < n:
        if have[i]:
            j = i
            while j < n and have[j]:
                j += 1
            if j - i > best[1] - best[0]:
                best = (i, j)
            i = j
        else:
            i += 1
    i0, i1 = best
    return t[i0:i1], x[i0:i1], u[i0:i1]


class TrajectoryDataset:
    """Sliding-window view over one or more logged flight segments."""

    def __init__(self, t: np.ndarray, x: np.ndarray, u: np.ndarray,
                 window: int):
        assert x.shape[0] == u.shape[0] == t.shape[0]
        self.dt = float(np.median(np.diff(t)))
        self.window = int(window)
        n_win = x.shape[0] - self.window
        if n_win <= 0:
            raise ValueError("trajectory shorter than training window")
        # windows: x0 (N, 13), u (N, W, n_u), targets (N, W, 13)
        idx = np.arange(n_win)[:, None] + np.arange(self.window)[None, :]
        self.x0 = x[:n_win].astype(np.float32)
        self.u_win = u[idx].astype(np.float32)
        self.x_tgt = x[idx + 1].astype(np.float32)

    @staticmethod
    def from_npz(path: str, window: int) -> "TrajectoryDataset":
        d = np.load(path)
        return TrajectoryDataset(d["t"], d["x"], d["u"], window)

    @staticmethod
    def from_flight_log(path: str, window: int, n_u: int = 4,
                        ) -> "TrajectoryDataset":
        """System identification from a recorded flight
        (``io/flight_log.py`` .npz: ``t``, ``state``, ``cmd_motors``).

        Closes the reference ecosystem's data loop (its models are fitted
        offline from flight logs by the external companion library): fly
        the closed-loop sim (``examples/closed_loop_sim.py --log``) or a
        real mission, then fit the SDE on the logged (state, command)
        stream. Rows before the first command (engagement) are dropped;
        the longest contiguous commanded segment is used.
        """
        t, x, u = sequence_from_flight_log(path, n_u=n_u)
        if t.shape[0] <= window:
            raise ValueError("no commanded segment longer than the window")
        return TrajectoryDataset(t, x, u, window)

    def batches(self, batch_size: int, seed: int = 0) -> Iterator[Tuple]:
        rs = np.random.RandomState(seed)
        n = self.x0.shape[0]
        while True:
            sel = rs.randint(0, n, size=batch_size)
            yield self.x0[sel], self.u_win[sel], self.x_tgt[sel]


def make_loss_fn(model: NeuralSDE, dt: float, cfg: TrainConfig) -> Callable:
    """Windowed EM-prediction NLL, vectorized over the batch."""

    def rollout_window(params, x0, u_win):
        """x0 (B,13), u_win (B,W,n) -> mean path (B,W,13), sigma (B,W,13)."""

        def body(x, u_t):
            f, sig = drift_and_sigma(model, params, x, u_t)
            x1 = x + dt * f
            q = quat.qnormalize(x1[..., 6:10])
            x1 = jnp.concatenate([x1[..., 0:6], q, x1[..., 10:13]], axis=-1)
            return x1, (x1, sig)

        _, (xs, sigs) = jax.lax.scan(body, x0, jnp.swapaxes(u_win, 0, 1))
        return jnp.swapaxes(xs, 0, 1), jnp.swapaxes(sigs, 0, 1)

    def loss_fn(params, x0, u_win, x_tgt):
        pred, sig = rollout_window(params, x0, u_win)
        # Gaussian NLL on velocity states with the learned per-step scale
        # (scaled by sqrt(dt) as in the EM transition density).
        scale = jnp.sqrt(dt) * sig[..., 3:6] + cfg.sigma_floor
        dv = (pred[..., 3:6] - x_tgt[..., 3:6]) / scale
        nll_v = jnp.mean(0.5 * dv * dv + jnp.log(scale))
        scale_w = jnp.sqrt(dt) * sig[..., 10:13] + cfg.sigma_floor
        dw = (pred[..., 10:13] - x_tgt[..., 10:13]) / scale_w
        nll_w = jnp.mean(0.5 * dw * dw + jnp.log(scale_w))
        # Deterministic penalties on the kinematic states (no diffusion).
        dp = pred[..., 0:3] - x_tgt[..., 0:3]
        dq = quat.qerr_vec(pred[..., 6:10], x_tgt[..., 6:10])
        mse_kin = cfg.pos_weight * jnp.mean(dp * dp) + jnp.mean(dq * dq)
        return nll_v + nll_w + mse_kin

    return loss_fn


def train_sde(
    model: NeuralSDE,
    params: Dict[str, Any],
    dataset: TrajectoryDataset,
    cfg: TrainConfig = TrainConfig(),
    mesh=None,
    log_every: int = 200,
    log: Callable = print,
) -> Tuple[Dict[str, Any], Dict[str, float]]:
    """Fit the SDE to data; returns (params, final metrics).

    With ``mesh`` given, the batch is sharded over its ``dp`` axis and the
    gradient all-reduce rides the mesh collectives (inserted by GSPMD).
    """
    import optax

    opt = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    loss_fn = make_loss_fn(model, dataset.dt, cfg)
    params = jax.tree.map(jnp.asarray, params)
    opt_state = opt.init(params)

    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sharding = NamedSharding(mesh, P("dp"))

    @jax.jit
    def update(params, opt_state, x0, u_win, x_tgt):
        loss, grads = jax.value_and_grad(loss_fn)(params, x0, u_win, x_tgt)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    it = dataset.batches(cfg.batch_size, seed=cfg.seed)
    loss = jnp.float32(0)
    for step in range(cfg.steps):
        x0, u_win, x_tgt = next(it)
        if batch_sharding is not None:
            x0 = jax.device_put(x0, batch_sharding)
            u_win = jax.device_put(u_win, batch_sharding)
            x_tgt = jax.device_put(x_tgt, batch_sharding)
        params, opt_state, loss = update(params, opt_state, x0, u_win, x_tgt)
        if log_every and step % log_every == 0:
            log(f"step {step}: loss {float(loss):.5f}")
    return params, {"final_loss": float(loss)}
