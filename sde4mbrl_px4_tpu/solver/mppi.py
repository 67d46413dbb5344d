"""MPPI (Model Predictive Path Integral) solver (L4) — the sampling twin.

A second solver family the reference lacks (its solver is gradient-based
APG; ``msg/OptMPCState.msg:1``). MPPI is the natural TPU counterpoint:
instead of ~70 sequential gradient iterations it evaluates THOUSANDS of
perturbed control sequences in parallel — exactly the batched-rollout shape
the hardware and this framework's cost oracles are already built for
(``CostOracle.value_batch`` batches candidates through the fused Mosaic
rollout+cost kernel; the XLA path vmaps the same closure).

Standard information-theoretic MPPI (Williams et al. 2017):

    u*  =  sum_k softmax(-(J_k - min J)/lambda)_k  ·  (u + eps_k)

iterated ``iters`` times with the mean re-centered, candidates clipped to
the input box (the reference's ``enforce_ubound`` semantics). The public
state is the same :class:`~sde4mbrl_px4_tpu.solver.apg.APGState` pytree, so
the engine/telemetry/warm-start contract (``OptMPCState`` fields,
receding-horizon shift) is unchanged — select with ``solver: mppi`` in the
MPC YAML:

    solver: mppi
    mppi:
      samples: 256        # K perturbed sequences per iteration
      sigma: 0.02         # exploration std (fraction of the input range)
      temperature: 0.1    # lambda, relative to the round's cost spread
      iters: 8            # re-centered sampling rounds per solve
      noise_beta: 0.7     # AR(1) smoothing of exploration noise in time

Observability mapping (APGState): ``num_steps`` = iters, ``avg_linesearch``
= samples (evaluations per round), ``stepsize``/``avg_stepsize`` = sigma,
``grad_sqr`` = weighted-ensemble variance (a convergence proxy — gradients
don't exist here), ``init_cost``/``opt_cost`` = mean-sequence cost before/
after.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp

from sde4mbrl_px4_tpu.solver.apg import APGState, CostOracle, box_project

__all__ = ["MPPIConfig", "mppi_solve"]


class MPPIConfig(NamedTuple):
    """Static MPPI configuration (hashable; safe as a jit static arg).

    ``sigma`` is relative to the input-box width (scale-free);
    ``temperature`` is relative to the candidate-cost spread above the
    round's minimum (scale-free — an absolute lambda either collapses the
    softmax to argmin or flattens it depending on the cost magnitude);
    ``noise_beta`` > 0 time-correlates the exploration noise along the
    horizon (AR(1) with unit stationary variance — smoother candidate
    sequences, standard MPPI practice for physical systems).
    """

    samples: int = 256
    sigma: float = 0.02
    temperature: float = 0.1
    iters: int = 8
    noise_beta: float = 0.7   # measured best on the position-hold loop

    @staticmethod
    def from_config(cfg: Dict[str, Any]) -> "MPPIConfig":
        m = cfg.get("mppi") or {}
        return MPPIConfig(
            samples=int(m.get("samples", 256)),
            sigma=float(m.get("sigma", 0.02)),
            temperature=float(m.get("temperature", 0.1)),
            iters=int(m.get("iters", 8)),
            noise_beta=float(m.get("noise_beta", 0.7)),
        )


def mppi_solve(
    cost_fn: Callable[[jax.Array], jax.Array],
    u_init: jax.Array,
    lb: jax.Array,
    ub: jax.Array,
    cfg: MPPIConfig,
    rng: jax.Array,
) -> APGState:
    """Minimize ``cost_fn`` over box-constrained control sequences by
    iterated importance-weighted sampling.

    ``cost_fn`` is a scalar cost over one (H, n) sequence or a
    :class:`CostOracle` (its ``value_batch`` evaluates all K candidates in
    one fused rollout). ``rng`` drives the exploration noise — pass a fresh
    stream per solve (the engine already threads one through ``mpc_fn``).
    """
    oracle = (cost_fn if isinstance(cost_fn, CostOracle)
              else CostOracle.from_fn(cost_fn))
    K = int(cfg.samples)
    lam = jnp.float32(cfg.temperature)
    sigma = jnp.float32(cfg.sigma) * (jnp.asarray(ub) - jnp.asarray(lb))
    beta = jnp.float32(cfg.noise_beta)

    u0 = box_project(u_init, lb, ub)
    f0 = oracle.value(u0)

    def _smooth(eps):
        """AR(1) along the horizon, unit stationary variance."""
        def step(c, e):
            c = beta * c + jnp.sqrt(1.0 - beta * beta) * e
            return c, c
        _, out = jax.lax.scan(step, jnp.zeros_like(eps[:, 0]),
                              jnp.moveaxis(eps, 1, 0))
        return jnp.moveaxis(out, 0, 1)

    def body(carry, _):
        u_mean, rng = carry
        rng, sub = jax.random.split(rng)
        eps = jax.random.normal(sub, (K,) + u_mean.shape, dtype=u_mean.dtype)
        if cfg.noise_beta > 0.0:
            eps = _smooth(eps)
        eps = sigma * eps
        # Candidate 0 is the INCUMBENT (zero perturbation): the round can
        # then hold position when no sample improves — without it every
        # round is forced to move and MPPI random-walks uphill on
        # noise-sensitive costs (motor-level inputs are exactly that).
        eps = eps.at[0].set(0.0)
        cands = box_project(u_mean[None] + eps, lb, ub)
        costs = oracle.value_batch(cands)                     # (K,)
        # Scale-free temperature: lambda rides the spread above the round
        # minimum, so the softmax neither collapses to argmin nor flattens
        # regardless of the cost magnitude.
        spread_j = jnp.maximum(jnp.mean(costs) - jnp.min(costs), 1e-9)
        w = jax.nn.softmax(-(costs - jnp.min(costs)) / (lam * spread_j))
        u_new = jnp.einsum("k,khn->hn", w, cands)
        # effective-sample-size-style spread: low = collapsed onto one
        # candidate (converged or temperature too sharp)
        ess = jnp.sum(w * w)
        return (u_new, rng), (jnp.min(costs), ess)

    (u_mean, _), (_min_costs, spreads) = jax.lax.scan(
        body, (u0, rng), None, length=int(cfg.iters))
    u_mean = box_project(u_mean, lb, ub)
    f_final = oracle.value(u_mean)   # the cost of the RETURNED sequence

    return APGState(
        yk=u_mean,
        num_steps=jnp.float32(cfg.iters),
        stepsize=jnp.float32(cfg.sigma),
        avg_stepsize=jnp.float32(cfg.sigma),
        avg_linesearch=jnp.float32(K),
        grad_sqr=spreads[-1],
        init_cost=f0,
        opt_cost=f_final,
    )
