"""Every dot the solve's gradient flows through carries explicit HIGHEST
precision (reference-parity configs).

Round-3 regression guard: ONE einsum without a precision argument (the
motor-mixer control->wrench dot) ran at the MXU's default bf16 input
precision and false-plateaued the batched TPU solver at 0.3-0.5 m
tracking (docs/PERFORMANCE.md "bf16 control-sensitivity hole"). CPU tests
cannot catch that class — precision is a no-op on CPU — so this test
walks the traced jaxpr instead: statically assert that NO dot_general in
the compiled solve (or its gradient, scan, while_loop sub-jaxprs) uses
default precision. Large-P configs intentionally choose bf16
(``matmul_precision``), so the guard covers the parity configs only."""
import os

import jax
import jax.extend.core as jex_core
import jax.numpy as jnp
import pytest

from sde4mbrl_px4_tpu.core.types import hover_state


def _collect_dot_precisions(jaxpr, out):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "dot_general":
            out.append(eqn.params.get("precision"))
        for v in eqn.params.values():
            if isinstance(v, jex_core.ClosedJaxpr):
                _collect_dot_precisions(v.jaxpr, out)
            elif isinstance(v, jex_core.Jaxpr):
                _collect_dot_precisions(v, out)
            elif isinstance(v, (tuple, list)):
                for w in v:
                    if isinstance(w, jex_core.ClosedJaxpr):
                        _collect_dot_precisions(w.jaxpr, out)
                    elif isinstance(w, jex_core.Jaxpr):
                        _collect_dot_precisions(w, out)
    return out


@pytest.mark.parametrize("solver,extra", [
    ("apg", {}),
    ("mppi", {}),
    ("policy", {"policy": {"hidden": [32], "refine_iters": 3}}),
])
def test_solve_dots_carry_explicit_precision(repo_root, solver, extra):
    import yaml

    from sde4mbrl_px4_tpu.engine.mpc_loader import make_mpc_from_config

    cfg = yaml.safe_load(
        open(os.path.join(repo_root, "configs/iris_posctrl_mpc.yaml")))
    cfg["learned_model_params"] = os.path.join(
        repo_root, "configs/models/iris_sde.pkl")
    cfg["horizon"] = 4
    cfg["num_short_dt"] = 4
    cfg["apg_mpc"]["max_iter"] = 3
    cfg["apg_mpc"]["max_no_improvement_iter"] = 3
    cfg["solver"] = solver
    cfg.update(extra)
    # a prox-slack constraint exercises the selector einsum too
    cfg["state_constr"] = {
        "state_id": [2], "state_bound": [[-5.0, 0.0]],
        "state_penalty": [10.0], "slack_scaling": [1.0],
        "slack_proximal": solver == "apg",
    }
    _, (reset_fn, mpc_fn), _, _ = make_mpc_from_config(dict(cfg))
    x = jnp.asarray(hover_state())
    rng = jax.random.PRNGKey(0)
    st = reset_fn(x, rng, x)
    jaxpr = jax.make_jaxpr(
        lambda *a: mpc_fn(*a, xdes=x))(x, rng, st, jnp.float32(0.0))
    precisions = _collect_dot_precisions(jaxpr.jaxpr, [])
    assert precisions, "no dot_general found — tracing changed?"
    bad = [p for p in precisions if p is None
           or (isinstance(p, tuple)
               and any(q != jax.lax.Precision.HIGHEST for q in p))
           or (not isinstance(p, tuple) and p != jax.lax.Precision.HIGHEST)]
    assert not bad, (
        f"{len(bad)}/{len(precisions)} dot_general eqns use default/non-"
        f"HIGHEST precision in the {solver} solve path — on TPU that is "
        f"bf16 inputs on a gradient-carrying dot (see docs/PERFORMANCE.md "
        f"'bf16 control-sensitivity hole'): {set(map(str, bad))}")
