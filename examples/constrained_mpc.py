#!/usr/bin/env python
"""Constrained MPC demo: velocity/body-rate boxes via proximal slack.

Flies an aggressive 3 m setpoint step with and without the ``state_constr``
block (``configs/iris_constr_posctrl_mpc.yaml``) and prints the peak
velocity each controller commits to — the constrained solve respects the
0.5 m/s box the unconstrained one blows through.

Usage: python examples/constrained_mpc.py [--cpu]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from sde4mbrl_px4_tpu.compile_cache import ensure_compile_cache

ensure_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sde4mbrl_px4_tpu.core.types import hover_state
    from sde4mbrl_px4_tpu.engine.mpc_loader import make_mpc_from_config
    from sde4mbrl_px4_tpu.io.config import load_yaml_config

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

    def run(constrained: bool):
        cfg = load_yaml_config(
            os.path.join(here, "configs", "iris_constr_posctrl_mpc.yaml"))
        if not constrained:
            cfg.pop("state_constr")
        cfg, (reset_fn, mpc_fn), _, b = make_mpc_from_config(cfg)
        from sde4mbrl_px4_tpu.core.frames import ned2enu

        x = jnp.asarray(hover_state())
        target_ned = hover_state().at[0].set(3.0)   # 3 m step (solver frame)
        xdes = ned2enu(target_ned)                  # API boundary is ENU
        rng = jax.random.PRNGKey(0)
        st = reset_fn(x, rng, x)
        jm = jax.jit(mpc_fn)
        v_max = w_max = 0.0
        for _ in range(args.steps):
            u, st, rng, x_evol = jm(x, rng, st, 0.0, xdes)
            v_max = max(v_max, float(np.abs(np.asarray(x_evol[1:, 3:6])).max()))
            w_max = max(w_max, float(np.abs(np.asarray(x_evol[1:, 10:13])).max()))
            x = x_evol[1]
        pos_err = float(np.linalg.norm(np.asarray(x[:3] - target_ned[:3])))
        return v_max, w_max, pos_err

    v_u, w_u, e_u = run(False)
    v_c, w_c, e_c = run(True)
    print(f"unconstrained: |v|max={v_u:.2f} m/s  |w|max={w_u:.2f} rad/s  "
          f"final err={e_u:.2f} m")
    print(f"constrained:   |v|max={v_c:.2f} m/s  |w|max={w_c:.2f} rad/s  "
          f"final err={e_c:.2f} m   (boxes: v 0.5 m/s, w 0.7-0.8 rad/s)")
    ok = v_c < v_u and v_c < 0.75
    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
