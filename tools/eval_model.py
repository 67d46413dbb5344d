#!/usr/bin/env python
"""Evaluate a learned SDE model against a recorded flight.

Prints a JSON report: open-loop k-step prediction RMSE (mean dynamics) and
Monte-Carlo ensemble calibration (is the diffusion term honest?) — the
offline model-quality check the reference ecosystem leaves to closed-loop
flight (SURVEY.md §4). See ``learning/evaluate.py`` for metric definitions.

Usage:
  python tools/eval_model.py flight.npz --vehicle iris \\
      [--checkpoint configs/models/iris_sde.pkl] [--ks 1,5,10,20] \\
      [--calib-k 10] [--particles 128] [--cpu]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log", help=".npz flight log (io/flight_log.py)")
    ap.add_argument("--vehicle", default="iris", help="iris | hexa")
    ap.add_argument("--checkpoint", default=None,
                    help="model .pkl (default: configs/models/<vehicle>_sde.pkl)")
    ap.add_argument("--ks", default="1,5,10,20")
    ap.add_argument("--calib-k", type=int, default=10)
    ap.add_argument("--particles", type=int, default=128)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from sde4mbrl_px4_tpu.learning import evaluate_model, sequence_from_flight_log
    from sde4mbrl_px4_tpu.models.params_io import load_params
    from sde4mbrl_px4_tpu.models.sde_model import NeuralSDE
    from sde4mbrl_px4_tpu.models.vehicles import vehicle_from_name

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = args.checkpoint or os.path.join(
        here, "configs", "models", f"{args.vehicle}_sde.pkl")
    model = NeuralSDE(vehicle=vehicle_from_name(args.vehicle))
    params, meta = load_params(ckpt)

    t, x, u = sequence_from_flight_log(args.log, n_u=model.n_u)
    ks = tuple(int(k) for k in args.ks.split(","))
    need = max(max(ks), args.calib_k) + 2
    if t.shape[0] < need:
        sys.exit(f"error: log has only {t.shape[0]} commanded samples; "
                 f"need >= {need} for the requested horizons")

    report = evaluate_model(model, params, t, x, u, ks=ks,
                            calib_k=args.calib_k, num_particles=args.particles)
    report["checkpoint"] = ckpt
    report["samples"] = int(t.shape[0])
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
