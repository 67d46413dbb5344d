#!/usr/bin/env python
"""Flight-log analysis plots (L7) — the PlotJuggler-layout analogue.

Renders from an ``.npz`` flight log (``io/flight_log.py``) the comparisons
the reference's committed PlotJuggler layouts show
(``launch/new_analyze_mpc_v3.xml``: ``mpc_motors_cmd/*`` vs
``vehicle_rates_setpoint``/``actuator_motors``; ``pj_setpoint_layout.xml``:
setpoint tracking):

  1. commanded motor values per rotor over time
  2. commanded vs achieved body rates
  3. position tracking vs reference + error norm
  4. solver health: solve time, iterations, optimal cost

Usage: python tools/analyze.py flight.npz [-o out.png]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from sde4mbrl_px4_tpu.io.flight_log import load_flight_log

    d = load_flight_log(args.log)
    t = d["t"]
    out = args.out or os.path.splitext(args.log)[0] + ".png"

    fig, axes = plt.subplots(4, 1, figsize=(11, 13), sharex=True)

    ax = axes[0]
    for i in range(d["cmd_motors"].shape[1]):
        col = d["cmd_motors"][:, i]
        if np.any(col != 0):
            ax.plot(t, col, label=f"m{i+1}", lw=0.9)
    ax.set_ylabel("motor cmd [0..1]")
    ax.legend(ncol=6, fontsize=8)
    ax.set_title("commanded motors (mpc_motors_cmd)")

    ax = axes[1]
    names = ("wx", "wy", "wz")
    for i, nm in enumerate(names):
        ax.plot(t, d["cmd_thrust_rates"][:, 1 + i], lw=0.9,
                label=f"{nm} cmd")
        ax.plot(t, d["state"][:, 10 + i], lw=0.9, ls="--",
                label=f"{nm} achieved")
    ax.set_ylabel("body rate [rad/s]")
    ax.legend(ncol=3, fontsize=8)
    ax.set_title("commanded vs achieved body rates")

    ax = axes[2]
    have_ref = ~np.isnan(d["ref"][:, 0])
    for i, nm in enumerate(("x", "y", "z")):
        ax.plot(t, d["state"][:, i], lw=0.9, label=f"{nm}")
        ax.plot(t[have_ref], d["ref"][have_ref, i], lw=0.9, ls="--",
                label=f"{nm} ref")
    err = np.linalg.norm(d["state"][:, :3] - d["ref"][:, :3], axis=1)
    ax2 = ax.twinx()
    ax2.plot(t[have_ref], err[have_ref], color="k", lw=0.8, alpha=0.5)
    ax2.set_ylabel("|pos err| [m]")
    ax.set_ylabel("position [m]")
    ax.legend(ncol=6, fontsize=8)
    ax.set_title("position tracking")

    ax = axes[3]
    ax.plot(t, 1e3 * d["solve_time"], lw=0.9, label="solve time [ms]")
    ax.plot(t, d["num_steps"], lw=0.9, label="APG iterations")
    ax.set_ylabel("solver")
    ax.set_xlabel("t [s]")
    ax.legend(fontsize=8)
    ax.set_title("solver health (OptMPCState)")

    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
