#!/usr/bin/env python
"""Closed-loop flight of the NATIVE geometric baseline controller
(reference §2.4's C++ node) against the simulated FCU over UDP MAVLink.

Topology (reference geoctrl.launch + router):
    FCUSim --MPC_FULL_STATE--> geometric node (csrc C++) --thrust+rates-->

The controller follows its CSV circle trajectory with the differential-
flatness pipeline; commands execute through the FCU rate loop
(weight_motors=0 path).

Usage: python examples/geometric_baseline_sim.py [--seconds 6]
"""
import argparse
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=6.0)
    ap.add_argument("--port", type=int, default=25998)
    ap.add_argument("--state-rate", type=float, default=50.0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # plant integration only

    from sde4mbrl_px4_tpu.baselines.geometric import (
        GeoParams, NativeGeometricController,
    )
    from sde4mbrl_px4_tpu.core.frames import enu2ned, ned2enu
    from sde4mbrl_px4_tpu.core.types import CONTROL_STATES, hover_state
    from sde4mbrl_px4_tpu.io.mavlink import MavlinkUDP
    from sde4mbrl_px4_tpu.models.params_io import load_params
    from sde4mbrl_px4_tpu.models.sde_model import NeuralSDE
    from sde4mbrl_px4_tpu.models.vehicles import iris_config
    from sde4mbrl_px4_tpu.sim.plant import FCUSim, SDEPlant

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

    # --- geometric node side (server on UDP, like launch_geometric) -------
    ctl = NativeGeometricController(GeoParams(
        norm_thrust_const=0.71 / 9.81, norm_thrust_offset=0.0,
        kp=(2.0, 2.0, 4.0), kv=(2.0, 2.0, 3.0),
    ))
    assert ctl.load_trajectory(os.path.join(here, "configs/trajs/circle.csv"))

    srv = MavlinkUDP(f"127.0.0.1:{args.port}", mode="udpin")
    stop = threading.Event()

    def node_loop():
        while not stop.is_set():
            msg = srv.recv_match(type="MPC_FULL_STATE", timeout=0.1)
            if msg is None:
                continue
            x_enu = np.asarray(ned2enu(msg.state), np.float64)
            t_traj = msg.time_usec / 1e6
            sp = ctl.sample_trajectory(t_traj)
            pos, vel, acc, yaw = sp
            cmd, _ = ctl.update(x_enu, pos, vel, acc, yaw)
            tr = np.array([cmd[3], cmd[0], -cmd[1], -cmd[2]], np.float32)
            srv.send_motors_cmd(msg.time_usec, np.zeros(6, np.float32), tr,
                                CONTROL_STATES["pos"], 0)

    th = threading.Thread(target=node_loop, daemon=True)
    th.start()

    # --- FCU side ----------------------------------------------------------
    params, _ = load_params(os.path.join(here, "configs/models/iris_sde.pkl"))
    model = NeuralSDE(vehicle=iris_config())
    plant = SDEPlant(model, params, sim_dt=0.005)
    from sde4mbrl_px4_tpu.models.trajectory import load_trajectory_csv, make_state_from_traj

    table = load_trajectory_csv(os.path.join(here, "configs/trajs/circle.csv"),
                                convert_to_ned=False)
    sft = make_state_from_traj(table)
    plant.reset(np.asarray(enu2ned(sft(0.0))))
    fcu = FCUSim(plant, state_rate_hz=args.state_rate)

    link = MavlinkUDP(f"127.0.0.1:{args.port}", mode="udpout")

    def rx_loop():
        while not stop.is_set():
            m = link.recv_match(type="MPC_MOTORS_CMD", timeout=0.05)
            if m is not None:
                fcu.push_cmd(m.motor_val_des, m.thrust_and_angrate_des,
                             m.mpc_on, m.weight_motors)

    rx = threading.Thread(target=rx_loop, daemon=True)
    rx.start()

    state_dt = 1.0 / args.state_rate
    errs = []
    for k in range(int(args.seconds / state_dt)):
        x, t_usec = fcu.full_state_msg()
        link.send_full_state(int(t_usec), x)
        time.sleep(0.004)
        fcu.run_control_period(state_dt)
        t_now = plant.t
        ref = np.asarray(enu2ned(sft(t_now)))
        if t_now > 2.0:  # skip the trajectory-entry transient
            errs.append(float(np.linalg.norm(plant.x[:3] - ref[:3])))

    stop.set()
    th.join(timeout=1.0)
    rx.join(timeout=1.0)
    srv.close(); link.close()
    errs = np.asarray(errs) if errs else np.asarray([np.inf])
    print(f"geometric baseline tracking: mean={errs.mean():.3f}m "
          f"max={errs.max():.3f}m over {len(errs)} ticks, fcu_status={fcu.status}")
    ok = errs.mean() < 0.6 and fcu.status == FCUSim.MPC_ON
    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
