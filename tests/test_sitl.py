"""SITL bring-up node (sim/sitl.py) — the px4_sitl.launch analogue.

Exercises the wire-level loop: MPC_FULL_STATE streaming at the configured
rate, MPC_MOTORS_CMD ingestion through the FCU engagement/watchdog shim,
and the launch-tier config surface (configs/launch/*_px4_sitl.yaml).
"""
import os
import time

import numpy as np
import pytest


def _load_launch(repo_root, name):
    from sde4mbrl_px4_tpu.launch import _load

    return _load(os.path.join(repo_root, "configs", "launch", name))


def test_fcu_sim_config_surface(repo_root):
    """Both shipped SITL launch files resolve and build a node (reference
    px4_sitl.launch for iris, hexa_px4.launch for the hexa)."""
    from sde4mbrl_px4_tpu.sim.sitl import fcu_sim_from_config

    for name, n_u in (("iris_px4_sitl.yaml", 4), ("hexa_px4_sitl.yaml", 6)):
        cfg = _load_launch(repo_root, name)
        assert cfg["node"] == "fcu_sim"
        cfg["addr_mavlink_state_msg"] = "127.0.0.1:25990"  # don't start it
        node = fcu_sim_from_config(cfg)
        assert node.fcu.n_u == n_u
        node.link.close()


def test_fcu_sim_node_streams_and_engages(repo_root):
    """End-to-end over the wire: the node streams valid 13-state frames at
    the configured rate; an engaged command stream flips the FCU to MPC_ON;
    a stale/ignored command leaves it disengaged (basic_control.py:35-42)."""
    from sde4mbrl_px4_tpu.core.types import CONTROL_STATES
    from sde4mbrl_px4_tpu.io.mavlink import MavlinkUDP
    from sde4mbrl_px4_tpu.sim.sitl import fcu_sim_from_config

    port = 25991
    eng = MavlinkUDP(f"127.0.0.1:{port}", mode="udpin")
    cfg = _load_launch(repo_root, "iris_px4_sitl.yaml")
    cfg["addr_mavlink_state_msg"] = f"127.0.0.1:{port}"
    cfg["initial_position_ned"] = [0.5, 0.0, -1.0]
    node = fcu_sim_from_config(cfg)
    node.start()
    try:
        msg = eng.recv_match(type="MPC_FULL_STATE", timeout=2.0)
        assert msg is not None, "no MPC_FULL_STATE within 2 s"
        x = np.asarray(msg.state)
        assert x.shape == (13,)
        np.testing.assert_allclose(np.linalg.norm(x[6:10]), 1.0, atol=1e-3)
        np.testing.assert_allclose(x[:3], [0.5, 0.0, -1.0], atol=0.2)

        # CTRL_TEST commands are transmitted but ignored by the FCU
        # (README.md:91): status must stay disengaged.
        hov = float(node.fcu.hover_u)
        motors = np.full(6, hov, np.float32)
        tr = np.array([hov, 0, 0, 0], np.float32)
        eng.send_motors_cmd(int(time.time() * 1e6), motors, tr,
                            CONTROL_STATES["test"], 100)
        time.sleep(0.05)
        assert node.fcu.status != node.fcu.MPC_ON

        # Engaged command stream faster than the 20 ms staleness bound
        # flips the watchdog to MPC_ON.
        deadline = time.time() + 2.0
        while time.time() < deadline and node.fcu.status != node.fcu.MPC_ON:
            eng.send_motors_cmd(int(time.time() * 1e6), motors, tr,
                                CONTROL_STATES["pos"], 100)
            time.sleep(0.005)
        assert node.fcu.status == node.fcu.MPC_ON

        # Stop commanding: staleness watchdog must disengage (MPC_TIMEOUT).
        time.sleep(0.1)
        assert node.fcu.status == node.fcu.MPC_TIMEOUT
        assert node.ticks > 0
    finally:
        node.stop()
        eng.close()
