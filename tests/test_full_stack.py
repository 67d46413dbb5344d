"""Routed full-stack topology on CPU: FCU-sim node -> Router (msg-id
filters) -> engine node over real UDP MAVLink, MPC engagement through the
mission-layer authority resolver — the examples/full_sitl_stack.py wiring
with tiny solver budgets (reference topology: scripts/router_sitl.conf +
iris_sdectrl.launch + px4_sitl.launch)."""
import os
import time

import numpy as np
import pytest
import yaml

from sde4mbrl_px4_tpu.io.mailbox import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library not built (make -C csrc)"
)


def _tiny_cfg(repo_root, with_traj):
    cfg = yaml.safe_load(open(os.path.join(repo_root, "configs/iris_posctrl_mpc.yaml")))
    cfg["horizon"] = 5
    cfg["num_short_dt"] = 5
    cfg["apg_mpc"]["max_iter"] = 10
    cfg["apg_mpc"]["max_no_improvement_iter"] = 10
    cfg["learned_model_params"] = os.path.join(repo_root, "configs/models/iris_sde.pkl")
    if with_traj:
        cfg["trajectory_path"] = os.path.join(repo_root, "configs/trajs/lemniscate.csv")
    return cfg


@pytest.mark.slow
def test_routed_stack_engages_mpc(repo_root, iris_model, tmp_path):
    """States flow plant -> router -> engine; commands flow back through
    the router's AllowMsgIdIn filter; the FCU engages (MPC_ON) and the
    engine's pickup index stays small."""
    from sde4mbrl_px4_tpu.cli.mission import SimVehicle
    from sde4mbrl_px4_tpu.core.types import CTRL_POSE_ACTIVE, hover_state
    from sde4mbrl_px4_tpu.io.engine_runtime import SDEControlNode
    from sde4mbrl_px4_tpu.io.router import Endpoint, Router
    from sde4mbrl_px4_tpu.sim.plant import FCUSim, SDEPlant
    from sde4mbrl_px4_tpu.sim.sitl import FCUSimNode

    traj_p = tmp_path / "traj.yaml"
    pos_p = tmp_path / "pos.yaml"
    traj_p.write_text(yaml.safe_dump(_tiny_cfg(repo_root, True)))
    pos_p.write_text(yaml.safe_dump(_tiny_cfg(repo_root, False)))

    # Router: FCU server endpoint + filtered MPC endpoint (the
    # router_sitl.conf topology on test-local ports).
    fcu_port, mpc_port = 25993, 25994
    router = Router([
        Endpoint("fcu", "127.0.0.1", fcu_port, mode="Server"),
        Endpoint("mpc", "127.0.0.1", mpc_port, mode="Normal",
                 allow_out={367}, allow_in={368}),
    ])
    router.start()

    node = SDEControlNode(str(traj_p), str(pos_p), seed=0,
                          mailbox_name=f"test_stack_{os.getpid()}")
    node.start()
    node.serve_mavlink(f"127.0.0.1:{mpc_port}")

    model, params = iris_model
    plant = SDEPlant(model, params, sim_dt=0.01)
    fcu = FCUSim(plant, state_rate_hz=50.0)
    veh = SimVehicle(fcu)
    veh.arm(True)
    sim = FCUSimNode(fcu, addr=f"127.0.0.1:{fcu_port}", step_fn=veh.step)

    try:
        node.initialize_mpc()
        tgt = np.asarray(hover_state()).copy()
        tgt[2] = 1.0
        ok, _ = node.set_mode(CTRL_POSE_ACTIVE, target_pose=tgt)
        assert ok
        sim.start()

        # Capture the OBSERVED engagement: re-reading live fcu.status after
        # the loop would race the 20 ms staleness watchdog (the 50 Hz
        # command stream rides exactly on the bound and can flap).
        deadline = time.time() + 20.0
        engaged = False
        while time.time() < deadline and not engaged:
            engaged = fcu.status == FCUSim.MPC_ON
            time.sleep(0.05)
        assert engaged, (
            f"MPC never engaged through the router (status={fcu.status}, "
            f"router stats={router.stats})"
        )
        # both directions actually crossed the router
        assert router.stats["fcu"] > 0 and router.stats["mpc"] > 0
        # keep flying briefly; the pickup index must stay within the plan
        time.sleep(1.0)
        assert node.last_record.mpc_indx < 5
    finally:
        sim.stop()
        node.stop()
        router.stop()
