"""Mission-layer tests: verbs, command retry loop, safety box, failsafe,
REPL dispatch — driven synchronously against the simulated vehicle."""
import numpy as np
import pytest

from sde4mbrl_px4_tpu.cli.mission import MissionControl, SimVehicle, dispatch


@pytest.fixture
def sim_vehicle(iris_model):
    from sde4mbrl_px4_tpu.sim.plant import FCUSim, SDEPlant

    model, params = iris_model
    plant = SDEPlant(model, params, sim_dt=0.005)
    fcu = FCUSim(plant)
    return SimVehicle(fcu)


@pytest.fixture
def mission(sim_vehicle):
    logs = []
    ctl = MissionControl(sim_vehicle, engine=None, log=logs.append)
    return ctl, sim_vehicle, logs


def _run(ctl, veh, seconds, dt=0.02):
    for _ in range(int(seconds / dt)):
        ctl.tick()
        veh.step(dt)


def test_arm_disarm_cycle(mission):
    ctl, veh, _ = mission
    ctl.arm()
    _run(ctl, veh, 0.1)
    assert veh.armed and not ctl.command_to_send
    ctl.disarm()
    _run(ctl, veh, 0.1)
    assert not veh.armed


def test_offboard_pushes_setpoints(mission):
    ctl, veh, _ = mission
    ctl.offboard()
    _run(ctl, veh, 0.1)
    assert veh.flight_mode == "OFFBOARD"
    assert not ctl.stop_offboard_mode


@pytest.mark.slow
def test_takeoff_reaches_altitude(mission):
    ctl, veh, _ = mission
    ctl.takeoff(z=1.0)
    _run(ctl, veh, 8.0)
    assert veh.armed and veh.flight_mode == "OFFBOARD"
    assert veh.position()[2] == pytest.approx(1.0, abs=0.25)


@pytest.mark.slow
def test_pos_moves_vehicle(mission):
    ctl, veh, _ = mission
    ctl.takeoff(z=1.0)
    _run(ctl, veh, 6.0)
    ctl.pos(x=1.0, y=0.5, z=1.0)
    _run(ctl, veh, 8.0)
    p = veh.position()
    np.testing.assert_allclose(p, [1.0, 0.5, 1.0], atol=0.35)


@pytest.mark.slow
def test_relpos(mission):
    ctl, veh, _ = mission
    ctl.takeoff(z=1.0)
    _run(ctl, veh, 6.0)
    p0 = veh.position().copy()
    ctl.relpos(dx=0.5)
    _run(ctl, veh, 6.0)
    assert veh.position()[0] - p0[0] == pytest.approx(0.5, abs=0.3)


@pytest.mark.slow
def test_safety_box_triggers(mission):
    ctl, veh, logs = mission
    ctl.takeoff(z=1.0)
    _run(ctl, veh, 6.0)
    ctl.set_box(0.2, 0.2, 0.2)
    assert ctl.security_check
    # Command a setpoint outside the box; the monitor should intervene.
    ctl.pos(x=3.0)
    _run(ctl, veh, 4.0)
    assert any("Not safe" in l for l in logs)
    # ... and eventually recenter near the box center.
    _run(ctl, veh, 6.0)
    assert np.linalg.norm(veh.position() - ctl.center_point) < 0.6


def test_rm_box(mission):
    ctl, veh, _ = mission
    ctl.set_box()
    ctl.rm_box()
    assert not ctl.security_check and ctl.safe_box is None


@pytest.mark.slow
def test_land(mission):
    ctl, veh, _ = mission
    ctl.takeoff(z=1.0)
    _run(ctl, veh, 6.0)
    ctl.land()
    _run(ctl, veh, 10.0)
    assert veh.position()[2] < 0.3


def test_repl_dispatch(mission):
    ctl, veh, _ = mission
    assert dispatch(ctl, "arm")
    _run(ctl, veh, 0.1)
    assert veh.armed
    assert dispatch(ctl, "takeoff z=1.5")
    assert ctl._setpoint[2] == pytest.approx(1.5)
    assert dispatch(ctl, "set_box 0.3 0.3 0.3")
    assert ctl.security_check
    assert dispatch(ctl, "unknown_verb")          # stays alive
    assert dispatch(ctl, "weight_motors 50")      # no engine -> logged, alive
    assert not dispatch(ctl, "quit")


def test_engine_verbs_without_engine(mission):
    ctl, veh, logs = mission
    ctl.controller_init()
    ctl.controller_on()
    assert any("No engine" in l for l in logs)
