"""Runtime-layer tests: native mailbox protocol + sim plant/FCU behaviors."""
import os
import threading
import time

import numpy as np
import pytest

from sde4mbrl_px4_tpu.io.mailbox import Mailbox, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library not built (make -C csrc)"
)


def test_mailbox_roundtrip():
    m = Mailbox("test_mbx_rt", 8, 4, owner=True)
    try:
        m.post_inbox(np.arange(8, dtype=np.float64))
        data, seq = m.read_inbox()
        np.testing.assert_allclose(data, np.arange(8))
        assert seq == 1
        m.post_outbox(np.array([9.0, 8, 7, 6]))
        out, oseq = m.read_outbox()
        np.testing.assert_allclose(out, [9, 8, 7, 6])
        assert oseq == 1
    finally:
        m.close()


def test_mailbox_doorbell():
    m = Mailbox("test_mbx_bell", 4, 4, owner=True)
    try:
        assert m.wait_bell(timeout_ms=50) == 0  # timeout
        got = []

        def waiter():
            got.append(m.wait_bell(timeout_ms=2000))

        th = threading.Thread(target=waiter)
        th.start()
        time.sleep(0.05)
        m.post_inbox(np.ones(4))
        th.join(timeout=3)
        assert got == [1]
    finally:
        m.close()


def test_mailbox_shutdown_wakes_waiter():
    m = Mailbox("test_mbx_shut", 4, 4, owner=True)
    try:
        got = []

        def waiter():
            got.append(m.wait_bell(timeout_ms=5000))

        th = threading.Thread(target=waiter)
        th.start()
        time.sleep(0.05)
        m.shutdown()
        th.join(timeout=3)
        assert got == [-1]
    finally:
        m.close()


def test_mailbox_cross_attach():
    """Second attachment (same segment name) sees the owner's data — the
    cross-process path exercised in-process."""
    a = Mailbox("test_mbx_x", 4, 4, owner=True)
    try:
        b = Mailbox("test_mbx_x", 4, 4, owner=False)
        a.post_inbox(np.array([1.0, 2, 3, 4]))
        data, seq = b.read_inbox()
        np.testing.assert_allclose(data, [1, 2, 3, 4])
        b.post_outbox(np.array([5.0, 6, 7, 8]))
        out, _ = a.read_outbox()
        np.testing.assert_allclose(out, [5, 6, 7, 8])
        b.close()
    finally:
        a.close()


def test_mailbox_latest_wins():
    """SPSC freshness: consumer always sees the latest write (the
    reference's 'latest finished solve' semantics)."""
    m = Mailbox("test_mbx_latest", 2, 2, owner=True)
    try:
        for i in range(10):
            m.post_outbox(np.array([float(i), 0.0]))
        out, seq = m.read_outbox()
        assert out[0] == 9.0 and seq == 10
    finally:
        m.close()


# ----------------------------------------------------------------------------
# Sim plant / FCU behaviors
# ----------------------------------------------------------------------------


@pytest.fixture(scope="module")
def plant(iris_model):
    from sde4mbrl_px4_tpu.sim.plant import SDEPlant

    model, params = iris_model
    return SDEPlant(model, params, sim_dt=0.005)


def test_fcu_watchdog_staleness(plant):
    from sde4mbrl_px4_tpu.core.types import CONTROL_STATES
    from sde4mbrl_px4_tpu.sim.plant import FCUSim

    fcu = FCUSim(plant)
    plant.reset()
    fcu.push_cmd(np.full(6, 0.9, np.float32), np.zeros(4, np.float32),
                 CONTROL_STATES["traj"], 100)
    u = fcu._effective_u()
    assert fcu.status == FCUSim.MPC_ON
    np.testing.assert_allclose(u, 0.9, atol=1e-6)
    # age the command past 20 ms of sim time
    plant.step(u, 0.05)
    u2 = fcu._effective_u()
    assert fcu.status == FCUSim.MPC_TIMEOUT
    np.testing.assert_allclose(u2, plant.model.vehicle.hover_u)


def test_fcu_test_mode_ignored(plant):
    from sde4mbrl_px4_tpu.core.types import CONTROL_STATES
    from sde4mbrl_px4_tpu.sim.plant import FCUSim

    fcu = FCUSim(plant)
    plant.reset()
    fcu.push_cmd(np.full(6, 0.95, np.float32), np.zeros(4, np.float32),
                 CONTROL_STATES["test"], 100)
    u = fcu._effective_u()
    assert fcu.status == FCUSim.MPC_OFF  # commands transmitted but unused
    np.testing.assert_allclose(u, plant.model.vehicle.hover_u)


def test_fcu_weight_motors_blend(plant):
    from sde4mbrl_px4_tpu.core.types import CONTROL_STATES
    from sde4mbrl_px4_tpu.sim.plant import FCUSim

    fcu = FCUSim(plant)
    plant.reset()
    motors = np.full(6, 0.9, np.float32)
    tr = np.array([0.7, 0, 0, 0], np.float32)
    fcu.push_cmd(motors, tr, CONTROL_STATES["traj"], 100)
    u100 = fcu._effective_u()
    fcu.push_cmd(motors, tr, CONTROL_STATES["traj"], 0)
    u0 = fcu._effective_u()
    fcu.push_cmd(motors, tr, CONTROL_STATES["traj"], 50)
    u50 = fcu._effective_u()
    np.testing.assert_allclose(u100, 0.9, atol=1e-6)
    np.testing.assert_allclose(u50, 0.5 * u100 + 0.5 * u0, atol=1e-6)
    assert not np.allclose(u0, u100)


def test_plant_hover_stability(plant):
    plant.reset()
    u = np.full(4, plant.model.vehicle.hover_u, np.float32)
    plant.step(u, 1.0)
    assert abs(float(plant.x[2])) < 0.05  # holds altitude within 5 cm over 1 s
