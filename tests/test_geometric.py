"""Geometric baseline controller tests: JAX implementation behavior + C++
cross-parity + trajectory follower."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from sde4mbrl_px4_tpu.baselines.geometric import (
    ERROR_GEOMETRIC,
    ERROR_QUATERNION,
    GeoParams,
    NativeGeometricController,
    geometric_control,
)
from sde4mbrl_px4_tpu.core.types import hover_state
from sde4mbrl_px4_tpu.models.trajgen import circle_trajectory, write_trajectory_csv


def _hover_x():
    return jnp.asarray(hover_state())


def test_hover_equilibrium_thrust():
    """At the target with zero acc: thrust = c*g + offset; zero rates."""
    p = GeoParams()
    cmd, q_des = geometric_control(
        p, _hover_x(), jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), jnp.float32(0.0)
    )
    expect_thrust = p.norm_thrust_const * p.gravity + p.norm_thrust_offset
    assert float(cmd[3]) == pytest.approx(expect_thrust, abs=1e-5)
    np.testing.assert_allclose(np.asarray(cmd[:3]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(q_des), [1, 0, 0, 0], atol=1e-5)


def test_position_error_tilts_toward_target():
    """Target ahead in +x (ENU): commanded attitude pitches, thrust responds."""
    p = GeoParams()
    cmd, q_des = geometric_control(
        p, _hover_x(), jnp.array([2.0, 0.0, 0.0]), jnp.zeros(3), jnp.zeros(3),
        jnp.float32(0.0),
    )
    # desired acceleration has +x component => body z tilts => pitch rate cmd
    assert abs(float(cmd[1])) > 0.1
    assert float(cmd[3]) > 0.0


def test_fb_acc_clipping():
    """Huge position error: feedback acceleration is norm-clipped."""
    p = GeoParams(max_fb_acc=2.0)
    cmd_far, _ = geometric_control(
        p, _hover_x(), jnp.array([100.0, 0, 0]), jnp.zeros(3), jnp.zeros(3),
        jnp.float32(0.0),
    )
    cmd_vfar, _ = geometric_control(
        p, _hover_x(), jnp.array([1000.0, 0, 0]), jnp.zeros(3), jnp.zeros(3),
        jnp.float32(0.0),
    )
    np.testing.assert_allclose(np.asarray(cmd_far), np.asarray(cmd_vfar), atol=1e-5)


def test_thrust_clamped_to_unit_interval():
    p = GeoParams(norm_thrust_const=10.0)  # absurd gain
    cmd, _ = geometric_control(
        p, _hover_x(), jnp.zeros(3), jnp.zeros(3), jnp.array([0.0, 0, 50.0]),
        jnp.float32(0.0),
    )
    assert 0.0 <= float(cmd[3]) <= 1.0


def test_feedthrough_mode():
    p = GeoParams(feedthrough=True)
    acc = jnp.array([0.0, 0.0, 9.8])
    cmd, q_des = geometric_control(
        p, _hover_x(), jnp.array([5.0, 5.0, 5.0]), jnp.zeros(3), acc, jnp.float32(0.0)
    )
    # position error ignored: level attitude from pure vertical acc
    np.testing.assert_allclose(np.asarray(q_des), [1, 0, 0, 0], atol=1e-5)


@pytest.fixture(scope="module")
def native_ctrl():
    so = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "csrc", "libmpc_native.so")
    if not os.path.exists(so):
        pytest.skip("native library not built (make -C csrc)")
    return NativeGeometricController()


@pytest.mark.parametrize("mode", [ERROR_QUATERNION, ERROR_GEOMETRIC])
def test_cpp_jax_parity(native_ctrl, mode):
    rs = np.random.RandomState(42)
    p = GeoParams(ctrl_mode=mode, drag_d=(0.1, 0.1, 0.05))
    native_ctrl.set_params(p)
    for _ in range(10):
        x = rs.randn(13).astype(np.float64)
        x[6:10] /= np.linalg.norm(x[6:10])
        tp, tv, ta = rs.randn(3), 0.5 * rs.randn(3), 0.3 * rs.randn(3)
        yaw = rs.uniform(-3, 3)
        cmd_c, qd_c = native_ctrl.update(x, tp, tv, ta, yaw)
        # C++ computes in double; the JAX twin runs f32 (x64 not enabled in
        # the suite) — tolerances below absorb the precision gap.
        cmd_j, qd_j = geometric_control(
            p, jnp.asarray(x, jnp.float32), jnp.asarray(tp), jnp.asarray(tv),
            jnp.asarray(ta), jnp.float32(yaw),
        )
        np.testing.assert_allclose(cmd_c, np.asarray(cmd_j), rtol=1e-4, atol=1e-5)
        # q and -q equal; compare via abs of dot
        assert abs(float(np.dot(qd_c, np.asarray(qd_j)))) > 1 - 1e-6


def test_cpp_trajectory_follower(native_ctrl, tmp_path):
    rows = circle_trajectory(radius=2.0, period=4.0, z=1.0, dt=0.05)
    csv = str(tmp_path / "circ.csv")
    write_trajectory_csv(csv, rows)
    assert native_ctrl.load_trajectory(csv)
    # interpolate between knots
    pos, vel, acc, yaw = native_ctrl.sample_trajectory(0.125)
    t = rows[:, 0]
    i = np.searchsorted(t, 0.125) - 1
    alpha = (0.125 - t[i]) / (t[i + 1] - t[i])
    expect = rows[i, 1:4] + alpha * (rows[i + 1, 1:4] - rows[i, 1:4])
    np.testing.assert_allclose(pos, expect, atol=1e-9)
    # clamp past the end
    pos_end, _, _, _ = native_ctrl.sample_trajectory(1e9)
    np.testing.assert_allclose(pos_end, rows[-1, 1:4], atol=1e-9)
    # stage cache tolerates backwards seeks
    pos0, _, _, _ = native_ctrl.sample_trajectory(0.01)
    np.testing.assert_allclose(
        pos0, rows[0, 1:4] + (0.01 / (t[1] - t[0])) * (rows[1, 1:4] - rows[0, 1:4]),
        atol=1e-9,
    )


def test_cpp_param_file_loading(native_ctrl, tmp_path):
    cfgf = tmp_path / "geo.yaml"
    cfgf.write_text("attctrl_tau: 0.25\nKp_x: 4.0\nctrl_mode: 2\n# comment\n")
    assert native_ctrl.load_params_file(str(cfgf))
    assert native_ctrl._p.attctrl_tau == pytest.approx(0.25)
    assert native_ctrl._p.Kp[0] == pytest.approx(4.0)
    assert native_ctrl._p.ctrl_mode == 2
    native_ctrl.set_params(GeoParams())  # restore for other tests
