"""Unit tests for ENU<->NED state conversion (L0)."""
import jax.numpy as jnp
import numpy as np

from sde4mbrl_px4_tpu.core import quaternion as quat
from sde4mbrl_px4_tpu.core.frames import enu2ned, ned2enu
from sde4mbrl_px4_tpu.core.types import hover_state


def test_position_velocity_swap():
    x = jnp.zeros(13).at[6].set(1.0)
    x = x.at[0:3].set(jnp.array([1.0, 2.0, 3.0])).at[3:6].set(jnp.array([4.0, 5.0, 6.0]))
    y = enu2ned(x)
    np.testing.assert_allclose(y[0:3], jnp.array([2.0, 1.0, -3.0]), atol=1e-6)
    np.testing.assert_allclose(y[3:6], jnp.array([5.0, 4.0, -6.0]), atol=1e-6)


def test_involution_roundtrip():
    rngx = np.random.RandomState(0)
    x = rngx.randn(7, 13).astype(np.float32)
    x[:, 6:10] /= np.linalg.norm(x[:, 6:10], axis=-1, keepdims=True)
    y = ned2enu(enu2ned(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-5)


def test_quaternion_consistency_with_vector_rotation():
    """Rotating a body vector to world frame must commute with the frame map:
    R_ned(q_ned) @ M_body = M_world @ R_enu(q_enu) for the FLU->FRD and
    ENU->NED maps."""
    rs = np.random.RandomState(1)
    q_enu = rs.randn(4).astype(np.float32)
    q_enu /= np.linalg.norm(q_enu)
    x = np.zeros(13, np.float32)
    x[6:10] = q_enu
    q_ned = np.asarray(enu2ned(jnp.asarray(x)))[6:10]

    v_flu = rs.randn(3).astype(np.float32)
    # FLU -> FRD: flip y, z.
    v_frd = v_flu * np.array([1.0, -1.0, -1.0], np.float32)

    w_enu = np.asarray(quat.qrotate(jnp.asarray(q_enu), jnp.asarray(v_flu)))
    # ENU -> NED world: swap x/y, flip z.
    w_ned_expect = w_enu[[1, 0, 2]] * np.array([1.0, 1.0, -1.0], np.float32)
    w_ned = np.asarray(quat.qrotate(jnp.asarray(q_ned), jnp.asarray(v_frd)))
    np.testing.assert_allclose(w_ned, w_ned_expect, atol=1e-5)


def test_identity_attitude_maps_to_yaw90():
    """ENU identity attitude (body x East) is NED yaw=90° (East heading)."""
    y = enu2ned(hover_state())
    yaw = float(quat.yaw_from_q(y[6:10]))
    assert abs(abs(yaw) - np.pi / 2) < 1e-5


def test_rates_sign_flip():
    x = jnp.zeros(13).at[6].set(1.0).at[10:13].set(jnp.array([0.1, 0.2, 0.3]))
    y = enu2ned(x)
    np.testing.assert_allclose(y[10:13], jnp.array([0.1, -0.2, -0.3]), atol=1e-6)
