"""Unit tests for trajectory tables, samplers and generators (L1)."""
import jax.numpy as jnp
import numpy as np
import pytest

from sde4mbrl_px4_tpu.core import quaternion as quat
from sde4mbrl_px4_tpu.models.trajectory import (
    load_trajectory_csv,
    make_state_from_traj,
    parse_trajectory_csv,
)
from sde4mbrl_px4_tpu.models.trajgen import (
    circle_trajectory,
    lemniscate_trajectory,
    write_trajectory_csv,
)


@pytest.fixture(scope="module")
def circle_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("trajs") / "circle.csv"
    write_trajectory_csv(str(p), circle_trajectory(radius=2.0, period=4.0, z=1.0))
    return str(p)


def test_generator_derivative_consistency():
    rows = circle_trajectory(radius=2.0, period=4.0, dt=0.001)
    t, p, v = rows[:, 0], rows[:, 1:4], rows[:, 4:7]
    num_v = np.gradient(p, t, axis=0)
    np.testing.assert_allclose(num_v[5:-5], v[5:-5], atol=2e-2)
    a = rows[:, 7:10]
    num_a = np.gradient(v, t, axis=0)
    np.testing.assert_allclose(num_a[5:-5], a[5:-5], atol=2e-1)


def test_lemniscate_derivative_consistency():
    rows = lemniscate_trajectory(dt=0.001)
    t, p, v = rows[:, 0], rows[:, 1:4], rows[:, 4:7]
    num_v = np.gradient(p, t, axis=0)
    np.testing.assert_allclose(num_v[5:-5], v[5:-5], atol=2e-2)


def test_csv_roundtrip_and_knots(circle_csv):
    table = load_trajectory_csv(circle_csv, convert_to_ned=False)
    sft = make_state_from_traj(table)
    # Sampling exactly at a knot returns that knot.
    k = 17
    x = np.asarray(sft(table.times[k]))
    np.testing.assert_allclose(x, np.asarray(table.states[k]), atol=1e-5)


def test_interpolation_midpoint(circle_csv):
    table = load_trajectory_csv(circle_csv, convert_to_ned=False)
    sft = make_state_from_traj(table)
    t_mid = 0.5 * (table.times[3] + table.times[4])
    x = np.asarray(sft(t_mid))
    pos_expect = 0.5 * (np.asarray(table.states[3, :3]) + np.asarray(table.states[4, :3]))
    np.testing.assert_allclose(x[:3], pos_expect, atol=1e-5)


def test_clamping_outside_range(circle_csv):
    table = load_trajectory_csv(circle_csv, convert_to_ned=False)
    sft = make_state_from_traj(table)
    np.testing.assert_allclose(
        np.asarray(sft(-5.0)), np.asarray(table.states[0]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sft(1e9)), np.asarray(table.states[-1]), atol=1e-6
    )


def test_batched_time_sampling(circle_csv):
    table = load_trajectory_csv(circle_csv, convert_to_ned=False)
    sft = make_state_from_traj(table)
    ts = jnp.array([0.0, 0.5, 1.0])
    batch = np.asarray(sft(ts))
    single = np.stack([np.asarray(sft(t)) for t in ts])
    np.testing.assert_allclose(batch, single, atol=1e-6)


def test_ned_conversion_flips_z(circle_csv):
    enu = load_trajectory_csv(circle_csv, convert_to_ned=False)
    ned = load_trajectory_csv(circle_csv, convert_to_ned=True)
    # ENU z=1.0 altitude -> NED z=-1.0
    np.testing.assert_allclose(np.asarray(ned.states[:, 2]), -1.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ned.states[:, 0]), np.asarray(enu.states[:, 1]), atol=1e-6
    )


def test_flatness_attitude_level_flight():
    """Constant-velocity segments (zero acc) give level attitude (yaw only)."""
    text = "t,x,y,z,vx,vy,vz,ax,ay,az,yaw\n0,0,0,1,1,0,0,0,0,0,0\n1,1,0,1,1,0,0,0,0,0,0\n"
    table = parse_trajectory_csv(text, convert_to_ned=False)
    q = np.asarray(table.states[0, 6:10])
    np.testing.assert_allclose(q, [1, 0, 0, 0], atol=1e-5)


def test_missing_column_raises():
    with pytest.raises(ValueError, match="missing columns"):
        parse_trajectory_csv("t,x,y\n0,0,0\n")


def test_yaw_rate_prior():
    """Linearly increasing yaw -> constant body-z rate in the table."""
    ts = np.linspace(0, 1, 11)
    rows = np.zeros((11, 11))
    rows[:, 0] = ts
    rows[:, 3] = 1.0  # z
    rows[:, 9] = 9.81  # az.. wait az column is index 9? t,x,y,z,vx,vy,vz,ax,ay,az,yaw
    rows[:, 10] = 2.0 * ts  # yaw ramp
    text = "t,x,y,z,vx,vy,vz,ax,ay,az,yaw\n" + "\n".join(
        ",".join(f"{v:.6f}" for v in r) for r in rows
    )
    table = parse_trajectory_csv(text, convert_to_ned=False)
    np.testing.assert_allclose(np.asarray(table.states[:, 12]), 2.0, atol=1e-4)


def test_ramped_trajectories_start_at_rest():
    """ramp > 0: zero initial velocity, full speed after the ramp, and the
    velocity columns stay consistent with the position columns."""
    for gen in (circle_trajectory, lemniscate_trajectory):
        rows = gen(dt=0.001, ramp=1.5)
        t, p, v = rows[:, 0], rows[:, 1:4], rows[:, 4:7]
        assert np.linalg.norm(v[0]) < 1e-9
        # numeric derivative of position matches the analytic velocity
        v_num = np.gradient(p, t, axis=0)
        np.testing.assert_allclose(v_num[5:-5], v[5:-5], atol=5e-3)
        # Post-ramp the warp is a pure time shift tau = t - ramp/2: the
        # ramped sample at t=2.0 matches the unramped one at t=1.25.
        plain = gen(dt=0.001)
        i_r, i_p = int(2.0 / 0.001), int(1.25 / 0.001)
        np.testing.assert_allclose(v[i_r], plain[i_p, 4:7], atol=1e-6)
        np.testing.assert_allclose(rows[i_r, 1:4], plain[i_p, 1:4], atol=1e-6)


def test_uniform_fast_path_matches_searchsorted(circle_csv):
    """The O(1) direct-index sampler (uniform knot grids) must produce
    exactly what the searchsorted fallback produces; a jittered grid must
    still route through the fallback and interpolate correctly."""
    from sde4mbrl_px4_tpu.models.trajectory import (
        TrajectoryTable, load_trajectory_csv, make_state_from_traj)

    tab = load_trajectory_csv(circle_csv)
    tn = np.asarray(tab.times, np.float64)
    assert np.allclose(np.diff(tn), np.diff(tn)[0], rtol=1e-3)  # uniform grid

    # fallback forced via a non-uniform COPY with identical knot values at
    # the original times plus one extra midpoint knot
    t_extra = 0.5 * (tn[3] + tn[4])
    s_extra = 0.5 * (np.asarray(tab.states[3]) + np.asarray(tab.states[4]))
    s_extra[6:10] /= np.linalg.norm(s_extra[6:10])
    tj = np.insert(tn, 4, t_extra)
    sj = np.insert(np.asarray(tab.states), 4, s_extra, axis=0)
    tab_nu = TrajectoryTable(times=jnp.asarray(tj), states=jnp.asarray(sj))

    fast = make_state_from_traj(tab)
    slow = make_state_from_traj(tab_nu)
    ts = jnp.asarray(np.linspace(tn[0] - 0.5, tn[-1] + 0.5, 97), jnp.float32)
    np.testing.assert_allclose(np.asarray(fast(ts)), np.asarray(slow(ts)),
                               rtol=1e-5, atol=1e-5)
