"""IMU subsystem tests vs transliterations of the reference chain."""

import numpy as np
import jax.numpy as jnp

from loam_velodyne_tpu.io.imu import ImuTracker, rpy_from_quaternion
from loam_velodyne_tpu.ops import imu as imu_ops


def _quat_from_rpy(roll, pitch, yaw):
    cr, sr = np.cos(roll / 2), np.sin(roll / 2)
    cp, sp = np.cos(pitch / 2), np.sin(pitch / 2)
    cy, sy = np.cos(yaw / 2), np.sin(yaw / 2)
    return (sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy)


def test_rpy_quaternion_roundtrip(rng):
    for _ in range(10):
        r, p, y = rng.uniform(-1.2, 1.2), rng.uniform(-1.2, 1.2), rng.uniform(-3, 3)
        rr, pp, yy = rpy_from_quaternion(*_quat_from_rpy(r, p, y))
        np.testing.assert_allclose([rr, pp, yy], [r, p, y], atol=1e-6)


def test_stationary_imu_window_is_noop():
    tr = ImuTracker()
    for k in range(20):
        tr.push_raw(k * 0.01, _quat_from_rpy(0, 0, 0), (0, 0, 9.81))
    win = tr.window_for_sweep(0.05)
    assert int(win.count) > 0
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(16, 3)),
                      jnp.float32)
    rel = jnp.asarray(np.linspace(0, 0.1, 16), jnp.float32)
    out = imu_ops.project_to_sweep_start(pts, rel, win)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-5)

    st = imu_ops.sweep_state(win, 0.1)
    np.testing.assert_allclose(np.asarray(st.shift_from_start), 0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st.velo_from_start), 0, atol=1e-6)


def test_constant_acceleration_shift():
    # accelerate at 1 m/s^2 along swapped-z (forward) from rest; after
    # t seconds: pos = 0.5 t^2, velo = t.
    tr = ImuTracker()
    for k in range(30):
        t = k * 0.01
        # sensor-frame forward acc is raw x; swapped z = raw x
        tr.push_raw(t, _quat_from_rpy(0, 0, 0), (1.0, 0, 9.81))
    sweep_start = 0.1
    win = tr.window_for_sweep(sweep_start)
    st = imu_ops.sweep_state(win, 0.1)
    # shift over the sweep = pos(0.2)-pos(0.1)-velo(0.1)*0.1 = 0.5*a*dt^2
    np.testing.assert_allclose(float(st.shift_from_start[2]), 0.5 * 0.01,
                               rtol=0.05, atol=1e-4)
    np.testing.assert_allclose(float(st.velo_from_start[2]), 0.1,
                               rtol=0.05)


def test_interpolation_brackets_and_clamps():
    tr = ImuTracker()
    for k in range(5):
        tr.push_raw(k * 0.1, _quat_from_rpy(0.1 * k, 0, 0), (0, 0, 9.81))
    win = tr.window_for_sweep(0.0)
    rpy, _, _ = imu_ops.interpolate(win, jnp.asarray([0.05], jnp.float32))
    np.testing.assert_allclose(float(rpy[0, 0]), 0.05, atol=1e-3)
    # beyond history end: clamp to last state
    rpy, _, _ = imu_ops.interpolate(win, jnp.asarray([10.0], jnp.float32))
    np.testing.assert_allclose(float(rpy[0, 0]), 0.4, atol=1e-4)


def test_yaw_wrap_interpolation():
    win = imu_ops.ImuWindow(
        t=jnp.asarray([0.0, 1.0] + [np.inf] * 6, jnp.float32),
        rpy=jnp.asarray([[0, 0, 3.1], [0, 0, -3.1]] + [[0, 0, 0]] * 6,
                        jnp.float32),
        velo=jnp.zeros((8, 3), jnp.float32),
        pos=jnp.zeros((8, 3), jnp.float32),
        count=jnp.asarray(2, jnp.int32))
    rpy, _, _ = imu_ops.interpolate(win, jnp.asarray([0.5], jnp.float32))
    # interpolates through pi, not through zero
    assert abs(abs(float(rpy[0, 2])) - np.pi) < 0.06


def test_rotating_sweep_deskew_reduces_error():
    # Sensor yawing at 1 rad/s; a fixed world point seen at the end of
    # the sweep appears rotated. IMU deskew should map it near its
    # sweep-start bearing.
    tr = ImuTracker()
    for k in range(30):
        t = k * 0.01
        tr.push_raw(t, _quat_from_rpy(0, 0, t * 1.0), (0, 0, 9.81))
    win = tr.window_for_sweep(0.0)
    # world point at swapped (0,0,5) at t=0; at t=0.1 the sensor yawed
    # 0.1 rad so the measured point in sensor frame is Ry(-0.1)... in
    # swapped frame yaw is rotation about y (up).
    ang = -0.1
    meas = jnp.asarray([[5 * np.sin(ang), 0.0, 5 * np.cos(ang)]], jnp.float32)
    rel = jnp.asarray([0.1], jnp.float32)
    out = np.asarray(imu_ops.project_to_sweep_start(meas, rel, win))[0]
    np.testing.assert_allclose(out, [0, 0, 5], atol=0.02)
