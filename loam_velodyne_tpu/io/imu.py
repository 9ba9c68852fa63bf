"""Host-side IMU tracking: gravity removal + dead-reckoning integration.

Equivalent of the reference's ScanRegistration::handleIMUMessage
(ScanRegistration.cpp:164-184) + BasicScanRegistration::updateIMUData
(BasicScanRegistration.cpp:82-98): per sample, swap the acceleration
into the camera-style frame, subtract gravity using the orientation,
rotate to world, and integrate velocity/position; keep a bounded
history (imuHistorySize=200). Rates are O(100 Hz) so this stays numpy
on the host; the device consumes fixed-size windows per sweep
(ops/imu.py ImuWindow).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from loam_velodyne_tpu.ops.imu import ImuWindow

GRAVITY = 9.81


def rpy_from_quaternion(qx, qy, qz, qw):
    """Quaternion -> fixed-axis roll/pitch/yaw (tf getRPY convention)."""
    roll = np.arctan2(2 * (qw * qx + qy * qz), 1 - 2 * (qx * qx + qy * qy))
    pitch = np.arcsin(np.clip(2 * (qw * qy - qz * qx), -1.0, 1.0))
    yaw = np.arctan2(2 * (qw * qz + qx * qy), 1 - 2 * (qy * qy + qz * qz))
    return roll, pitch, yaw


def _rotate_zxy(v, az, ax, ay):
    """numpy rotateZXY (Rz then Rx then Ry), matching utils.math."""
    c, s = np.cos(az), np.sin(az)
    v = np.array([c * v[0] - s * v[1], s * v[0] + c * v[1], v[2]])
    c, s = np.cos(ax), np.sin(ax)
    v = np.array([v[0], c * v[1] - s * v[2], s * v[1] + c * v[2]])
    c, s = np.cos(ay), np.sin(ay)
    return np.array([c * v[0] + s * v[2], v[1], c * v[2] - s * v[0]])


class ImuTracker:
    """Bounded IMU state history with world-frame integration."""

    def __init__(self, history: int = 200):
        self.history = history
        self.stamps: list[float] = []
        self.rpy: list[np.ndarray] = []
        self.velo: list[np.ndarray] = []
        self.pos: list[np.ndarray] = []

    def push_raw(self, stamp: float, quat_xyzw, linear_acc_xyz) -> None:
        """Feed one sensor-frame IMU sample (ROS axis conventions:
        x forward, y left, z up; quaternion xyzw)."""
        roll, pitch, yaw = rpy_from_quaternion(*quat_xyzw)
        ax_, ay_, az_ = linear_acc_xyz
        # swap into camera-style axes + remove gravity
        # (reference ScanRegistration.cpp:171-174)
        acc = np.array([
            ay_ - np.sin(roll) * np.cos(pitch) * GRAVITY,
            az_ - np.cos(roll) * np.cos(pitch) * GRAVITY,
            ax_ + np.sin(pitch) * GRAVITY,
        ])
        self.push_state(stamp, (roll, pitch, yaw), acc)

    def push_state(self, stamp: float, rpy, acc_swapped) -> None:
        """Feed a sample whose acceleration is already in swapped axes,
        gravity-free."""
        acc_world = _rotate_zxy(np.asarray(acc_swapped, np.float64),
                                rpy[0], rpy[1], rpy[2])
        if self.stamps:
            dt = stamp - self.stamps[-1]
            pos = (self.pos[-1] + self.velo[-1] * dt
                   + 0.5 * acc_world * dt * dt)
            velo = self.velo[-1] + acc_world * dt
        else:
            pos = np.zeros(3)
            velo = np.zeros(3)
        self.stamps.append(float(stamp))
        self.rpy.append(np.asarray(rpy, np.float64))
        self.velo.append(velo)
        self.pos.append(pos)
        if len(self.stamps) > self.history:
            for buf in (self.stamps, self.rpy, self.velo, self.pos):
                del buf[0]

    def window_for_sweep(self, sweep_start: float,
                         capacity: int = 64) -> ImuWindow:
        """Fixed-size device window with timestamps relative to
        sweep_start. Includes the last state at/before the sweep start
        (for clamping) and everything after."""
        if not self.stamps:
            return ImuWindow.empty(capacity)
        stamps = np.asarray(self.stamps)
        first = int(np.searchsorted(stamps, sweep_start, side="right"))
        first = max(first - 1, 0)
        sel = slice(first, first + capacity)
        t = (stamps[sel] - sweep_start).astype(np.float32)
        n = len(t)
        pad = capacity - n

        def pack(rows, width):
            arr = np.zeros((capacity, width), np.float32)
            arr[:n] = np.asarray(rows[sel], np.float32)
            return jnp.asarray(arr)

        t_full = np.full((capacity,), np.inf, np.float32)
        t_full[:n] = t
        return ImuWindow(
            t=jnp.asarray(t_full),
            rpy=pack(np.asarray(self.rpy), 3),
            velo=pack(np.asarray(self.velo), 3),
            pos=pack(np.asarray(self.pos), 3),
            count=jnp.asarray(n, jnp.int32),
        )
