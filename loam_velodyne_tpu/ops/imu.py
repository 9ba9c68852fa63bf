"""IMU-aided deskew, on device.

Equivalent of the reference IMU path inside scan registration
(BasicScanRegistration.cpp:82-152, :258-281): an IMU state history is
interpolated at each point's firing time and every point is rotated
into the sweep-start IMU frame, removing nonlinear motion the
constant-velocity deskew model cannot capture.

The host delivers a fixed-size window of integrated IMU states covering
the sweep (io/imu.py); interpolation is a vectorized ``searchsorted`` +
lerp instead of the reference's stateful ring-buffer walk
(interpolateIMUStateFor, BasicScanRegistration.cpp:136-152).

Timestamps are float32 seconds RELATIVE to the sweep start — absolute
epoch seconds would lose millisecond precision in f32.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from loam_velodyne_tpu.utils import math as lm

Array = jax.Array


class ImuWindow(NamedTuple):
    """Padded window of integrated IMU states around one sweep.

    t:    (K,) float32 — seconds relative to sweep start (ascending;
          padding at +inf)
    rpy:  (K, 3) float32 — roll, pitch, yaw
    velo: (K, 3) float32 — world-frame velocity (swapped axes)
    pos:  (K, 3) float32 — world-frame position (swapped axes)
    count: () int32
    """

    t: Array
    rpy: Array
    velo: Array
    pos: Array
    count: Array

    @staticmethod
    def empty(capacity: int = 64) -> "ImuWindow":
        return ImuWindow(
            t=jnp.full((capacity,), jnp.inf, jnp.float32),
            rpy=jnp.zeros((capacity, 3), jnp.float32),
            velo=jnp.zeros((capacity, 3), jnp.float32),
            pos=jnp.zeros((capacity, 3), jnp.float32),
            count=jnp.zeros((), jnp.int32),
        )


def _lerp_yaw(y0: Array, y1: Array, r: Array) -> Array:
    """Linear yaw interpolation with the reference's +/-pi wrap handling
    (BasicScanRegistration.h:112-127); r is the weight on y1."""
    pi = jnp.float32(math.pi)
    two_pi = jnp.float32(2 * math.pi)
    y1_adj = jnp.where(y0 - y1 > pi, y1 + two_pi,
                       jnp.where(y0 - y1 < -pi, y1 - two_pi, y1))
    return y0 * (1.0 - r) + y1_adj * r


def interpolate(win: ImuWindow, t: Array) -> Tuple[Array, Array, Array]:
    """Interpolated (rpy, velo, pos) at times t (...,).

    Matches the reference walk semantics: clamp to the first/last state
    when t is outside the history; linear interpolation between the
    bracketing states otherwise.
    """
    k = win.t.shape[0]
    # index of the first state with stamp >= t, clamped into the valid run
    idx = jnp.searchsorted(win.t, t)
    last = jnp.maximum(win.count - 1, 0)
    idx = jnp.clip(idx, 0, last)
    prev = jnp.maximum(idx - 1, 0)

    t_hi = win.t[idx]
    t_lo = win.t[prev]
    # no interpolation when at the ends or the bracket is degenerate
    direct = (idx == 0) | (t_hi < t) | (t_hi - t_lo <= 0)
    # weight on the EARLIER state, as in the reference (ratio toward prev)
    ratio = jnp.where(direct, 0.0, (t_hi - t) / jnp.maximum(t_hi - t_lo, 1e-9))

    def mix(a_hi, a_lo):
        return a_hi * (1.0 - ratio[..., None]) + a_lo * ratio[..., None]

    rpy_hi, rpy_lo = win.rpy[idx], win.rpy[prev]
    roll = rpy_hi[..., 0] * (1 - ratio) + rpy_lo[..., 0] * ratio
    pitch = rpy_hi[..., 1] * (1 - ratio) + rpy_lo[..., 1] * ratio
    yaw = _lerp_yaw(rpy_hi[..., 2], rpy_lo[..., 2], ratio)
    rpy = jnp.stack([roll, pitch, yaw], axis=-1)
    velo = mix(win.velo[idx], win.velo[prev])
    pos = mix(win.pos[idx], win.pos[prev])
    return rpy, velo, pos


def has_data(win: ImuWindow) -> Array:
    return win.count > 0


def project_to_sweep_start(pts: Array, rel_seconds: Array,
                           win: ImuWindow) -> Array:
    """Per-point IMU deskew (reference projectPointToStartOfSweep +
    transformToStartIMU, BasicScanRegistration.cpp:101-134).

    pts: (..., 3) swapped-frame points; rel_seconds: (...,) firing time
    relative to sweep start. No-op when the window is empty.
    """
    rpy_s, velo_s, pos_s = interpolate(win, jnp.zeros((), jnp.float32))
    rpy_c, _, pos_c = interpolate(win, rel_seconds)

    shift = pos_c - pos_s[None, :] - velo_s[None, :] * rel_seconds[..., None]

    # rotate to world with the current orientation
    m_cur = lm.rot_zxy_mat(rpy_c[..., 0], rpy_c[..., 1], rpy_c[..., 2])
    p = lm.apply_rot_batched(m_cur, pts) + shift
    # rotate back into the start frame
    m_start_inv = lm.rot_yxz_mat(-rpy_s[2], -rpy_s[1], -rpy_s[0])
    p = lm.apply_rot(m_start_inv, p)
    return jnp.where(has_data(win), p, pts)


def sweep_state(win: ImuWindow, scan_period: float):
    """The per-sweep IMU summary consumed by odometry — the reference's
    4-point imuTrans cloud (updateIMUTransform,
    BasicScanRegistration.cpp:258-281)."""
    from loam_velodyne_tpu.models.odometry import ImuSweepState

    rpy_s, velo_s, pos_s = interpolate(win, jnp.zeros((), jnp.float32))
    rpy_e, velo_e, pos_e = interpolate(win, jnp.float32(scan_period))

    shift = pos_e - pos_s - velo_s * scan_period
    m_inv = lm.rot_yxz_mat(-rpy_s[2], -rpy_s[1], -rpy_s[0])
    shift_start = lm.apply_rot(m_inv, shift)
    dvelo_start = lm.apply_rot(m_inv, velo_e - velo_s)

    zero = jnp.zeros((3,), jnp.float32)
    ok = has_data(win)
    return ImuSweepState(
        start_rpy=jnp.where(ok, rpy_s, zero),
        end_rpy=jnp.where(ok, rpy_e, zero),
        shift_from_start=jnp.where(ok, shift_start, zero),
        velo_from_start=jnp.where(ok, dvelo_start, zero),
    )
