"""Unit tests for LOAM Euler/pose math.

Validates the matrix formulation against (a) self-consistency (Euler
round-trips, inverse transforms) and (b) NumPy transliterations of the
reference trig chains (accumulateRotation, transformAssociateToMap) on random
inputs — the transliterations live here in the tests only, as ground truth.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from loam_velodyne_tpu.utils import math as lm


def _np_rot_x(p, a):
    c, s = np.cos(a), np.sin(a)
    y = p[1].copy() if hasattr(p[1], "copy") else p[1]
    return np.array([p[0], c * y - s * p[2], s * y + c * p[2]])


def _np_rot_y(p, a):
    c, s = np.cos(a), np.sin(a)
    x = p[0]
    return np.array([c * x + s * p[2], p[1], c * p[2] - s * x])


def _np_rot_z(p, a):
    c, s = np.cos(a), np.sin(a)
    x = p[0]
    return np.array([c * x - s * p[1], s * x + c * p[1], p[2]])


def _np_rotate_zxy(p, az, ax, ay):
    return _np_rot_y(_np_rot_x(_np_rot_z(p, az), ax), ay)


def _np_rotate_yxz(p, ay, ax, az):
    return _np_rot_z(_np_rot_x(_np_rot_y(p, ay), ax), az)


def _np_accumulate_rotation(cx, cy, cz, lx, ly, lz):
    # Transliteration of reference BasicLaserOdometry.cpp:155-179.
    srx = (np.cos(lx) * np.cos(cx) * np.sin(ly) * np.sin(cz)
           - np.cos(cx) * np.cos(cz) * np.sin(lx)
           - np.cos(lx) * np.cos(ly) * np.sin(cx))
    ox = -np.arcsin(srx)
    srycrx = (np.sin(lx) * (np.cos(cy) * np.sin(cz) - np.cos(cz) * np.sin(cx) * np.sin(cy))
              + np.cos(lx) * np.sin(ly) * (np.cos(cy) * np.cos(cz) + np.sin(cx) * np.sin(cy) * np.sin(cz))
              + np.cos(lx) * np.cos(ly) * np.cos(cx) * np.sin(cy))
    crycrx = (np.cos(lx) * np.cos(ly) * np.cos(cx) * np.cos(cy)
              - np.cos(lx) * np.sin(ly) * (np.cos(cz) * np.sin(cy) - np.cos(cy) * np.sin(cx) * np.sin(cz))
              - np.sin(lx) * (np.sin(cy) * np.sin(cz) + np.cos(cy) * np.cos(cz) * np.sin(cx)))
    oy = np.arctan2(srycrx / np.cos(ox), crycrx / np.cos(ox))
    srzcrx = (np.sin(cx) * (np.cos(lz) * np.sin(ly) - np.cos(ly) * np.sin(lx) * np.sin(lz))
              + np.cos(cx) * np.sin(cz) * (np.cos(ly) * np.cos(lz) + np.sin(lx) * np.sin(ly) * np.sin(lz))
              + np.cos(lx) * np.cos(cx) * np.cos(cz) * np.sin(lz))
    crzcrx = (np.cos(lx) * np.cos(lz) * np.cos(cx) * np.cos(cz)
              - np.cos(cx) * np.sin(cz) * (np.cos(ly) * np.sin(lz) - np.cos(lz) * np.sin(lx) * np.sin(ly))
              - np.sin(cx) * (np.sin(ly) * np.sin(lz) + np.cos(ly) * np.cos(lz) * np.sin(lx)))
    oz = np.arctan2(srzcrx / np.cos(ox), crzcrx / np.cos(ox))
    return np.array([ox, oy, oz])


def test_elementary_rotations_match_reference_convention(rng):
    p = rng.normal(size=3).astype(np.float32)
    for a in [0.3, -1.2, 2.9]:
        np.testing.assert_allclose(
            np.asarray(lm.apply_rot(lm.rot_x_mat(jnp.float32(a)), jnp.asarray(p))),
            _np_rot_x(p, a), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(lm.apply_rot(lm.rot_y_mat(jnp.float32(a)), jnp.asarray(p))),
            _np_rot_y(p, a), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(lm.apply_rot(lm.rot_z_mat(jnp.float32(a)), jnp.asarray(p))),
            _np_rot_z(p, a), rtol=1e-5, atol=1e-6)


def test_composite_rotations(rng):
    p = rng.normal(size=3).astype(np.float32)
    az, ax, ay = 0.2, -0.4, 1.1
    np.testing.assert_allclose(
        np.asarray(lm.apply_rot(lm.rot_zxy_mat(jnp.float32(az), jnp.float32(ax), jnp.float32(ay)),
                                jnp.asarray(p))),
        _np_rotate_zxy(p, az, ax, ay), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(lm.apply_rot(lm.rot_yxz_mat(jnp.float32(ay), jnp.float32(ax), jnp.float32(az)),
                                jnp.asarray(p))),
        _np_rotate_yxz(p, ay, ax, az), rtol=1e-5, atol=1e-6)


def test_euler_yxz_roundtrip(rng):
    for _ in range(20):
        rx, ry, rz = rng.uniform(-1.4, 1.4), rng.uniform(-3, 3), rng.uniform(-3, 3)
        m = lm.rot_zxy_mat(jnp.float32(rz), jnp.float32(rx), jnp.float32(ry))
        angles = np.asarray(lm.euler_yxz(m))
        m2 = lm.rot_zxy_mat(jnp.float32(angles[2]), jnp.float32(angles[0]),
                            jnp.float32(angles[1]))
        np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-5)


def test_accumulate_rotation_matches_reference_trig(rng):
    for _ in range(10):
        c = rng.uniform(-1.2, 1.2, 3)
        l = rng.uniform(-1.2, 1.2, 3)
        ours = np.asarray(lm.accumulate_rotation(jnp.asarray(c, jnp.float32),
                                                 jnp.asarray(l, jnp.float32)))
        ref = _np_accumulate_rotation(*c, *l)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_pose_transform_inverse(rng):
    pose = jnp.asarray(rng.uniform(-1, 1, 6), jnp.float32)
    pts = jnp.asarray(rng.normal(size=(17, 3)), jnp.float32)
    out = lm.pose_inverse_transform_points(pose, lm.pose_transform_points(pose, pts))
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-5)


def test_transform_associate_to_map_identity_cases(rng):
    # If bef == sum (no odometry motion since last mapping), tobe == aft.
    sum_ = jnp.asarray(rng.uniform(-1, 1, 6), jnp.float32)
    aft = jnp.asarray(rng.uniform(-1, 1, 6), jnp.float32)
    tobe = lm.transform_associate_to_map(sum_, sum_, aft)
    m_tobe = lm.pose_rot_mat(tobe)
    m_aft = lm.pose_rot_mat(aft)
    np.testing.assert_allclose(np.asarray(m_tobe), np.asarray(m_aft), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tobe[3:]), np.asarray(aft[3:]), atol=1e-5)

    # If aft == bef (mapping agreed with odometry), tobe == sum.
    tobe2 = lm.transform_associate_to_map(sum_, aft, aft)
    np.testing.assert_allclose(np.asarray(lm.pose_rot_mat(tobe2)),
                               np.asarray(lm.pose_rot_mat(sum_)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tobe2[3:]), np.asarray(sum_[3:]), atol=1e-4)


def test_transform_to_start_zero_motion_is_identity(rng):
    pts = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    rel = jnp.asarray(rng.uniform(0, 1, 8), jnp.float32)
    out = lm.transform_to_start(pts, rel, lm.identity_pose())
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-6)


def test_transform_to_start_full_fraction_matches_composition(rng):
    # At s=1 the deskew is rotateZXY(p - t, -rz, -rx, -ry).
    t = jnp.asarray(rng.uniform(-0.5, 0.5, 6), jnp.float32)
    p = rng.normal(size=3).astype(np.float32)
    out = lm.transform_to_start(jnp.asarray(p)[None], jnp.ones((1,), jnp.float32), t)
    tn = np.asarray(t)
    expect = _np_rotate_zxy(p - tn[3:], -tn[2], -tn[0], -tn[1])
    np.testing.assert_allclose(np.asarray(out[0]), expect, rtol=1e-4, atol=1e-5)
