"""Rotation / pose math in LOAM's Euler conventions, as JAX array ops.

The reference implements all pose algebra as scalar trig chains on a
``Twist`` (three Euler angles + position) in a camera-style frame
(x=left, y=up, z=forward after the ingest axis swap,
reference MultiScanRegistration.cpp:182-184). Its two composite rotations are

- ``rotateZXY(p, az, ax, ay)`` = Ry(ay) @ Rx(ax) @ Rz(az) @ p
  (reference math_utils.h:212-238)
- ``rotateYXZ(p, ay, ax, az)`` = Rz(az) @ Rx(ax) @ Ry(ay) @ p
  (reference math_utils.h:249-275)

so a Twist (rx, ry, rz, t) acts on points as ``p' = R @ p + t`` with
``R = Ry(ry) @ Rx(rx) @ Rz(rz)`` and exact inverse
``rotateYXZ(p - t, -ry, -rx, -rz) = R^T (p - t)``.

Instead of porting the reference's expanded trig jungles
(accumulateRotation BasicLaserOdometry.cpp:155-179, pluginIMURotation
:91-151, transformAssociateToMap BasicLaserMapping.cpp:103-167), we work in
matrix form and extract Euler angles once; the expansions were verified
term-by-term to equal these compositions:

- accumulateRotation(c, l)       == euler_yxz(R(c) @ R(l))
- pluginIMURotation(bc, bl, al)  == euler_yxz(R(bc) @ R(bl)^T @ R(al))
- transformAssociateToMap        == pose of T_aft .. T_bef^-1 .. T_sum

All math is float32 (the reference is float throughout, Angle.h:16-67).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# A pose ("Twist", reference Twist.h:15-27) is a flat (6,) f32 array:
# [rot_x, rot_y, rot_z, pos_x, pos_y, pos_z].
ROT = slice(0, 3)
POS = slice(3, 6)


def identity_pose() -> Array:
    return jnp.zeros((6,), jnp.float32)


def make_pose(rot, pos) -> Array:
    return jnp.concatenate([jnp.asarray(rot, jnp.float32).reshape(3),
                            jnp.asarray(pos, jnp.float32).reshape(3)])


# ---------------------------------------------------------------------------
# Elementary rotations (reference math_utils.h:129-201 conventions).
# ---------------------------------------------------------------------------

def rot_x_mat(a: Array) -> Array:
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack([jnp.stack([o, z, z], -1),
                      jnp.stack([z, c, -s], -1),
                      jnp.stack([z, s, c], -1)], -2)


def rot_y_mat(a: Array) -> Array:
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack([jnp.stack([c, z, s], -1),
                      jnp.stack([z, o, z], -1),
                      jnp.stack([-s, z, c], -1)], -2)


def rot_z_mat(a: Array) -> Array:
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack([jnp.stack([c, -s, z], -1),
                      jnp.stack([s, c, z], -1),
                      jnp.stack([z, z, o], -1)], -2)


def mat3_mul(a: Array, b: Array) -> Array:
    """(...,3,3) @ (...,3,3) as explicit f32 multiply-adds (VPU, not MXU).

    See apply_rot for why: bf16 MXU rounding on pose rotations is fatal
    for cm-level trajectory accuracy.
    """
    rows = []
    for i in range(3):
        cols = []
        for j in range(3):
            cols.append(a[..., i, 0] * b[..., 0, j]
                        + a[..., i, 1] * b[..., 1, j]
                        + a[..., i, 2] * b[..., 2, j])
        rows.append(jnp.stack(cols, -1))
    return jnp.stack(rows, -2)


def mat3_transpose(m: Array) -> Array:
    return jnp.swapaxes(m, -1, -2)


def rot_zxy_mat(az: Array, ax: Array, ay: Array) -> Array:
    """Matrix of rotateZXY: applies Rz first, then Rx, then Ry."""
    return mat3_mul(rot_y_mat(ay), mat3_mul(rot_x_mat(ax), rot_z_mat(az)))


def rot_yxz_mat(ay: Array, ax: Array, az: Array) -> Array:
    """Matrix of rotateYXZ: applies Ry first, then Rx, then Rz."""
    return mat3_mul(rot_z_mat(az), mat3_mul(rot_x_mat(ax), rot_y_mat(ay)))


def pose_rot_mat(pose: Array) -> Array:
    """R = Ry(ry) Rx(rx) Rz(rz) for a (…,6) pose (the Twist rotation)."""
    r = pose[..., ROT]
    return rot_zxy_mat(r[..., 2], r[..., 0], r[..., 1])


def euler_yxz(m: Array) -> Array:
    """Extract (rx, ry, rz) with R = Ry(ry) Rx(rx) Rz(rz) from a (…,3,3) matrix.

    With this convention M[1,2] = -sin(rx), M[0,2]/M[2,2] = tan(ry)·…,
    M[1,0]/M[1,1] = tan(rz). Matches the -asin/atan2 extraction pattern of the
    reference trig chains (e.g. BasicLaserOdometry.cpp:162-178).
    """
    rx = -jnp.arcsin(jnp.clip(m[..., 1, 2], -1.0, 1.0))
    ry = jnp.arctan2(m[..., 0, 2], m[..., 2, 2])
    rz = jnp.arctan2(m[..., 1, 0], m[..., 1, 1])
    return jnp.stack([rx, ry, rz], -1)


# ---------------------------------------------------------------------------
# Point transforms.
# ---------------------------------------------------------------------------

def apply_rot(m: Array, pts: Array) -> Array:
    """Rotate (...,3) points by a (3,3) matrix.

    Written as explicit multiply-adds rather than a matmul: on TPU a
    float32 ``pts @ m.T`` is lowered onto the MXU with bfloat16 inputs
    (~1e-2 absolute error at unit scale), which is far too coarse for
    cm-level odometry. The elementwise form runs on the VPU in full
    float32 and fuses with surrounding ops.
    """
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    return jnp.stack([
        m[0, 0] * x + m[0, 1] * y + m[0, 2] * z,
        m[1, 0] * x + m[1, 1] * y + m[1, 2] * z,
        m[2, 0] * x + m[2, 1] * y + m[2, 2] * z,
    ], axis=-1)


def apply_rot_batched(m: Array, pts: Array) -> Array:
    """Rotate (...,3) points by matching (...,3,3) matrices, f32-exact."""
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    return jnp.stack([
        m[..., 0, 0] * x + m[..., 0, 1] * y + m[..., 0, 2] * z,
        m[..., 1, 0] * x + m[..., 1, 1] * y + m[..., 1, 2] * z,
        m[..., 2, 0] * x + m[..., 2, 1] * y + m[..., 2, 2] * z,
    ], axis=-1)


def pose_transform_points(pose: Array, pts: Array) -> Array:
    """p' = R p + t (e.g. pointAssociateToMap, BasicLaserMapping.cpp:207-219)."""
    return apply_rot(pose_rot_mat(pose), pts) + pose[POS]


def pose_inverse_transform_points(pose: Array, pts: Array) -> Array:
    """p' = R^T (p - t) (pointAssociateTobeMapped, BasicLaserMapping.cpp:223-231)."""
    return apply_rot(mat3_transpose(pose_rot_mat(pose)), pts - pose[POS])


# ---------------------------------------------------------------------------
# Pose composition in LOAM's conventions.
# ---------------------------------------------------------------------------

def accumulate_rotation(c: Array, l: Array) -> Array:
    """Euler angles of R(c) @ R(l).

    Equivalent of reference accumulateRotation (BasicLaserOdometry.cpp:155-179),
    used to fold the negated per-sweep relative rotation into the global
    odometry pose.
    """
    rc = rot_zxy_mat(c[2], c[0], c[1])
    rl = rot_zxy_mat(l[2], l[0], l[1])
    return euler_yxz(mat3_mul(rc, rl))


def plugin_imu_rotation(bc: Array, bl: Array, al: Array) -> Array:
    """Euler angles of R(bc) @ R(bl)^T @ R(al).

    Equivalent of reference pluginIMURotation (BasicLaserOdometry.cpp:91-151):
    swaps the IMU orientation at sweep start (bl) for the IMU orientation at
    sweep end (al) inside the accumulated rotation bc.
    """
    rbc = rot_zxy_mat(bc[2], bc[0], bc[1])
    rbl = rot_zxy_mat(bl[2], bl[0], bl[1])
    ral = rot_zxy_mat(al[2], al[0], al[1])
    return euler_yxz(mat3_mul(mat3_mul(rbc, mat3_transpose(rbl)), ral))


def transform_associate_to_map(transform_sum: Array,
                               transform_bef: Array,
                               transform_aft: Array) -> Array:
    """Predict the mapped pose from the new odometry pose.

    Equivalent of reference transformAssociateToMap
    (BasicLaserMapping.cpp:103-167 and the scalar-expanded twin in
    BasicTransformMaintenance.cpp:83-178): composes the odometry increment
    since the last mapping update onto the last mapped pose,
    T_tobe = T_aft .. T_bef^-1 .. T_sum.
    """
    r_sum = pose_rot_mat(transform_sum)
    r_bef = pose_rot_mat(transform_bef)
    r_aft = pose_rot_mat(transform_aft)
    r_tobe = mat3_mul(mat3_mul(r_aft, mat3_transpose(r_bef)), r_sum)
    rot = euler_yxz(r_tobe)
    # incre = R_sum^T (t_bef - t_sum); t_tobe = t_aft - R_tobe @ incre
    incre = apply_rot(mat3_transpose(r_sum), transform_bef[POS] - transform_sum[POS])
    pos = transform_aft[POS] - apply_rot(r_tobe, incre)
    return jnp.concatenate([rot, pos])


# ---------------------------------------------------------------------------
# Sweep deskew transforms (reference BasicLaserOdometry.cpp:40-87).
# ---------------------------------------------------------------------------

def transform_to_start(pts: Array, rel_frac: Array, transform: Array) -> Array:
    """Project points to sweep start under linear motion interpolation.

    For each point with sweep-relative fraction s (= relTime/scanPeriod):
    p' = rotateZXY(p - s*t, -s*rz, -s*rx, -s*ry)
    (reference transformToStart, BasicLaserOdometry.cpp:40-53; note the
    reference rotates with rotateZXY of the negated scaled angles, which is
    NOT the exact inverse of R(s*rot) — replicated faithfully.)
    """
    s = rel_frac[..., None]
    p = pts - s * transform[POS]
    r = transform[ROT]
    sr = -rel_frac[..., None] * r  # (N,3) scaled negated angles
    # Batched rotateZXY with per-point angles.
    m = rot_zxy_mat(sr[..., 2], sr[..., 0], sr[..., 1])  # (N,3,3)
    return apply_rot_batched(m, p)


def transform_to_end(pts: Array, rel_frac: Array, transform: Array,
                     imu_start_rpy: Array, imu_end_rpy: Array,
                     imu_shift_from_start: Array) -> Array:
    """Project points to the sweep end frame (reference transformToEnd,
    BasicLaserOdometry.cpp:57-87), including the IMU start/end re-rotation."""
    p = transform_to_start(pts, rel_frac, transform)
    r = transform[ROT]
    m_fwd = rot_yxz_mat(r[1], r[0], r[2])  # exact inverse of the deskew at s=1
    p = apply_rot(m_fwd, p)
    p = p + transform[POS] - imu_shift_from_start
    # rotateZXY(p, rollStart, pitchStart, yawStart)
    m_imu = rot_zxy_mat(imu_start_rpy[0], imu_start_rpy[1], imu_start_rpy[2])
    # rotateYXZ(p, -yawEnd, -pitchEnd, -rollEnd)
    m_end = rot_yxz_mat(-imu_end_rpy[2], -imu_end_rpy[1], -imu_end_rpy[0])
    return apply_rot(m_end, apply_rot(m_imu, p))


def rad2deg(x: Array) -> Array:
    return x * jnp.float32(180.0 / jnp.pi)


def deg2rad(x: Array) -> Array:
    return x * jnp.float32(jnp.pi / 180.0)
