"""Odometry tests: residual/Jacobian parity with the reference math and
an end-to-end two-sweep motion check on synthetic data."""

import numpy as np
import jax
import jax.numpy as jnp

from loam_velodyne_tpu.config import LoamConfig
from loam_velodyne_tpu.io import synthetic
from loam_velodyne_tpu.models import odometry
from loam_velodyne_tpu.ops import features, scan
from loam_velodyne_tpu.types import PointSet


CFG = LoamConfig.preset("VLP-16")


def _np_reference_jacobian_row(tf, p, coeff):
    """Transliteration of the reference's analytic partials
    (BasicLaserOdometry.cpp:497-554), s=1."""
    rx, ry, rz, tx, ty, tz = tf
    srx, crx = np.sin(rx), np.cos(rx)
    sry, cry = np.sin(ry), np.cos(ry)
    srz, crz = np.sin(rz), np.cos(rz)
    x, y, z = p
    cx, cy, cz = coeff

    arx = ((-crx * sry * srz * x + crx * crz * sry * y + srx * sry * z
            + tx * crx * sry * srz - ty * crx * crz * sry - tz * srx * sry) * cx
           + (srx * srz * x - crz * srx * y + crx * z
              + ty * crz * srx - tz * crx - tx * srx * srz) * cy
           + (crx * cry * srz * x - crx * cry * crz * y - cry * srx * z
              + tz * cry * srx + ty * crx * cry * crz - tx * crx * cry * srz) * cz)
    ary = (((-crz * sry - cry * srx * srz) * x
            + (cry * crz * srx - sry * srz) * y - crx * cry * z
            + tx * (crz * sry + cry * srx * srz) + ty * (sry * srz - cry * crz * srx)
            + tz * crx * cry) * cx
           + ((cry * crz - srx * sry * srz) * x
              + (cry * srz + crz * srx * sry) * y - crx * sry * z
              + tz * crx * sry - ty * (cry * srz + crz * srx * sry)
              - tx * (cry * crz - srx * sry * srz)) * cz)
    arz = (((-cry * srz - crz * srx * sry) * x + (cry * crz - srx * sry * srz) * y
            + tx * (cry * srz + crz * srx * sry) - ty * (cry * crz - srx * sry * srz)) * cx
           + (-crx * crz * x - crx * srz * y
              + ty * crx * srz + tx * crx * crz) * cy
           + ((cry * crz * srx - sry * srz) * x + (crz * sry + cry * srx * srz) * y
              + tx * (sry * srz - cry * crz * srx) - ty * (crz * sry + cry * srx * srz)) * cz)
    atx = (-(cry * crz - srx * sry * srz) * cx + crx * srz * cy
           - (crz * sry + cry * srx * srz) * cz)
    aty = (-(cry * srz + crz * srx * sry) * cx - crx * crz * cy
           - (sry * srz - cry * crz * srx) * cz)
    atz = crx * sry * cx - srx * cy - crx * cry * cz
    return np.array([arx, ary, arz, atx, aty, atz])


def _np_line_coeff(x0, a, b):
    """Transliteration of la/lb/lc/ld2 (BasicLaserOdometry.cpp:319-337)."""
    x1, y1, z1 = a
    x2, y2, z2 = b
    x0_, y0, z0 = x0
    cxy = (x0_ - x1) * (y0 - y2) - (x0_ - x2) * (y0 - y1)
    cxz = (x0_ - x1) * (z0 - z2) - (x0_ - x2) * (z0 - z1)
    cyz = (y0 - y1) * (z0 - z2) - (y0 - y2) * (z0 - z1)
    a012 = np.sqrt(cxy ** 2 + cxz ** 2 + cyz ** 2)
    l12 = np.sqrt((x1 - x2) ** 2 + (y1 - y2) ** 2 + (z1 - z2) ** 2)
    la = ((y1 - y2) * cxy + (z1 - z2) * cxz) / a012 / l12
    lb = -((x1 - x2) * cxy - (z1 - z2) * cyz) / a012 / l12
    lc = -((x1 - x2) * cxz + (y1 - y2) * cyz) / a012 / l12
    return a012 / l12, np.array([la, lb, lc])


def test_jacobian_rows_match_reference_partials(rng):
    for _ in range(5):
        tf = rng.uniform(-0.5, 0.5, 6).astype(np.float32)
        p = rng.normal(size=3).astype(np.float32)
        coeff = rng.normal(size=3).astype(np.float32)
        ours = np.asarray(odometry._jacobian_rows(
            jnp.asarray(tf), jnp.asarray(p)[None], jnp.asarray(coeff)[None]))[0]
        ref = _np_reference_jacobian_row(tf.astype(np.float64),
                                         p.astype(np.float64),
                                         coeff.astype(np.float64))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_line_residual_matches_reference(rng):
    for _ in range(10):
        x0 = rng.normal(size=3)
        a = rng.normal(size=3)
        b = rng.normal(size=3)
        d, direction = odometry._line_residual(
            jnp.asarray(x0, jnp.float32), jnp.asarray(a, jnp.float32),
            jnp.asarray(b, jnp.float32))
        ref_d, ref_dir = _np_line_coeff(x0, a, b)
        np.testing.assert_allclose(float(d), ref_d, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(direction), ref_dir,
                                   rtol=1e-3, atol=1e-4)


def test_plane_residual_geometry(rng):
    # plane z=1 through three points; signed distance of (0, 0, 2) is +-1
    t1 = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    t2 = jnp.asarray([1.0, 0.0, 1.0], jnp.float32)
    t3 = jnp.asarray([0.0, 1.0, 1.0], jnp.float32)
    d, n = odometry._plane_residual(jnp.asarray([0.0, 0.0, 2.0], jnp.float32),
                                    t1, t2, t3)
    assert abs(abs(float(d)) - 1.0) < 1e-6
    np.testing.assert_allclose(np.abs(np.asarray(n)), [0, 0, 1], atol=1e-6)


def _sweep_features(pts):
    cap = 16384
    xyz = np.zeros((cap, 3), np.float32)
    xyz[:len(pts)] = pts
    mask = np.zeros(cap, bool)
    mask[:len(pts)] = True
    raw = scan.RawSweep(xyz=jnp.asarray(xyz), mask=jnp.asarray(mask))
    grid, full = scan.ingest_sweep(raw, CFG.lidar, CFG.registration)
    feats = features.extract_features(grid, CFG.registration, CFG.capacities)
    return feats, full


def test_two_sweep_odometry_recovers_forward_motion():
    # Pure forward motion at 2 m/s: expect ~0.2 m forward (z in LOAM
    # frame) between consecutive sweeps, no rotation.
    traj = synthetic.straight_trajectory(speed=2.0, yaw_amp=0.0, sway_amp=0.0)
    sweeps, gt, _ = synthetic.generate_sequence(3, n_azimuth=900, speed=2.0,
                                                traj=traj)
    state = odometry.OdometryState.create(CFG)
    step = jax.jit(lambda s, f: odometry.step(s, f, CFG))

    poses = []
    for pts in sweeps:
        feats, _ = _sweep_features(pts)
        state, outs = step(state, feats)
        poses.append(np.asarray(outs.transform_sum))

    # First sweep initializes: identity.
    np.testing.assert_allclose(poses[0], 0.0, atol=1e-6)
    # Subsequent increments: ~0.2 m in +z (forward), small elsewhere.
    for k in (1, 2):
        inc = poses[k] - poses[k - 1]
        assert abs(inc[5] - 0.2) < 0.04, (k, inc)      # forward
        assert np.linalg.norm(inc[:3]) < 0.02, (k, inc)  # no rotation
        assert abs(inc[3]) < 0.04 and abs(inc[4]) < 0.04, (k, inc)


def test_odometry_stationary_is_identity():
    traj = synthetic.straight_trajectory(speed=0.0, yaw_amp=0.0, sway_amp=0.0)
    sweeps, _, _ = synthetic.generate_sequence(2, n_azimuth=900, traj=traj)
    state = odometry.OdometryState.create(CFG)
    step = jax.jit(lambda s, f: odometry.step(s, f, CFG))
    for pts in sweeps:
        feats, _ = _sweep_features(pts)
        state, outs = step(state, feats)
    pose = np.asarray(outs.transform_sum)
    assert np.linalg.norm(pose[3:]) < 0.01, pose
    assert np.linalg.norm(pose[:3]) < 0.005, pose
