"""Tests for device-side sweep ingest vs a numpy transliteration of the
reference ingest loop (MultiScanRegistration.cpp:158-234)."""

import numpy as np
import jax.numpy as jnp

from loam_velodyne_tpu.config import VLP16, RegistrationConfig
from loam_velodyne_tpu.io import synthetic
from loam_velodyne_tpu.ops import scan


def _np_reference_ingest(pts_in, lidar, scan_period=0.1):
    """Sequential transliteration of the reference process() loop.

    Returns per-ring python lists of (x, y, z, relTime) in the swapped
    frame, in push_back order.
    """
    n = len(pts_in)
    start_ori = -np.arctan2(pts_in[0][1], pts_in[0][0])
    end_ori = -np.arctan2(pts_in[-1][1], pts_in[-1][0]) + 2 * np.pi
    if end_ori - start_ori > 3 * np.pi:
        end_ori -= 2 * np.pi
    elif end_ori - start_ori < np.pi:
        end_ori += 2 * np.pi

    rings = [[] for _ in range(lidar.n_rings)]
    half_passed = False
    for i in range(n):
        x, y, z = pts_in[i][1], pts_in[i][2], pts_in[i][0]
        if not np.isfinite([x, y, z]).all():
            continue
        if x * x + y * y + z * z < 0.0001:
            continue
        angle = np.arctan(y / np.sqrt(x * x + z * z))
        ring = int(round((np.rad2deg(angle) - lidar.lower_bound_deg) * lidar.factor))
        if ring < 0 or ring >= lidar.n_rings:
            continue
        ori = -np.arctan2(x, z)
        if not half_passed:
            if ori < start_ori - np.pi / 2:
                ori += 2 * np.pi
            elif ori > start_ori + np.pi * 3 / 2:
                ori -= 2 * np.pi
            if ori - start_ori > np.pi:
                half_passed = True
        else:
            ori += 2 * np.pi
            if ori < end_ori - np.pi * 3 / 2:
                ori += 2 * np.pi
            elif ori > end_ori + np.pi / 2:
                ori -= 2 * np.pi
        rel = scan_period * (ori - start_ori) / (end_ori - start_ori)
        rings[ring].append((x, y, z, rel))
    return rings


def _ingest(pts, lidar=VLP16, reg=RegistrationConfig()):
    cap = 16384
    n = pts.shape[0]
    xyz = np.zeros((cap, 3), np.float32)
    xyz[:n] = pts
    mask = np.zeros(cap, bool)
    mask[:n] = True
    raw = scan.RawSweep(xyz=jnp.asarray(xyz), mask=jnp.asarray(mask))
    return scan.ingest_sweep(raw, lidar, reg)


def test_ingest_matches_reference_transliteration():
    sweeps, _, _ = synthetic.generate_sequence(1, n_azimuth=240)
    pts = sweeps[0]
    grid, full = _ingest(pts)
    ref_rings = _np_reference_ingest(pts, VLP16)

    grid_xyz = np.asarray(grid.xyz)
    grid_rel = np.asarray(grid.rel)
    grid_count = np.asarray(grid.count)

    for r in range(VLP16.n_rings):
        ref = ref_rings[r]
        assert grid_count[r] == len(ref), (r, grid_count[r], len(ref))
        for k, (x, y, z, rel) in enumerate(ref):
            np.testing.assert_allclose(grid_xyz[r, k], [x, y, z],
                                       rtol=1e-5, atol=1e-5)
            # grid stores the fraction relTime/scanPeriod
            np.testing.assert_allclose(grid_rel[r, k] * 0.1, rel, atol=2e-6)


def test_ingest_filters_invalid_points():
    sweeps, _, _ = synthetic.generate_sequence(1, n_azimuth=120)
    pts = sweeps[0].copy()
    pts[5] = [np.nan, 0.1, 0.2]
    pts[17] = [0.001, 0.001, 0.001]   # below min range
    grid, full = _ingest(pts)
    ref_rings = _np_reference_ingest(pts, VLP16)
    assert int(np.asarray(grid.count).sum()) == sum(len(r) for r in ref_rings)
    assert int(np.asarray(full.mask).sum()) == sum(len(r) for r in ref_rings)


def test_full_cloud_is_ring_major_concat():
    sweeps, _, _ = synthetic.generate_sequence(1, n_azimuth=120)
    grid, full = _ingest(sweeps[0])
    full_xyz = np.asarray(full.xyz)
    full_mask = np.asarray(full.mask)
    counts = np.asarray(grid.count)
    offset = 0
    for r in range(VLP16.n_rings):
        np.testing.assert_allclose(full_xyz[offset:offset + counts[r]],
                                   np.asarray(grid.xyz)[r, :counts[r]],
                                   rtol=1e-6)
        assert full_mask[offset:offset + counts[r]].all()
        offset += counts[r]
    assert not full_mask[offset:].any()


def test_synthetic_world_geometry_sane():
    sweeps, gt, _ = synthetic.generate_sequence(3, n_azimuth=360)
    for pts in sweeps:
        r = np.linalg.norm(pts, axis=1)
        assert (r > 0.15).all() and (r < 100.0).all()
        assert len(pts) > 2000
    # ground truth moves forward (z in LOAM frame) at ~1 m/s
    assert gt[-1][2] > gt[0][2]


def test_halfpassed_ignores_invalid_points():
    """A NaN return early in the sweep must not flip halfPassed (the
    reference skips NaN/zero/out-of-ring points before the walk,
    MultiScanRegistration.cpp:186-215; a zeroed NaN has ori=0 which can
    land past startOri+pi and shift every later relTime by a sweep)."""
    sweeps, _, _ = synthetic.generate_sequence(1, n_azimuth=360)
    pts = sweeps[0].copy()
    reg = RegistrationConfig()

    raw_clean = scan.RawSweep(xyz=jnp.asarray(pts),
                              mask=jnp.ones((len(pts),), bool))
    _, full_clean = scan.ingest_sweep(raw_clean, VLP16, reg)

    # poison a few points near the start with NaN / zero range
    poisoned = pts.copy()
    poisoned[5] = np.nan
    poisoned[17] = 0.0
    raw_poisoned = scan.RawSweep(xyz=jnp.asarray(poisoned),
                                 mask=jnp.ones((len(pts),), bool))
    _, full_poisoned = scan.ingest_sweep(raw_poisoned, VLP16, reg)

    # dropping points re-packs the ring-major layout, so match the
    # surviving points by coordinates and compare their rel times
    def rel_by_xyz(full):
        m = np.asarray(full.mask)
        xyz = np.asarray(full.xyz)[m]
        rel = np.asarray(full.rel)[m]
        return {tuple(np.round(p, 5)): r for p, r in zip(xyz, rel)}

    clean = rel_by_xyz(full_clean)
    poisoned_rel = rel_by_xyz(full_poisoned)
    assert len(poisoned_rel) == len(clean) - 2
    for key, r in poisoned_rel.items():
        assert key in clean
        np.testing.assert_allclose(r, clean[key], atol=1e-6)
