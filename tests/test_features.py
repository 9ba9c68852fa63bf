"""Feature-extraction tests vs a numpy transliteration of the reference
(BasicScanRegistration.cpp:155-386).

Exactness tiers:
- curvature / rejection mask / suppression extents / region bounds:
  bit-faithful, compared exactly;
- greedy picks: the TPU version picks regions in parallel (the reference
  is region-sequential, with <=5-point suppression leakage across
  boundaries) and caps the candidate scan, so picks are compared by set
  overlap with a high threshold.
"""

import numpy as np
import jax
import jax.numpy as jnp

from loam_velodyne_tpu.config import VLP16, Capacities, MappingConfig, RegistrationConfig
from loam_velodyne_tpu.io import synthetic
from loam_velodyne_tpu.ops import features, scan
from loam_velodyne_tpu.types import PointSet


REG = RegistrationConfig()
CAPS = Capacities.for_lidar(VLP16, REG, MappingConfig())


def _np_ring_reference(pts, reg=REG):
    """Sequential reference feature pass over one ring (point list).

    Returns (labels, picked_initial, curvature, valid) arrays of len(pts).
    labels: 2 sharp, 1 less-sharp, 0 neutral-in-region, -1 flat,
    -100 outside any region.
    """
    n = len(pts)
    C = reg.curvature_region
    labels = np.full(n, -100, np.int32)
    curv = np.zeros(n)
    picked = np.zeros(n, np.int32)
    e = n - 1
    if e <= 2 * C:
        return labels, picked, curv
    p = np.asarray(pts, np.float64)

    # setScanBuffersFor
    for i in range(C, e - C):
        d_next = np.sum((p[i + 1] - p[i]) ** 2)
        if d_next > 0.1:
            d1, d2 = np.linalg.norm(p[i]), np.linalg.norm(p[i + 1])
            if d1 > d2:
                wd = np.linalg.norm(p[i + 1] - p[i] * (d2 / d1)) / d2
                if wd < 0.1:
                    picked[i - C:i + 1] = 1
                    continue
            else:
                wd = np.linalg.norm(p[i] - p[i + 1] * (d1 / d2)) / d1
                if wd < 0.1:
                    picked[i + 1:i + C + 2] = 1
        d_prev = np.sum((p[i] - p[i - 1]) ** 2)
        dis = np.sum(p[i] ** 2)
        if d_next > 0.0002 * dis and d_prev > 0.0002 * dis:
            picked[i] = 1
    picked0 = picked.copy()

    # curvature
    for i in range(C, e - C + 1):
        d = -2 * C * p[i].copy()
        for j in range(1, C + 1):
            d += p[i + j] + p[i - j]
        curv[i] = np.sum(d * d)

    def mark(idx):
        picked[idx] = 1
        for j in range(1, C + 1):
            if np.sum((p[idx + j] - p[idx + j - 1]) ** 2) > 0.05:
                break
            picked[idx + j] = 1
        for j in range(1, C + 1):
            if np.sum((p[idx - j] - p[idx - j + 1]) ** 2) > 0.05:
                break
            picked[idx - j] = 1

    nreg = reg.n_feature_regions
    for j in range(nreg):
        sp = (C * (nreg - j) + (e - C) * j) // nreg
        ep = (C * (nreg - 1 - j) + (e - C) * (j + 1)) // nreg - 1
        if ep <= sp:
            continue
        labels[sp:ep + 1] = 0
        order = sorted(range(sp, ep + 1), key=lambda i: curv[i])
        n_corner = 0
        for i in reversed(order):
            if n_corner >= reg.max_corner_less_sharp:
                break
            if picked[i] == 0 and curv[i] > reg.surface_curvature_threshold:
                n_corner += 1
                labels[i] = 2 if n_corner <= reg.max_corner_sharp else 1
                mark(i)
        n_flat = 0
        for i in order:
            if n_flat >= reg.max_surface_flat:
                break
            if picked[i] == 0 and curv[i] < reg.surface_curvature_threshold:
                n_flat += 1
                labels[i] = -1
                mark(i)
    return labels, picked0, curv


def _grids(n_azimuth=900):
    sweeps, _, _ = synthetic.generate_sequence(1, n_azimuth=n_azimuth,
                                               noise_std=0.01)
    pts = sweeps[0]
    cap = 16384
    xyz = np.zeros((cap, 3), np.float32)
    xyz[:len(pts)] = pts
    mask = np.zeros(cap, bool)
    mask[:len(pts)] = True
    raw = scan.RawSweep(xyz=jnp.asarray(xyz), mask=jnp.asarray(mask))
    grid, full = scan.ingest_sweep(raw, VLP16, REG)
    return grid, full


def test_curvature_and_rejection_exact():
    grid, _ = _grids()
    counts = np.asarray(grid.count)
    for r in [0, 7, 15]:
        n = counts[r]
        pts = np.asarray(grid.xyz[r, :n])
        labels_ref, picked0_ref, curv_ref = _np_ring_reference(list(pts))
        curv, valid = features.ring_curvature(grid.xyz[r], grid.count[r],
                                              REG.curvature_region)
        rej = features.ring_rejection_mask(grid.xyz[r], grid.count[r],
                                           REG.curvature_region)
        curv, valid, rej = map(np.asarray, (curv, valid, rej))
        C = REG.curvature_region
        assert valid[:n][C:n - C].all() and not valid[n:].any()
        np.testing.assert_allclose(curv[C:n - C], curv_ref[C:n - C],
                                   rtol=2e-3, atol=1e-4)
        np.testing.assert_array_equal(rej[:n], picked0_ref.astype(bool))


def test_suppression_extents_match_reference_walk():
    grid, _ = _grids()
    r = 8
    n = int(np.asarray(grid.count[r]))
    pts = np.asarray(grid.xyz[r, :n], np.float64)
    left, right = features.suppression_extents(grid.xyz[r], grid.count[r],
                                               REG.curvature_region)
    left, right = np.asarray(left), np.asarray(right)
    C = REG.curvature_region
    for i in range(C, n - C):
        exp_r = 0
        for j in range(1, C + 1):
            if np.sum((pts[i + j] - pts[i + j - 1]) ** 2) > 0.05:
                break
            exp_r += 1
        exp_l = 0
        for j in range(1, C + 1):
            if np.sum((pts[i - j] - pts[i - j + 1]) ** 2) > 0.05:
                break
            exp_l += 1
        assert right[i] == exp_r, (i, right[i], exp_r)
        assert left[i] == exp_l, (i, left[i], exp_l)


def test_region_bounds_match_integer_arithmetic():
    for count in [50, 127, 360, 1800]:
        sp, ep = features.region_bounds(jnp.int32(count), REG.curvature_region,
                                        REG.n_feature_regions)
        C, nreg, e = REG.curvature_region, REG.n_feature_regions, count - 1
        for j in range(nreg):
            assert int(sp[j]) == (C * (nreg - j) + (e - C) * j) // nreg
            assert int(ep[j]) == (C * (nreg - 1 - j) + (e - C) * (j + 1)) // nreg - 1


def test_greedy_picks_overlap_reference():
    grid, _ = _grids()
    labels, in_region = jax.vmap(
        lambda x, c: features._ring_labels(x, c, REG))(grid.xyz, grid.count)
    labels = np.asarray(labels)
    counts = np.asarray(grid.count)

    tot_ref = {2: 0, 1: 0, -1: 0}
    tot_both = {2: 0, 1: 0, -1: 0}
    tot_ours = {2: 0, 1: 0, -1: 0}
    for r in range(VLP16.n_rings):
        n = counts[r]
        pts = np.asarray(grid.xyz[r, :n])
        ref_labels, _, _ = _np_ring_reference(list(pts))
        for lab in (2, 1, -1):
            if lab == 1:
                ref_set = set(np.flatnonzero(ref_labels >= 1))
                our_set = set(np.flatnonzero(labels[r, :n] >= 1))
            else:
                ref_set = set(np.flatnonzero(ref_labels == lab))
                our_set = set(np.flatnonzero(labels[r, :n] == lab))
            tot_ref[lab] += len(ref_set)
            tot_ours[lab] += len(our_set)
            tot_both[lab] += len(ref_set & our_set)

    for lab in (2, 1, -1):
        assert tot_ref[lab] > 20, f"degenerate fixture for label {lab}"
        jac = tot_both[lab] / max(len_union := (tot_ref[lab] + tot_ours[lab]
                                                - tot_both[lab]), 1)
        assert jac >= 0.85, (lab, jac, tot_ref[lab], tot_ours[lab], tot_both[lab])


def test_extract_features_end_to_end_shapes():
    grid, _ = _grids()
    feats = jax.jit(
        lambda g: features.extract_features(g, REG, CAPS))(grid)
    n_sharp = int(np.asarray(feats.sharp.mask).sum())
    n_less_sharp = int(np.asarray(feats.less_sharp.mask).sum())
    n_flat = int(np.asarray(feats.flat.mask).sum())
    n_less_flat = int(np.asarray(feats.less_flat.mask).sum())
    # sharp picks are a subset of less-sharp picks
    assert 0 < n_sharp <= n_less_sharp
    assert n_flat > 0 and n_less_flat > 0
    # voxel thinning reduced the neutral/flat pool
    assert n_less_flat < int(np.asarray(grid.mask).sum())
    # every sharp point also appears in less_sharp
    sharp_xyz = np.asarray(feats.sharp.xyz)[np.asarray(feats.sharp.mask)]
    ls_xyz = np.asarray(feats.less_sharp.xyz)[np.asarray(feats.less_sharp.mask)]
    for q in sharp_xyz[:10]:
        assert np.min(np.linalg.norm(ls_xyz - q, axis=1)) < 1e-6
