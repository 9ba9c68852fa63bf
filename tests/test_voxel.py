"""Voxel downsample tests (PCL VoxelGrid semantics: one centroid per
occupied cell)."""

import numpy as np
import jax
import jax.numpy as jnp

from loam_velodyne_tpu.ops.voxel import voxel_downsample
from loam_velodyne_tpu.types import PointSet


def _ps(xyz, ring=None):
    n = len(xyz)
    cap = 64
    full = np.zeros((cap, 3), np.float32)
    full[:n] = xyz
    mask = np.zeros(cap, bool)
    mask[:n] = True
    rel = np.linspace(0, 1, cap).astype(np.float32)
    rings = np.zeros(cap, np.int32)
    if ring is not None:
        rings[:n] = ring
    return PointSet(jnp.asarray(full), jnp.asarray(rel), jnp.asarray(rings),
                    jnp.asarray(mask))


def test_centroids_per_cell():
    xyz = np.array([
        [0.01, 0.01, 0.01], [0.05, 0.05, 0.05],   # same 0.1-cell
        [0.35, 0.0, 0.0],                          # own cell
        [1.0, 1.0, 1.0],                           # own cell
    ], np.float32)
    out = jax.jit(lambda p: voxel_downsample(p, 0.1, 16))(_ps(xyz))
    m = np.asarray(out.mask)
    assert m.sum() == 3
    got = np.asarray(out.xyz)[m]
    exp = np.array([[0.03, 0.03, 0.03], [0.35, 0.0, 0.0], [1.0, 1.0, 1.0]])
    # order-independent compare
    for e in exp:
        assert np.min(np.linalg.norm(got - e, axis=1)) < 1e-6


def test_per_ring_keeps_cells_separate():
    xyz = np.array([[0.01, 0.0, 0.0], [0.02, 0.0, 0.0]], np.float32)
    merged = voxel_downsample(_ps(xyz, ring=[0, 0]), 0.1, 16, per_ring=True)
    split = voxel_downsample(_ps(xyz, ring=[0, 1]), 0.1, 16, per_ring=True)
    assert int(np.asarray(merged.mask).sum()) == 1
    assert int(np.asarray(split.mask).sum()) == 2


def test_empty_input():
    ps = PointSet.empty(32)
    out = voxel_downsample(ps, 0.2, 8)
    assert not np.asarray(out.mask).any()


def test_capacity_truncation():
    xyz = np.arange(60, dtype=np.float32)[:, None] * np.array([1.0, 0, 0], np.float32)
    out = voxel_downsample(_ps(xyz), 0.1, 8)
    assert int(np.asarray(out.mask).sum()) == 8


def test_capacity_overflow_spreads_evenly():
    # 60 distinct cells along x into capacity 8: the survivors must span
    # the whole extent (even thinning), not just the low-x prefix.
    xyz = np.arange(60, dtype=np.float32)[:, None] * np.array([1.0, 0, 0], np.float32)
    out, dropped = voxel_downsample(_ps(xyz), 0.1, 8, return_dropped=True)
    m = np.asarray(out.mask)
    assert int(m.sum()) == 8
    assert int(np.asarray(dropped)) == 52
    kept_x = np.sort(np.asarray(out.xyz)[m, 0])
    assert kept_x[0] < 10.0 and kept_x[-1] > 50.0       # covers both ends
    gaps = np.diff(kept_x)
    assert gaps.max() <= 2.5 * gaps.min()               # roughly even
