"""Fused odometry correspondence kernel vs the masked brute-force path
(interpret mode on CPU; the real Mosaic path runs in the TPU bench).

The brute-force functions in ops/neighbors.py are the semantic oracle
(they themselves are transliteration-tested against the reference's
KD-tree + ring-walk logic, BasicLaserOdometry.cpp:246-441); the kernel
must reproduce their matches exactly, including tie-breaks, empty-mask
rows and gate behavior.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from loam_velodyne_tpu.ops.neighbors import (
    CornerMatch,
    SurfMatch,
    corner_correspondences,
    corner_correspondences_fused,
    surf_correspondences,
    surf_correspondences_fused,
)
from loam_velodyne_tpu.types import PointSet


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _cloud(rng, m, n_rings=16, frac_valid=0.8, scale=5.0):
    xyz = rng.normal(size=(m, 3)).astype(np.float32) * scale
    ring = rng.integers(0, n_rings, size=m).astype(np.int32)
    mask = rng.random(m) < frac_valid
    xyz[~mask] = 0.0
    return PointSet(xyz=jnp.asarray(xyz), rel=jnp.zeros(m, jnp.float32),
                    ring=jnp.asarray(ring), mask=jnp.asarray(mask))


def _queries(rng, q, frac_valid=0.9, scale=5.0):
    xyz = rng.normal(size=(q, 3)).astype(np.float32) * scale
    mask = rng.random(q) < frac_valid
    return jnp.asarray(xyz), jnp.asarray(mask)


def _assert_corner_equal(a: CornerMatch, b: CornerMatch):
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    v = np.asarray(a.valid)
    np.testing.assert_array_equal(np.asarray(a.j)[v], np.asarray(b.j)[v])
    np.testing.assert_array_equal(np.asarray(a.l)[v], np.asarray(b.l)[v])


def _assert_surf_equal(a: SurfMatch, b: SurfMatch):
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    v = np.asarray(a.valid)
    for f in ("j", "l", "m"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f))[v],
                                      np.asarray(getattr(b, f))[v])


def test_corner_matches_bruteforce(rng):
    q_xyz, q_mask = _queries(rng, 256)
    last = _cloud(rng, 1920)
    ref = corner_correspondences(q_xyz, q_mask, last)
    got = corner_correspondences_fused(q_xyz, q_mask, last, interpret=True)
    _assert_corner_equal(got, ref)


def test_surf_matches_bruteforce(rng):
    q_xyz, q_mask = _queries(rng, 384)
    last = _cloud(rng, 2048)
    ref = surf_correspondences(q_xyz, q_mask, last)
    got = surf_correspondences_fused(q_xyz, q_mask, last, interpret=True)
    _assert_surf_equal(got, ref)


def test_dense_cloud_exact_indices(rng):
    """On a dense cloud where every query finds a valid tripod, indices
    must agree exactly (not just on valid rows)."""
    q_xyz, q_mask = _queries(rng, 128, frac_valid=1.0, scale=1.0)
    last = _cloud(rng, 1024, n_rings=4, frac_valid=1.0, scale=1.0)
    ref = surf_correspondences(q_xyz, q_mask, last)
    got = surf_correspondences_fused(q_xyz, q_mask, last, interpret=True)
    assert np.asarray(ref.valid).any()
    _assert_surf_equal(got, ref)
    np.testing.assert_array_equal(np.asarray(got.j), np.asarray(ref.j))


def test_empty_mask_rows_are_invalid(rng):
    q_xyz, q_mask = _queries(rng, 128)
    last = _cloud(rng, 512, frac_valid=0.0)
    got = corner_correspondences_fused(q_xyz, q_mask, last, interpret=True)
    assert not np.asarray(got.valid).any()
    np.testing.assert_array_equal(np.asarray(got.j), 0)
    np.testing.assert_array_equal(np.asarray(got.l), 0)


def test_gate_rejects_far_neighbors(rng):
    """Queries farther than the 25 m^2 gate from every candidate must
    come back invalid on both paths."""
    q_xyz = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32) + 100.0)
    q_mask = jnp.ones(128, bool)
    last = _cloud(rng, 512, frac_valid=1.0)
    ref = corner_correspondences(q_xyz, q_mask, last)
    got = corner_correspondences_fused(q_xyz, q_mask, last, interpret=True)
    assert not np.asarray(got.valid).any()
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
