"""Core pytree types for fixed-shape point data.

The reference passes dynamically-sized ``pcl::PointCloud`` objects between
stages and encodes ``ring + relTime`` into the intensity channel
(reference MultiScanRegistration.cpp:228-229, decoded again in
BasicLaserOdometry.cpp:42 and :259-297). On TPU every boundary is a
fixed-capacity padded array, so we keep the three channels separate and
explicit instead of packing them into one float.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class PointSet(NamedTuple):
    """A padded set of feature points.

    xyz:  (N, 3) float32 — coordinates in LOAM's camera-style frame
          (x=left, y=up, z=forward).
    rel:  (N,)  float32 — sweep-relative time fraction in [0, 1]
          (relTime / scanPeriod; the fractional part of the reference's
          intensity channel).
    ring: (N,)  int32 — scan ring id (the integer part of intensity).
    mask: (N,)  bool — True for real points, False for padding.
    """

    xyz: Array
    rel: Array
    ring: Array
    mask: Array

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def count(self) -> Array:
        return jnp.sum(self.mask, axis=-1).astype(jnp.int32)

    @staticmethod
    def empty(capacity: int) -> "PointSet":
        return PointSet(
            xyz=jnp.zeros((capacity, 3), jnp.float32),
            rel=jnp.zeros((capacity,), jnp.float32),
            ring=jnp.zeros((capacity,), jnp.int32),
            mask=jnp.zeros((capacity,), bool),
        )


class RingGrid(NamedTuple):
    """A sweep laid out as per-ring rows, azimuth-ordered within a row.

    Equivalent of the reference's ``_laserCloudScans`` ring buckets plus
    ``_scanIndices`` ranges (BasicScanRegistration.cpp:34-42), with fixed
    row capacity P and front-packed rows.

    xyz:   (R, P, 3) float32
    rel:   (R, P)    float32 sweep-relative time fraction
    mask:  (R, P)    bool
    count: (R,)      int32 — valid points per ring (mask is front-packed)
    dropped: ()      int32 — valid raw points lost to the fixed row
             capacity P (the reference's push_back never drops,
             MultiScanRegistration.cpp:233; this surfaces the TPU
             fixed-shape truncation instead of hiding it).
    """

    xyz: Array
    rel: Array
    mask: Array
    count: Array
    dropped: Array = None

    @property
    def n_rings(self) -> int:
        return self.xyz.shape[0]

    @property
    def row_capacity(self) -> int:
        return self.xyz.shape[1]


def concat_point_sets(sets: list[PointSet]) -> PointSet:
    return PointSet(
        xyz=jnp.concatenate([s.xyz for s in sets], axis=0),
        rel=jnp.concatenate([s.rel for s in sets], axis=0),
        ring=jnp.concatenate([s.ring for s in sets], axis=0),
        mask=jnp.concatenate([s.mask for s in sets], axis=0),
    )
