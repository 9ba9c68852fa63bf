"""Voxel-grid downsampling on device (PCL VoxelGrid equivalent).

The reference leans on pcl::VoxelGrid (hash-map based, host) in three
places: less-flat feature thinning (BasicScanRegistration.cpp:245-252)
and corner/surf map-stack thinning (BasicLaserMapping.cpp:518-527,
580-593). On TPU there is no hash map; the same centroid-per-cell
reduction is computed with fixed shapes via lexicographic sort +
segment-sum: quantize to cells, sort points so cell-mates are adjacent,
detect segment starts, segment-sum coordinates, and compact one
centroid per cell to the front of a fixed-capacity output.

Deterministic and order-independent (up to float summation order),
which is all downstream consumers need — the accuracy gate is
trajectory error, not point-set equality.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from loam_velodyne_tpu.types import PointSet

Array = jax.Array


def compact_pointset(ps: PointSet, keep: Array, capacity: int) -> PointSet:
    """Front-pack a PointSet's kept rows into a fixed capacity with ONE
    stable payload-carrying sort on the keep flag (kept rows first, in
    order), then slice. A scatter-based pack costs one row-by-row
    scatter pass; the sort network batch-scales far better on TPU
    (profiled ~3x cheaper under vmap)."""
    n = keep.shape[0]
    drop_key = (~keep).astype(jnp.int32)
    _, x_s, y_s, z_s, rel_s, ring_s = jax.lax.sort(
        (drop_key, ps.xyz[:, 0], ps.xyz[:, 1], ps.xyz[:, 2], ps.rel,
         ps.ring.astype(jnp.float32)), num_keys=1, is_stable=True)
    if capacity > n:                       # output wider than the input
        pad = (0, capacity - n)
        x_s, y_s, z_s, rel_s, ring_s = (
            jnp.pad(a, pad) for a in (x_s, y_s, z_s, rel_s, ring_s))
    count = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), capacity)
    mask = jnp.arange(capacity) < count
    xyz = jnp.stack([x_s[:capacity], y_s[:capacity], z_s[:capacity]],
                    axis=1)
    return PointSet(xyz=jnp.where(mask[:, None], xyz, 0.0),
                    rel=jnp.where(mask, rel_s[:capacity], 0.0),
                    ring=jnp.where(mask, ring_s[:capacity].astype(jnp.int32),
                                   0),
                    mask=mask)


def voxel_downsample(ps: PointSet, leaf: float, capacity: int,
                     per_ring: bool = False, return_dropped: bool = False):
    """Centroid-per-voxel downsample of a padded point set.

    per_ring=True reproduces the reference's per-scanline filtering
    (each ring is voxelized independently; the same cell occupied from
    two rings yields two output points), by including the ring id in the
    cell identity.

    return_dropped=True additionally returns the () int32 number of
    occupied voxel cells that did not fit the output capacity
    (overflow telemetry; PCL's VoxelGrid never drops).
    """
    xyz, mask = ps.xyz, ps.mask
    n = xyz.shape[0]
    inv = jnp.float32(1.0 / leaf)

    # Cell coordinates relative to the valid-point minimum corner
    # (mirrors PCL's min-corner-based binning; keeps indices small).
    big = jnp.float32(1e9)
    mins = jnp.min(jnp.where(mask[:, None], xyz, big), axis=0)
    cell = jnp.floor((xyz - mins) * inv).astype(jnp.int32)
    cell = jnp.where(mask[:, None], cell, -1)

    ring_key = jnp.where(mask, ps.ring, -1) if per_ring else jnp.zeros_like(ps.ring)

    # Lexicographic sort with two packed keys instead of five separate
    # ones (each lexsort key is its own bitonic pass on TPU). Cells are
    # clipped into 12-bit per-axis ranges relative to the min corner —
    # beyond 4095 cells (819 m extent at the 0.2 m leaf, 1.6 km at 0.4)
    # points would merge, far outside any lidar's reach. (10-bit packing
    # previously merged real 150-400 m returns on the whole-window map
    # insert path.) The point payload rides the sort as extra operands:
    # argsort-then-gather issued six random row-gathers here, and
    # row-gathers (not the sort network) were the dominant cost of this
    # function on TPU (PERF.md §1).
    cy = jnp.clip(cell[:, 1], -1, 4095)
    cz = jnp.clip(cell[:, 2], -1, 4095)
    cx = jnp.clip(cell[:, 0], -1, 4095)
    key_lo = (cy + 1) * 4097 + (cz + 1)
    # key_hi: invalid flag (bit 25) | ring+1 (<= 65, HDL-64E) << 13 |
    # cx+1 (12 bits) — max valid value ~5.4e5 < 2^25, no collisions.
    key_hi = ((~mask).astype(jnp.int32) * (1 << 25)
              + (ring_key + 1) * (1 << 13) + (cx + 1))
    kh, kl, x_s, y_s, z_s, rel_s, ring_f_s = jax.lax.sort(
        (key_hi, key_lo, xyz[:, 0], xyz[:, 1], xyz[:, 2], ps.rel,
         ps.ring.astype(jnp.float32)), num_keys=2, is_stable=True)
    mask_s = kh < (1 << 25)
    xyz_s = jnp.stack([x_s, y_s, z_s], axis=1)
    real_ring_s = ring_f_s.astype(jnp.int32)

    # The packed keys determine cell identity exactly (within the
    # clipped range), so segment boundaries come straight from them.
    prev_differs = (kh[1:] != kh[:-1]) | (kl[1:] != kl[:-1])
    seg_start = jnp.concatenate([jnp.ones((1,), bool), prev_differs]) & mask_s
    seg_id = jnp.cumsum(seg_start.astype(jnp.int32)) - 1
    seg_id = jnp.where(mask_s, seg_id, n - 1)  # shunt padding to last segment

    # One wide segment-sum for [xyz, rel, count] instead of three
    # scatters (each segment_sum is its own scatter pass on TPU).
    payload = jnp.concatenate(
        [xyz_s, rel_s[:, None], jnp.ones((n, 1), jnp.float32)], axis=1)
    payload = jnp.where(mask_s[:, None], payload, 0.0)
    sums = jax.ops.segment_sum(payload, seg_id, num_segments=n)
    cnt = sums[:, 4]
    denom = jnp.maximum(cnt, 1.0)
    centroid = sums[:, :3] / denom[:, None]
    rel_mean = sums[:, 3] / denom

    # Work on the SEGMENT TABLE from here (row s = segment s): the
    # former per-point form gathered centroid[seg_id]/rel_mean[seg_id]
    # back to point rows only to mask all but the first row of each
    # segment — two O(N) row-gathers for nothing. The segment's ring id
    # comes from a segment_min (uniform within a segment when
    # per_ring=True, which is the only consumer of the ring output).
    ring_table = jax.ops.segment_min(
        jnp.where(mask_s, real_ring_s, 1 << 30), seg_id, num_segments=n)
    n_cells = jnp.sum(seg_start.astype(jnp.int32))
    s_ord = jnp.arange(n, dtype=jnp.int32)
    in_range = s_ord < n_cells

    # Overflow policy: when occupied cells exceed the output capacity,
    # keep EVENLY SPACED cells across the (ring, cx, cy, cz) sort order
    # instead of truncating its tail — prefix truncation would silently
    # drop entire upper rings / far-x slabs (seen on HDL-64E before the
    # pool rescale), while even thinning degrades like a coarser leaf.
    # (The reference's PCL VoxelGrid never drops; this only fires at
    # capacity, and the dropped count is reported as telemetry.)
    over = n_cells > capacity
    ratio = jnp.float32(capacity) / jnp.maximum(n_cells, 1).astype(jnp.float32)
    b_here = jnp.floor(s_ord.astype(jnp.float32) * ratio)
    b_prev = jnp.floor((s_ord - 1).astype(jnp.float32) * ratio)
    keep = in_range & jnp.where(over, b_here != b_prev, True)

    vals = PointSet(xyz=centroid, rel=rel_mean,
                    ring=jnp.where(in_range, ring_table, 0), mask=keep)
    out = compact_pointset(vals, keep, capacity)
    if return_dropped:
        return out, jnp.maximum(n_cells - capacity, 0)
    return out
