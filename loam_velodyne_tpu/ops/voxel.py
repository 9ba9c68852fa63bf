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
    #
    # The segment table is ALREADY front-packed (segments are numbered
    # in sorted order), so output row k is simply segment
    # ceil(k * n_cells / capacity) when over (k when not) — the same
    # kept set as the former "floor(s*ratio) advanced" flag, fetched by
    # one capacity-row gather instead of re-sorting the full table by a
    # keep flag (that compaction sort was a full-width 6-operand bitonic
    # pass, ~the cost of the cell sort itself; the gather touches
    # capacity rows only).
    del s_ord
    # src_k = ceil(k * S / C), S = max(n_cells, capacity) (identity
    # mapping when under capacity). k*S can exceed 32 bits (the
    # surround map feeds ~422k rows at capacity 65536), so split
    # exactly: k*S = k*(S//C)*C + k*(S%C), each term uint32-safe for
    # C <= 65536 (k < C and S%C < C give k*(S%C) <= (C-1)^2 < 2^32).
    if capacity > 65536:
        raise ValueError("voxel_downsample: capacity > 65536 would "
                         "overflow the even-thin index arithmetic")
    k_ord = jnp.arange(capacity, dtype=jnp.uint32)
    stride_n = jnp.maximum(n_cells, capacity).astype(jnp.uint32)
    cap_u = jnp.uint32(capacity)
    q, r = stride_n // cap_u, stride_n % cap_u
    src = (k_ord * q + (k_ord * r + cap_u - 1) // cap_u).astype(jnp.int32)
    out_mask = jnp.arange(capacity, dtype=jnp.int32) \
        < jnp.minimum(n_cells, capacity)
    src = jnp.minimum(src, n - 1)
    sums_k = sums[src]                     # (capacity, 5) — one gather;
    denom = jnp.maximum(sums_k[:, 4], 1.0)  # centroid division runs on
    centroid = sums_k[:, :3] / denom[:, None]  # capacity rows, not n
    rel_mean = sums_k[:, 3] / denom
    out = PointSet(
        xyz=jnp.where(out_mask[:, None], centroid, 0.0),
        rel=jnp.where(out_mask, rel_mean, 0.0),
        ring=jnp.where(out_mask, ring_table[src], 0),
        mask=out_mask)
    if return_dropped:
        return out, jnp.maximum(n_cells - capacity, 0)
    return out
