"""Sweep ingest: raw lidar points → per-ring grid, on device.

TPU-native equivalent of the reference ingest loop
(MultiScanRegistration.cpp:158-234), which walks ~30k points serially on
the host doing axis swap, NaN/zero filtering, vertical-angle ring
binning, horizontal-angle unwrap ("halfPassed") and relative-time
computation, then buckets points into per-ring vectors. Here the whole
pass is a fixed-shape vectorized program: the sequential halfPassed
state becomes a cumulative-or, and the ring bucketing becomes one stable
sort by ring id (stable keeps azimuth order within a ring, matching the
reference's push_back order).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from loam_velodyne_tpu.config import LidarConfig, RegistrationConfig
from loam_velodyne_tpu.types import PointSet, RingGrid


def _use_pallas_grid() -> bool:
    import os
    if os.environ.get("LOAM_DISABLE_PALLAS_GRID"):      # A/B escape hatch
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False

Array = jax.Array


class RawSweep(NamedTuple):
    """Host-delivered raw sweep in the sensor frame (x fwd, y left, z up).

    xyz:  (N, 3) float32, front-packed valid points
    mask: (N,)  bool
    """

    xyz: Array
    mask: Array


def swap_axes(xyz: Array) -> Array:
    """Sensor frame → LOAM camera-style frame.

    (x, y, z) := (y_in, z_in, x_in)  [reference MultiScanRegistration.cpp:182-184]
    """
    return jnp.stack([xyz[..., 1], xyz[..., 2], xyz[..., 0]], axis=-1)


def ring_for_angle(angle_rad: Array, lidar: LidarConfig) -> Array:
    """Vertical angle → ring id (reference MultiScanRegistration.cpp:64-66)."""
    deg = angle_rad * jnp.float32(180.0 / math.pi)
    return jnp.round((deg - lidar.lower_bound_deg) * lidar.factor).astype(jnp.int32)


def _sweep_orientations(swapped: Array, mask: Array) -> Tuple[Array, Array]:
    """Start/end horizontal orientation from the first/last valid point.

    Reference MultiScanRegistration.cpp:161-172 (computed there on raw
    coordinates; -atan2(y_raw, x_raw) == -atan2(x_swapped, z_swapped)).
    """
    n = jnp.maximum(jnp.sum(mask), 1)
    first = swapped[0]
    last = swapped[n - 1]
    start_ori = -jnp.arctan2(first[0], first[2])
    end_ori = -jnp.arctan2(last[0], last[2]) + jnp.float32(2 * math.pi)
    span = end_ori - start_ori
    end_ori = jnp.where(span > 3 * math.pi, end_ori - jnp.float32(2 * math.pi),
                        jnp.where(span < math.pi, end_ori + jnp.float32(2 * math.pi),
                                  end_ori))
    return start_ori, end_ori


def relative_times(swapped: Array, mask: Array,
                   crossing_mask: Array | None = None) -> Array:
    """Per-point sweep-relative time fraction in [0, 1].

    Vectorized form of the halfPassed unwrap
    (MultiScanRegistration.cpp:205-229): the sequential boolean flip
    becomes a cumulative-or over the azimuth-ordered stream, and the two
    per-branch re-windowing rules are applied as masked selects. Returns
    the fraction relTime/scanPeriod; multiply by scan_period for seconds.

    crossing_mask: which points may flip the halfPassed flag. The
    reference skips NaN / near-zero-range / out-of-ring points BEFORE
    the halfPassed walk (MultiScanRegistration.cpp:186-215), so callers
    should pass the full validity mask here — a single zeroed NaN point
    (ori = -atan2(0,0) = 0) must not flip the flag prematurely. The
    start/end orientations still come from the raw first/last points
    (``mask``), as in the reference (:161-172).
    """
    if crossing_mask is None:
        crossing_mask = mask
    start_ori, end_ori = _sweep_orientations(swapped, mask)
    two_pi = jnp.float32(2 * math.pi)
    half_pi = jnp.float32(math.pi / 2)
    pi = jnp.float32(math.pi)

    ori = -jnp.arctan2(swapped[:, 0], swapped[:, 2])

    # Pre-half branch: window ori into [startOri - pi/2, startOri + 3pi/2).
    ori_pre = jnp.where(ori < start_ori - half_pi, ori + two_pi,
                        jnp.where(ori > start_ori + 3 * half_pi, ori - two_pi, ori))
    # halfPassed flips permanently once a (valid) point exceeds startOri + pi;
    # the flipping point itself is still processed with the pre branch, so the
    # flag for point i is an EXCLUSIVE cumulative-or over points < i —
    # equivalently "i is past the FIRST crossing", which is one argmax
    # reduction instead of an N-long prefix scan (whose reduce-window
    # lowering is disproportionately slow on TPU, PERF.md §9).
    crossed = (ori_pre - start_ori > pi) & crossing_mask
    first_cross = jnp.argmax(crossed)            # first True (0 if none)
    n_pts = crossed.shape[0]
    half_passed = jnp.any(crossed) & (jnp.arange(n_pts) > first_cross)

    # Post-half branch: window ori + 2pi into [endOri - 3pi/2, endOri + pi/2).
    ori_post = ori + two_pi
    ori_post = jnp.where(ori_post < end_ori - 3 * half_pi, ori_post + two_pi,
                         jnp.where(ori_post > end_ori + half_pi, ori_post - two_pi,
                                   ori_post))

    ori_final = jnp.where(half_passed, ori_post, ori_pre)
    return (ori_final - start_ori) / (end_ori - start_ori)


def ingest_sweep(raw: RawSweep, lidar: LidarConfig,
                 reg: RegistrationConfig,
                 imu_window=None) -> Tuple[RingGrid, PointSet]:
    """Full device-side ingest: filter, bin, time, bucket.

    Returns the per-ring grid for feature extraction plus the flat
    full-resolution cloud in ring-major azimuth order (the ordering of
    the reference's concatenated ``_laserCloud``,
    BasicScanRegistration.cpp:34-42).
    """
    n, r_rings = raw.xyz.shape[0], lidar.n_rings
    p_cap = lidar.max_points_per_ring

    swapped = swap_axes(raw.xyz)
    finite = jnp.all(jnp.isfinite(swapped), axis=-1)
    swapped = jnp.where(finite[:, None], swapped, 0.0)
    sq_range = jnp.sum(swapped * swapped, axis=-1)

    vert = jnp.arctan2(swapped[:, 1],
                       jnp.sqrt(swapped[:, 0] ** 2 + swapped[:, 2] ** 2))
    ring = ring_for_angle(vert, lidar)

    valid = (raw.mask & finite
             & (sq_range >= reg.min_sq_range)
             & (ring >= 0) & (ring < r_rings))

    rel = relative_times(swapped, raw.mask, crossing_mask=valid)
    rel = jnp.clip(rel, 0.0, 2.0)  # guard degenerate sweeps; nominal range [0,1]

    if imu_window is not None:
        # IMU deskew to the sweep-start frame before bucketing
        # (reference projectPointToStartOfSweep during ingest,
        # MultiScanRegistration.cpp:231).
        from loam_velodyne_tpu.ops.imu import project_to_sweep_start
        swapped = project_to_sweep_start(swapped, rel * reg.scan_period,
                                         imu_window)

    # Bucket by ring with ONE stable payload-carrying sort: the
    # reference's push_back order is (ring, arrival), which IS the
    # stable sort of the sweep by ring id. The point payload rides the
    # sort as extra lax.sort operands — no argsort row-gathers, and no
    # wide (N, R+1) one-hot cumsum (a long-axis multi-column cumsum
    # lowers to a reduce-window that scales pathologically under vmap:
    # it was the single largest kernel of the batched-replay program).
    ring_key = jnp.where(valid, ring, r_rings)
    ring_s, x_s, y_s, z_s, rel_s = jax.lax.sort(
        (ring_key, swapped[:, 0], swapped[:, 1], swapped[:, 2], rel),
        num_keys=1, is_stable=True)
    # Validity needs no payload column: invalid points carry key
    # r_rings, so post-sort validity is just ring_s < r_rings (one
    # fewer operand through the N-row sort — 17% of its payload width
    # on a 64-ring sweep).
    valid_s = ring_s < r_rings
    # Histogram as a dense one-hot reduce: a scatter-add into ~17 bins
    # serializes row-by-row on TPU (profiled ~9 ms per batched dispatch
    # for this line alone); the (N, R+1) compare+sum is trivial VPU work.
    counts = jnp.sum((ring_key[:, None] ==
                      jnp.arange(r_rings + 1, dtype=jnp.int32)[None, :])
                     .astype(jnp.int32), axis=0)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts[:-1]).astype(jnp.int32)])
    # Within-ring rank WITHOUT `starts[ring_s]`: that (N,)-row gather
    # from the 65-entry table serializes row-by-row on TPU and profiled
    # at 1.2 ms/sweep on HDL-64E — the single most expensive ingest op.
    # The sorted keys are segment-contiguous, so each row's segment
    # start propagates with one cummax (same trick as the cube-scatter
    # rank, models/mapping.py::scatter_into_cubes).
    i = jnp.arange(n, dtype=jnp.int32)
    seg_start = jnp.concatenate([jnp.ones((1,), bool),
                                 ring_s[1:] != ring_s[:-1]])
    rank_s = i - jax.lax.cummax(jnp.where(seg_start, i, 0))
    keep_s = valid_s & (rank_s < p_cap)

    # The (R, P) ring grid: ring r's points occupy sorted rows
    # starts[r]..starts[r]+count, so the grid is R contiguous
    # dynamic_slice windows of the sorted cloud — vmapped into ONE
    # gather-of-blocks kernel (the same shape tiled_windowed_knn uses
    # for its group windows), not R separate slice ops (per-op dispatch
    # overhead sank 64-ring ingest: HDL-64E 68.8 -> 52.7 sweeps/s with
    # an unrolled slice loop) and not a (N,)-row rank scatter (the
    # round-2 fallback for wide sensors). The cloud is padded by one
    # window so a slice starting at the last ring's offset never clamps
    # (XLA clamps out-of-range starts, which would misalign rows).
    xyz_s = jnp.stack([x_s, y_s, z_s], axis=1)
    grid_count = jnp.minimum(counts[:r_rings], p_cap)
    grid_mask = (jnp.arange(p_cap, dtype=jnp.int32)[None, :]
                 < grid_count[:, None])
    # Component-planar window gather: slicing a (N, 4) payload in
    # (P, 4) blocks puts the 4-wide payload on the LANE axis (4 of 128
    # lanes busy — profiled 1.4 ms/sweep on HDL-64E); four 1D column
    # slices keep P on the lanes and run at full VPU width. On TPU the
    # windows move as R bulk DMAs through ops/pallas_grid.py (XLA's
    # gather lowering of the vmapped dynamic_slice runs at element
    # granularity — 3.1 ms/sweep on HDL-64E for 2.4 MB of copies).
    pad1 = jnp.zeros((p_cap,), jnp.float32)
    starts_r = starts[:r_rings]

    if _use_pallas_grid() and p_cap % 128 == 0:
        from loam_velodyne_tpu.ops.pallas_grid import grid_windows
        # Pad so every aligned-slice window (start rounded down to the
        # lane tile, width P+128) stays in bounds, and to a lane-tiled
        # total width.
        pad_w = ((n + p_cap + 128 + 127) // 128) * 128 - n
        padk = jnp.zeros((pad_w,), jnp.float32)
        cols = jnp.stack([jnp.concatenate([a, padk])
                          for a in (x_s, y_s, z_s, rel_s)])    # (4, Npad)
        g = grid_windows(cols, starts_r, p_cap)                # (R, 4, P)
        gx, gy, gz, grid_rel = (g[:, c, :] for c in range(4))
    else:
        def windows(col):
            padded = jnp.concatenate([col, pad1])
            return jax.vmap(
                lambda s: jax.lax.dynamic_slice(padded, (s,), (p_cap,))
            )(starts_r)                                          # (R, P)

        gx, gy, gz, grid_rel = (windows(a) for a in (x_s, y_s, z_s, rel_s))
    grid_xyz = jnp.where(grid_mask[..., None],
                         jnp.stack([gx, gy, gz], axis=-1), 0.0)
    grid_rel = jnp.where(grid_mask, grid_rel, 0.0)

    # The sorted rows ARE the flat ring-major full-resolution cloud
    # (the reference's concatenated _laserCloud layout) — no second
    # scatter needed. Masked rows are zeroed for consumers.
    full_xyz = jnp.where(keep_s[:, None], xyz_s, 0.0)
    full_rel = jnp.where(keep_s, rel_s, 0.0)
    full_ring = jnp.where(keep_s, ring_s, 0)
    full_mask = keep_s

    grid = RingGrid(xyz=grid_xyz, rel=grid_rel, mask=grid_mask,
                    count=grid_count,
                    dropped=jnp.sum((valid_s & ~keep_s).astype(jnp.int32)))
    full = PointSet(xyz=full_xyz, rel=full_rel, ring=full_ring,
                    mask=full_mask)
    return grid, full
