"""Scan-to-map refinement over a rolling cube world map.

TPU-native re-design of the reference BasicLaserMapping
(BasicLaserMapping.cpp:266-923). The reference keeps 21x11x21 pcl
clouds of 50 m cubes, physically swap-shifts the whole pointer grid to
recenter (:300-441), rebuilds two KD-trees per frame (:636-637), and
runs a <=10-iteration GN with per-point 5-NN line/plane fits.

Re-designs here:

- **Toroidal cube addressing**: cube for world cell w lives at storage
  index (w mod dims); recentering never moves data — it only advances
  the live-window origin and clears the storage cells that now alias
  newly-entered world cells. The reference's six while-loops become
  integer arithmetic plus one masked clear.
- **Two-tier lossless storage**: each cube holds a fixed-capacity
  SEARCH slab (config corner/surf_cube_capacity); inserts land in
  headroom-padded working slabs, the per-cube voxel re-downsample
  (leaf 0.2/0.4) runs before any clipping, and post-thin tails spill
  into a global dedup'd archive pool (compact_archive) instead of
  being dropped — the reference's unbounded push_back clouds
  (BasicLaserMapping.cpp:536-577) lose nothing, and neither does this
  map; only the slabs feed the per-frame 5-NN search. Points beyond
  the +-2-cube neighborhood go through a bounded whole-window scatter
  (far path) so 150-400 m returns persist too.
- **Windowed 5-NN**: the map feature clouds assembled from FOV-valid
  cubes are sorted along the forward axis once per frame; every GN
  iteration does exact distance computation only inside per-query
  windows (ops/neighbors.windowed_knn). No trees, no pointer chasing.
- **Batched closed-form fits**: 3x3 eigen line fits and Ax=-1 plane
  fits run as analytic VPU math over all queries at once (ops/fit.py).
- The numeric spec is preserved: 5-NN gate 1 m^2, eigen ratio 3x,
  line half-length 0.1, plane residual gate 0.2, weights 1-0.9|d|
  (surf scaled by 1/sqrt(dist)), floor 0.1, min 50 residuals,
  degeneracy threshold 100, aborts at 0.05, IMU roll/pitch blend
  0.998/0.002.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from loam_velodyne_tpu.config import LoamConfig, MappingConfig
from loam_velodyne_tpu.ops import fit
from loam_velodyne_tpu.ops.neighbors import sort_cloud, tiled_windowed_knn
from loam_velodyne_tpu.ops.voxel import voxel_downsample
from loam_velodyne_tpu.types import PointSet
from loam_velodyne_tpu.utils import math as lm

Array = jax.Array


class MappingState(NamedTuple):
    corner_xyz: Array    # (NC, CAP_C, 3) map corners, world (map) frame
    corner_cnt: Array    # (NC,)
    surf_xyz: Array      # (NC, CAP_S, 3)
    surf_cnt: Array      # (NC,)
    origin: Array        # (3,) world cube coord of the live window start
    transform_tobe: Array  # (6,) pose being optimized
    transform_aft: Array   # (6,) last mapped pose
    transform_bef: Array   # (6,) odometry pose at last mapping update
    map_frame: Array       # () int32 processed-mapping-frame counter
    #   (drives the surround-map cadence, reference _mapFrameCount,
    #    BasicLaserMapping.cpp:54,242-264)
    # Archive pool (see MappingConfig.archive_capacity): post-thin slab
    # overflow, kept so the map stays lossless where the reference's
    # unbounded push_back clouds would. Rows are appended at
    # archive_cnt; archive_valid drops rows whose world cube left the
    # rolling window (an elementwise in-window test on the row's xyz —
    # equivalent to the reference's shift-loop clears, and gather-free
    # on the hot path); archive_kind is 0=corner / 1=surf (the two leaf
    # resolutions dedup separately during compaction).
    archive_xyz: Array     # (A, 3)
    archive_kind: Array    # (A,) int32 0=corner, 1=surf
    archive_valid: Array   # (A,)
    archive_cnt: Array     # () int32 append cursor
    # () int32 reinstatement cursor: where the next rolling/priority
    # reinstatement window starts (see step's priority cursor jump).
    archive_cursor: Array

    @staticmethod
    def create(cfg: LoamConfig) -> "MappingState":
        m = cfg.mapping
        nc = m.n_cubes
        a = m.archive_capacity
        return MappingState(
            corner_xyz=jnp.zeros((nc, m.corner_cube_capacity, 3), jnp.float32),
            corner_cnt=jnp.zeros((nc,), jnp.int32),
            surf_xyz=jnp.zeros((nc, m.surf_cube_capacity, 3), jnp.float32),
            surf_cnt=jnp.zeros((nc,), jnp.int32),
            origin=jnp.array([-m.center_width, -m.center_height,
                              -m.center_depth], jnp.int32),
            transform_tobe=lm.identity_pose(),
            transform_aft=lm.identity_pose(),
            transform_bef=lm.identity_pose(),
            map_frame=jnp.zeros((), jnp.int32),
            archive_xyz=jnp.zeros((a, 3), jnp.float32),
            archive_kind=jnp.zeros((a,), jnp.int32),
            archive_valid=jnp.zeros((a,), bool),
            archive_cnt=jnp.zeros((), jnp.int32),
            archive_cursor=jnp.zeros((), jnp.int32),
        )


class MapTelemetry(NamedTuple):
    """Per-frame overflow/shed counters (all () int32). The reference's
    push_back-based map never drops an IN-WINDOW point
    (BasicLaserMapping.cpp:536-577; points whose cube falls outside the
    21x11x21 window are discarded there too and are NOT counted here);
    every fixed-capacity boundary reports what it shed so capacity
    regressions are visible instead of silent."""

    stack_corner_dropped: Array   # corner stack voxel cells over capacity
    stack_surf_dropped: Array
    cube_corner_dropped: Array    # capacity-only losses: post-thin slab
    cube_surf_dropped: Array      #   clip + far-path budget/slab overflow
    active_cube_deficit: Array    # FOV-valid cubes beyond the active budget
    archive_reinstated: Array     # archive rows moved back into search slabs

    @staticmethod
    def zero() -> "MapTelemetry":
        z = jnp.zeros((), jnp.int32)
        return MapTelemetry(z, z, z, z, z, z)


class MappingOutputs(NamedTuple):
    transform_aft: Array   # (6,) refined pose (/aft_mapped_to_init)
    transform_bef: Array   # (6,) odometry pose this refinement used
    surround_due: Array    # () bool — surround-map publish frame
    telemetry: MapTelemetry


def _dims(m: MappingConfig) -> jnp.ndarray:
    return jnp.array([m.grid_width, m.grid_height, m.grid_depth], jnp.int32)


def world_cube_coord(pos: Array, m: MappingConfig) -> Array:
    """World position -> integer cube coordinate (floor((p+25)/50);
    the reference's int-cast-plus-negative-fixup IS floor,
    BasicLaserMapping.cpp:303-309)."""
    return jnp.floor((pos + m.cube_size / 2) / m.cube_size).astype(jnp.int32)


def storage_index(w: Array, m: MappingConfig) -> Array:
    """(..., 3) world cube coords -> linear toroidal storage index."""
    d = _dims(m)
    s = jnp.mod(w, d)   # python-style mod: always in [0, dims)
    return s[..., 0] + m.grid_width * s[..., 1] \
        + m.grid_width * m.grid_height * s[..., 2]


def recenter(origin: Array, sensor_w: Array, m: MappingConfig
             ) -> Tuple[Array, Array]:
    """Advance the live window so the sensor stays >= margin cubes from
    every edge; returns (new_origin, clear_mask (NC,)).

    Equivalent of the reference's six shift loops
    (BasicLaserMapping.cpp:311-441): final center index is the clamp of
    the current one into [margin, dims-1-margin], and the cleared cubes
    are exactly the storage cells whose world cell under the new window
    was outside the old window.
    """
    d = _dims(m)
    c = sensor_w - origin
    c_new = jnp.clip(c, m.recenter_margin, d - 1 - m.recenter_margin)
    new_origin = sensor_w - c_new

    # storage coordinate grids
    gi = jnp.arange(m.grid_width)
    gj = jnp.arange(m.grid_height)
    gk = jnp.arange(m.grid_depth)

    def entering(axis_idx, coords, dim):
        # world coord of each storage cell under the NEW window
        w = new_origin[axis_idx] + jnp.mod(coords - new_origin[axis_idx], dim)
        return (w < origin[axis_idx]) | (w >= origin[axis_idx] + dim)

    ei = entering(0, gi, m.grid_width)
    ej = entering(1, gj, m.grid_height)
    ek = entering(2, gk, m.grid_depth)
    clear3 = (ei[:, None, None] | ej[None, :, None] | ek[None, None, :])
    # storage linear index is i + W*j + W*H*k -> transpose to (k, j, i)
    clear = jnp.transpose(clear3, (2, 1, 0)).reshape(-1)
    return new_origin, clear


def fov_valid_cubes(origin: Array, tobe: Array, m: MappingConfig
                    ) -> Tuple[Array, Array, Array]:
    """The 5x5x5 neighborhood around the sensor cube: storage indices,
    in-bounds+FOV validity, and in-bounds ("surround") validity.

    FOV test per the reference (BasicLaserMapping.cpp:443-500): a cube
    is kept if any of its 8 corners lies inside a ~60 deg cone test
    against the sensor position and a point 10 m up the sensor y axis.
    """
    pos = tobe[lm.POS]
    sensor_w = world_cube_coord(pos, m)
    r = m.neighborhood
    off = jnp.stack(jnp.meshgrid(jnp.arange(-r, r + 1), jnp.arange(-r, r + 1),
                                 jnp.arange(-r, r + 1), indexing="ij"),
                    axis=-1).reshape(-1, 3)                      # (125, 3)
    w = sensor_w[None, :] + off
    c = w - origin[None, :]
    d = _dims(m)
    in_bounds = jnp.all((c >= 0) & (c < d[None, :]), axis=-1)

    centers = w.astype(jnp.float32) * m.cube_size                # (125, 3)
    y_axis_pt = lm.pose_transform_points(tobe, jnp.array([0.0, 10.0, 0.0],
                                                         jnp.float32))
    corner_off = jnp.stack(jnp.meshgrid(*([jnp.array([-1.0, 1.0])] * 3),
                                        indexing="ij"), -1).reshape(-1, 3)
    corners = centers[:, None, :] + (m.cube_size / 2) * corner_off[None, :, :]
    sq1 = jnp.sum((pos[None, None, :] - corners) ** 2, axis=-1)
    sq2 = jnp.sum((y_axis_pt[None, None, :] - corners) ** 2, axis=-1)
    term = 10.0 * jnp.sqrt(3.0) * jnp.sqrt(sq1)
    check1 = m.fov_half_aperture_term + sq1 - sq2 - term
    check2 = m.fov_half_aperture_term + sq1 - sq2 + term
    in_fov = jnp.any((check1 < 0) & (check2 > 0), axis=-1)

    sidx = storage_index(w, m)
    return sidx, in_bounds & in_fov, in_bounds


def assemble_map_cloud(cube_xyz: Array, cube_cnt: Array, sidx: Array,
                       valid: Array) -> Tuple[Array, Array]:
    """Concatenate the slabs of the selected cubes into one padded
    cloud. Works for any selection length (the hot path selects at most
    max_active_cubes of the 125 neighborhood)."""
    cap = cube_xyz.shape[1]
    xyz = cube_xyz[sidx]                       # (125, cap, 3)
    cnt = jnp.where(valid, cube_cnt[sidx], 0)  # (125,)
    mask = jnp.arange(cap)[None, :] < cnt[:, None]
    return xyz.reshape(-1, 3), mask.reshape(-1)


def scatter_into_cubes(cube_xyz: Array, cube_cnt: Array, pts: Array,
                       mask: Array, origin: Array, m: MappingConfig,
                       return_dropped: bool = False,
                       return_keep: bool = False):
    """Append map-frame points into their cubes anywhere in the live
    window (fixed capacity). Equivalent of the reference's per-point
    push_back scatter (BasicLaserMapping.cpp:536-577), with the same
    in-window bounds check (out-of-window points are discarded there
    too, :545-552 — they don't count as capacity losses).

    With return_dropped=True additionally returns the () int32 count of
    in-window points shed at slab capacity. With return_keep=True it
    instead returns two (N,) bool vectors IN INPUT ORDER — (accepted,
    in_window) — so callers with mixed insert sources (far points +
    archive reinstatement) can attribute acceptance per row: the input
    row index rides the rank sort as one extra operand and the accepted
    flags scatter straight back by it.
    """
    nc, cap, _ = cube_xyz.shape
    n = pts.shape[0]
    w = world_cube_coord(pts, m)
    c = w - origin[None, :]
    d = _dims(m)
    ok = mask & jnp.all((c >= 0) & (c < d[None, :]), axis=-1)
    sidx = jnp.where(ok, storage_index(w, m), nc)       # trash row nc

    # Rank of each point within its cube via ONE stable payload-carrying
    # sort by cube id (no argsort row-gathers, PERF.md §9): rank = row -
    # its segment's first row, with segment starts propagated by cummax.
    i = jnp.arange(n, dtype=jnp.int32)
    if return_keep:
        sidx_s, px, py, pz, oid = jax.lax.sort(
            (sidx, pts[:, 0], pts[:, 1], pts[:, 2], i), num_keys=1,
            is_stable=True)
    else:
        sidx_s, px, py, pz = jax.lax.sort(
            (sidx, pts[:, 0], pts[:, 1], pts[:, 2]), num_keys=1,
            is_stable=True)
    pts_s = jnp.stack([px, py, pz], axis=1)
    ok_s = sidx_s < nc
    seg_start = jnp.concatenate([jnp.ones((1,), bool),
                                 sidx_s[1:] != sidx_s[:-1]])
    rank = i - jax.lax.cummax(jnp.where(seg_start, i, 0))
    slot = cube_cnt[jnp.clip(sidx_s, 0, nc - 1)] + rank
    keep = ok_s & (slot < cap)
    # Out-of-range flat indices (rejected points) are dropped by the
    # scatter, not clipped.
    flat = jnp.where(keep, sidx_s * cap + slot, nc * cap)
    new_xyz = (cube_xyz.reshape(-1, 3)
               .at[flat].set(jnp.where(keep[:, None], pts_s, 0.0),
                             mode="drop")
               .reshape(nc, cap, 3))
    # Per-cube added counts as a dense one-hot reduce, NOT a scatter-add
    # into nc bins (scatter-adds serialize row-by-row on TPU; callers
    # keep n small — the far path compacts to far_insert_budget first).
    bins = jnp.arange(nc + 1, dtype=jnp.int32)
    added = jnp.sum(((sidx_s[:, None] == bins[None, :]) & keep[:, None])
                    .astype(jnp.int32), axis=0)
    new_cnt = jnp.minimum(cube_cnt + added[:nc], cap)
    if return_keep:
        keep_in = jnp.zeros((n,), bool).at[oid].set(keep)
        return new_xyz, new_cnt, added[:nc] > 0, keep_in, ok
    if return_dropped:
        dropped = jnp.sum((ok_s & ~keep).astype(jnp.int32))
        return new_xyz, new_cnt, added[:nc] > 0, dropped
    return new_xyz, new_cnt, added[:nc] > 0


def insert_into_local_slabs(local_xyz: Array, local_cnt: Array, pts: Array,
                            mask: Array, base_w: Array, origin: Array,
                            m: MappingConfig) -> Tuple[Array, Array, Array]:
    """Append map-frame points into GATHERED neighborhood slabs.

    local_xyz: (L, cap, 3) slabs of the (2r+1)^3 neighborhood cubes in
    meshgrid order (fov_valid_cubes' ``off`` layout); base_w: (3,) world
    cube coord of the neighborhood's corner (sensor_w - r). This is the
    fast path for the overwhelmingly common case (a lidar return lands
    within +-r cubes of the sensor for ranges < r*cube_size); points
    beyond the neighborhood are NOT dropped — they come back in
    ``far_mask`` and the caller routes them through the global
    whole-window scatter (scatter_into_cubes), matching the reference's
    insertion of every in-window point (BasicLaserMapping.cpp:536-577).

    Returns (slabs, counts, received, (sorted_pts, overflow_mask),
    far_mask): overflow flags rows past even the working headroom (the
    caller spills them into the archive) and far_mask flags valid
    points outside the neighborhood (routed through the global
    whole-window scatter).
    """
    l, cap, _ = local_xyz.shape
    side = 2 * m.neighborhood + 1
    w = world_cube_coord(pts, m)
    rel3 = w - base_w[None, :]
    in_nbhd = jnp.all((rel3 >= 0) & (rel3 < side), axis=-1)
    far_mask = mask & ~in_nbhd
    ok = mask & in_nbhd
    # meshgrid 'ij' order: index = x*side^2 + y*side + z
    lidx = jnp.where(ok, rel3[:, 0] * side * side + rel3[:, 1] * side
                     + rel3[:, 2], l)

    # Rank of each point within its cube (stable by input order, like
    # the reference's sequential push_back) via ONE stable
    # payload-carrying sort by cube id: rank = sorted position minus
    # the cube's start offset. The coordinates ride the sort as extra
    # lax.sort operands — no argsort row-gathers (the dominant cost of
    # the previous form on TPU, PERF.md §1).
    lidx_s, px, py, pz, ok_si = jax.lax.sort(
        (lidx, pts[:, 0], pts[:, 1], pts[:, 2], ok.astype(jnp.int32)),
        num_keys=1, is_stable=True)
    ok_s = ok_si.astype(bool)
    pts_s = jnp.stack([px, py, pz], axis=1)
    # Histograms as dense one-hot reduces (scatter-adds into ~126 bins
    # serialize row-by-row on TPU; see ops/scan.py ingest note).
    bins = jnp.arange(l + 1, dtype=jnp.int32)[None, :]
    counts = jnp.sum((lidx[:, None] == bins).astype(jnp.int32), axis=0)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts[:-1]).astype(jnp.int32)])
    rank = jnp.arange(pts.shape[0], dtype=jnp.int32) \
        - starts[jnp.clip(lidx_s, 0, l)]
    slot = local_cnt[jnp.clip(lidx_s, 0, l - 1)] + rank
    keep = ok_s & (slot < cap)
    flat = jnp.where(keep, lidx_s * cap + slot, l * cap)
    new_xyz = (local_xyz.reshape(-1, 3)
               .at[flat].set(jnp.where(keep[:, None], pts_s, 0.0),
                             mode="drop")
               .reshape(l, cap, 3))
    added = jnp.sum(((lidx_s[:, None] == bins) & keep[:, None])
                    .astype(jnp.int32), axis=0)
    new_cnt = jnp.minimum(local_cnt + added[:l], cap)
    # Rows past even the headroom (a saturated cube receiving a dense
    # burst) are returned for the caller to spill into the archive —
    # not dropped (pts_s/overflow are in sorted order).
    overflow = ok_s & ~keep
    return new_xyz, new_cnt, added[:l] > 0, (pts_s, overflow), far_mask


def _compact_xyz(xyz: Array, keep: Array, budget: int
                 ) -> Tuple[Array, Array, Array]:
    """Front-pack kept rows of (N, 3) into a fixed ``budget`` via one
    stable payload-carrying sort; returns (xyz (budget, 3), mask,
    dropped-over-budget)."""
    key = (~keep).astype(jnp.int32)
    _, x_s, y_s, z_s = jax.lax.sort(
        (key, xyz[:, 0], xyz[:, 1], xyz[:, 2]), num_keys=1, is_stable=True)
    if budget > xyz.shape[0]:              # output wider than the input
        pad = (0, budget - xyz.shape[0])
        x_s, y_s, z_s = (jnp.pad(a, pad) for a in (x_s, y_s, z_s))
    n_keep = jnp.sum(keep.astype(jnp.int32))
    cnt = jnp.minimum(n_keep, budget)
    mask = jnp.arange(budget) < cnt
    out = jnp.stack([x_s[:budget], y_s[:budget], z_s[:budget]], axis=1)
    return (jnp.where(mask[:, None], out, 0.0), mask,
            jnp.maximum(n_keep - budget, 0))


def archive_append(pool, xyz: Array, mask: Array, kind: int, budget: int,
                   m: MappingConfig):
    """Compact masked rows to ``budget`` and append them at the pool
    cursor via one contiguous dynamic_update_slice blend (a row scatter
    would serialize on TPU). Near the pool end the block start clamps
    and the add rows roll so they still land at the cursor; rows that
    don't fit are counted. Returns (pool, lost)."""
    pool_xyz, pool_kind, pool_valid, pool_cnt = pool
    add_xyz, add_mask, over_budget = _compact_xyz(xyz, mask, budget)

    a = pool_xyz.shape[0]
    n_add = jnp.sum(add_mask.astype(jnp.int32))
    n_fit = jnp.clip(a - pool_cnt, 0, n_add)
    start = jnp.minimum(pool_cnt, a - budget)
    shift = pool_cnt - start
    j = jnp.arange(budget)
    writem = (j >= shift) & (j < shift + n_fit)

    def blend(pool_arr, add_arr):
        cur = jax.lax.dynamic_slice_in_dim(pool_arr, start, budget, 0)
        add_sh = jnp.roll(add_arr, shift, axis=0)
        wm = writem.reshape((budget,) + (1,) * (add_arr.ndim - 1))
        return jax.lax.dynamic_update_slice_in_dim(
            pool_arr, jnp.where(wm, add_sh, cur), start, 0)

    pool_xyz = blend(pool_xyz, add_xyz)
    pool_kind = blend(pool_kind, jnp.full((budget,), kind, jnp.int32))
    pool_valid = blend(pool_valid, jnp.ones((budget,), bool))
    lost = over_budget + (n_add - n_fit)
    return ((pool_xyz, pool_kind, pool_valid, pool_cnt + n_fit),
            lost)


def compact_archive(pool, m: MappingConfig):
    """Dedup + front-pack the archive pool.

    Evict/re-observe churn appends the same voxel cell every time it is
    spilled; this merges duplicates (keep-first — spills of one cell
    are near-identical centroids), sheds rows invalidated by window
    recentering, and packs survivors to the front so the cursor equals
    the true cell count. Two payload-carrying sorts over the pool; run
    on pool pressure (LoamDriver) or between replay chunks, not per
    frame."""
    xyz, kind, valid, cnt = pool
    a = xyz.shape[0]
    valid = valid & (jnp.arange(a) < cnt)
    leaf = jnp.where(kind == 0, m.corner_leaf, m.surf_leaf)
    cell = jnp.floor(xyz / leaf[:, None]).astype(jnp.int32)
    cx = jnp.clip(cell[:, 0], -4096, 4095)
    cy = jnp.clip(cell[:, 1], -4096, 4095)
    cz = jnp.clip(cell[:, 2], -4096, 4095)
    # (invalid, kind, cx, cy | cz) packed into two int32 sort keys
    key1 = ((~valid).astype(jnp.int32) * (1 << 30) + kind * (1 << 29)
            + (cx + 4096) * (1 << 14) + (cy + 4096))
    key2 = cz + 4096
    k1, k2, x_s, y_s, z_s, kd, vl = jax.lax.sort(
        (key1, key2, xyz[:, 0], xyz[:, 1], xyz[:, 2], kind,
         valid.astype(jnp.int32)), num_keys=2, is_stable=True)
    first = jnp.concatenate([jnp.ones((1,), bool),
                             (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])])
    keep = vl.astype(bool) & first
    dk = (~keep).astype(jnp.int32)
    _, x_s, y_s, z_s, kd = jax.lax.sort(
        (dk, x_s, y_s, z_s, kd), num_keys=1, is_stable=True)
    n = jnp.sum(keep.astype(jnp.int32))
    mask = jnp.arange(a) < n
    return (jnp.stack([x_s, y_s, z_s], axis=1), kd, mask, n)


def downsample_local_slabs(local_xyz: Array, local_cnt: Array, do: Array,
                           leaf: float) -> Tuple[Array, Array]:
    """Voxel-thin selected gathered slabs in place (vmapped)."""
    cap = local_xyz.shape[1]

    def one(xyz, cnt):
        mask = jnp.arange(cap) < cnt
        ps = PointSet(xyz=xyz, rel=jnp.zeros((cap,), jnp.float32),
                      ring=jnp.zeros((cap,), jnp.int32), mask=mask)
        out = voxel_downsample(ps, leaf, cap)
        return out.xyz, jnp.sum(out.mask).astype(jnp.int32)

    ds_xyz, ds_cnt = jax.vmap(one)(local_xyz,
                                   jnp.where(do, local_cnt, 0))
    new_xyz = jnp.where(do[:, None, None], ds_xyz, local_xyz)
    new_cnt = jnp.where(do, ds_cnt, local_cnt)
    return new_xyz, new_cnt


def downsample_cubes(cube_xyz: Array, cube_cnt: Array, sidx: Array,
                     valid: Array, leaf: float) -> Tuple[Array, Array]:
    """Voxel-downsample the selected cubes in place
    (reference BasicLaserMapping.cpp:580-593)."""
    cap = cube_xyz.shape[1]

    def one(xyz, cnt):
        mask = jnp.arange(cap) < cnt
        ps = PointSet(xyz=xyz, rel=jnp.zeros((cap,), jnp.float32),
                      ring=jnp.zeros((cap,), jnp.int32), mask=mask)
        out = voxel_downsample(ps, leaf, cap)
        return out.xyz, jnp.sum(out.mask).astype(jnp.int32)

    sel_xyz = cube_xyz[sidx]
    sel_cnt = jnp.where(valid, cube_cnt[sidx], 0)
    # vmap, not lax.map: 125 small sorts run as one wide batched kernel
    # instead of 125 sequential dispatches (memory is trivial).
    ds_xyz, ds_cnt = jax.vmap(one)(sel_xyz, sel_cnt)

    # Out-of-window neighbors alias in-window storage cells (toroidal
    # mod); redirect their writes out of bounds so the scatter drops
    # them instead of racing the valid write on the same cell.
    nc = cube_xyz.shape[0]
    do = valid & (cube_cnt[sidx] > 0)
    sidx_safe = jnp.where(do, sidx, nc)
    new_xyz = cube_xyz.at[sidx_safe].set(ds_xyz, mode="drop")
    new_cnt = cube_cnt.at[sidx_safe].set(ds_cnt, mode="drop")
    return new_xyz, new_cnt


def _select_active(flags: Array, k: int,
                   weight: Optional[Array] = None) -> Tuple[Array, Array]:
    """Pick up to k set positions of a boolean vector; returns
    (positions (k,), active (k,)).

    weight (same shape, >=0) breaks ties among set flags: when more
    than k flags are set, the k highest-weight ones win. The engine
    passes cube point counts so the active-cube budget sheds EMPTY
    FOV-valid cubes first (telemetry round 2 showed ~123 of 125
    neighborhood cubes pass the FOV test on open scenes — index-order
    truncation could drop populated cubes while keeping empty ones)."""
    k = min(k, flags.shape[0])
    score = flags.astype(jnp.int32)
    if weight is not None:
        score = score * (1 + jnp.minimum(weight, jnp.int32(2 ** 20)))
    score, idx = jax.lax.top_k(score, k)
    return idx, score > 0


def _map_point(tf: Array, pts: Array) -> Array:
    """pointAssociateToMap: X = R(theta) p + t (BasicLaserMapping.cpp:205-218)."""
    return lm.pose_transform_points(tf, pts)


def _jacobian_rows(tf: Array, pts: Array, coeff: Array) -> Array:
    """d(coeff . (R(theta) p + t)) / d(theta, t) — autodiff equal to the
    reference's expanded partials (BasicLaserMapping.cpp:846-864)."""
    def scalar(tf_, p, c):
        return jnp.dot(c, _map_point(tf_, p))

    return jax.vmap(jax.grad(scalar), in_axes=(None, 0, 0))(tf, pts, coeff)


class _OptCarry(NamedTuple):
    tf: Array
    it: Array
    mat_p: Array
    degenerate: Array
    done: Array
    # cached correspondence fits (refreshed every corresp_refresh_every)
    line_a: Array     # (Qc, 3)
    line_b: Array     # (Qc, 3)
    line_valid: Array  # (Qc,)
    plane_n: Array    # (Qs, 3)
    plane_d: Array    # (Qs,)
    plane_valid: Array  # (Qs,)


def optimize_pose(corner_stack: PointSet, surf_stack: PointSet,
                  map_corner_xyz: Array, map_corner_mask: Array,
                  map_surf_xyz: Array, map_surf_mask: Array,
                  tobe0: Array, cfg: LoamConfig,
                  static_schedule: bool = False) -> Array:
    """The <=10-iteration map-alignment GN
    (reference optimizeTransformTobeMapped, BasicLaserMapping.cpp:626-923).

    Divergence for TPU economy: the reference re-runs the 5-NN + fits
    every iteration; here they refresh every ``corresp_refresh_every``
    iterations (the same caching idiom the reference itself uses in the
    odometry stage, BasicLaserOdometry.cpp:251) — with the pose moving
    sub-centimeter per iteration the cached line/plane geometry is
    equally valid, and the accuracy gate (ATE) confirms parity.

    static_schedule=True swaps the while_loop + refresh-``lax.cond``
    for a fixed phase schedule (see odometry._run_gn_static): required
    for efficient batched replay, where a vmapped cond executes BOTH
    branches and would re-run the windowed 5-NN every iteration.
    """
    m = cfg.mapping
    corner_sorted = sort_cloud(map_corner_xyz, map_corner_mask, axis=2)
    surf_sorted = sort_cloud(map_surf_xyz, map_surf_mask, axis=2)
    qc_n = corner_stack.xyz.shape[0]
    qs_n = surf_stack.xyz.shape[0]

    run = ((jnp.sum(map_corner_mask) > m.min_corner_map_points)
           & (jnp.sum(map_surf_mask) > m.min_surface_map_points))

    def cond(c: _OptCarry):
        return (c.it < m.max_iterations) & ~c.done & run

    def refresh_fits(tf):
        qc = _map_point(tf, corner_stack.xyz)
        _, d2_c, nbrs_c = tiled_windowed_knn(qc, corner_stack.mask,
                                             corner_sorted, k=5,
                                             window=m.knn_window,
                                             group=m.knn_group,
                                             return_neighbors=True)
        gate_c = d2_c[:, 4] < m.nn_sq_dist_gate
        centroid, direction, line_ok = fit.line_fit(nbrs_c,
                                                    m.line_eigen_ratio)
        pa = centroid + m.line_half_length * direction
        pb = centroid - m.line_half_length * direction

        qs = _map_point(tf, surf_stack.xyz)
        _, d2_s, nbrs_s = tiled_windowed_knn(qs, surf_stack.mask,
                                             surf_sorted, k=5,
                                             window=m.knn_window,
                                             group=m.knn_group,
                                             return_neighbors=True)
        gate_s = d2_s[:, 4] < m.nn_sq_dist_gate
        normal, dplane, plane_ok = fit.plane_fit(nbrs_s,
                                                 m.plane_max_residual)
        return (pa, pb, corner_stack.mask & gate_c & line_ok,
                normal, dplane, surf_stack.mask & gate_s & plane_ok)

    def iteration(tf, it, mat_p0, degenerate0, pa, pb, cvalid, normal,
                  dplane, svalid, projector_mode="cond"):
        """One GN update against cached fits; returns
        (tf_new, mat_p, degenerate, done). projector_mode as in
        odometry._gn_iteration: the static schedule peels iteration 0
        ("compute"/"carry") because a vmapped lax.cond would run the
        6x6 eigh every iteration."""
        # --- corners: point-to-line residuals against cached fits ---
        qc = _map_point(tf, corner_stack.xyz)
        d_c, dir_c = _line_dist(qc, pa, pb)
        s_c = 1.0 - m.corner_weight_decay * jnp.abs(d_c)
        sel_c = cvalid & (s_c > m.weight_floor)
        coeff_c = (s_c[:, None] * dir_c) * sel_c[:, None]

        # --- surfels: point-to-plane residuals against cached fits ---
        qs = _map_point(tf, surf_stack.xyz)
        d_s = jnp.sum(normal * qs, axis=-1) + dplane
        dist_s = jnp.sqrt(jnp.linalg.norm(qs, axis=-1))
        s_s = 1.0 - m.corner_weight_decay * jnp.abs(d_s) \
            / jnp.maximum(dist_s, 1e-6)
        sel_s = svalid & (s_s > m.weight_floor)
        coeff_s = (s_s[:, None] * normal) * sel_s[:, None]

        a_rows = jnp.concatenate([
            _jacobian_rows(tf, corner_stack.xyz, coeff_c),
            _jacobian_rows(tf, surf_stack.xyz, coeff_s)], axis=0)
        b_vec = jnp.concatenate([-s_c * d_c * sel_c, -s_s * d_s * sel_s])

        n_sel = jnp.sum(sel_c) + jnp.sum(sel_s)
        enough = n_sel >= m.min_selected

        hi = jax.lax.Precision.HIGHEST
        ata = jnp.matmul(a_rows.T, a_rows, precision=hi)
        atb = jnp.matmul(a_rows.T, b_vec, precision=hi)
        x = jnp.linalg.solve(ata, atb)

        def projector():
            w, v = jnp.linalg.eigh(ata)
            keep = (w >= m.degeneracy_eigen_threshold).astype(jnp.float32)
            return (jnp.matmul(v * keep[None, :], v.T, precision=hi),
                    jnp.any(keep < 0.5))

        if projector_mode == "compute":
            p, dg = projector()
            mat_p = jnp.where(enough, p, mat_p0)
            degenerate = enough & dg
        elif projector_mode == "carry":
            mat_p, degenerate = mat_p0, degenerate0
        else:
            first = (it == 0) & enough
            mat_p, degenerate = jax.lax.cond(
                first, projector, lambda: (mat_p0, degenerate0))
        x = jnp.where(degenerate, jnp.matmul(mat_p, x, precision=hi), x)

        tf_new = tf + x
        tf_new = jnp.where(jnp.isfinite(tf_new), tf_new, 0.0)
        tf_new = jnp.where(enough, tf_new, tf)

        delta_r = jnp.linalg.norm(lm.rad2deg(x[:3]))
        delta_t = jnp.linalg.norm(x[3:] * 100.0)
        done = enough & (delta_r < m.delta_r_abort) \
            & (delta_t < m.delta_t_abort)
        return tf_new, mat_p, degenerate, done

    if static_schedule:
        refresh_every = m.corresp_refresh_every
        n_phases = -(-m.max_iterations // refresh_every)

        def do_phase(phase_idx, tf, mat_p, degenerate, done, first):
            pa, pb, cvalid, normal, dplane, svalid = refresh_fits(tf)
            for j in range(refresh_every):       # static unroll
                it = phase_idx * refresh_every + j
                mode = "compute" if (first and j == 0) else "carry"
                tf_new, mat_p_new, degen_new, done_step = iteration(
                    tf, it, mat_p, degenerate, pa, pb, cvalid, normal,
                    dplane, svalid, projector_mode=mode)
                active = run & ~done & (it < m.max_iterations)
                tf = jnp.where(active, tf_new, tf)
                mat_p = jnp.where(active, mat_p_new, mat_p)
                degenerate = jnp.where(active, degen_new, degenerate)
                done = done | (active & done_step)
            return tf, mat_p, degenerate, done

        # Phase 0 peeled (projector eigh runs once, outside the loop);
        # then while over PHASES, not a scan: the windowed 5-NN refresh
        # is the expensive part of each phase, and a while_loop (which
        # vmap batches into an any-lane-still-running loop) stops
        # refreshing once every lane has hit its 0.05 aborts — the scan
        # form paid all n_phases refreshes on every frame.
        tf, mat_p, degenerate, done = do_phase(
            jnp.zeros((), jnp.int32), tobe0, jnp.eye(6, dtype=jnp.float32),
            jnp.zeros((), bool), jnp.zeros((), bool), first=True)

        def phase_cond(carry):
            phase_idx, tf, mat_p, degenerate, done = carry
            return (phase_idx < n_phases) & ~done & run

        def phase_body(carry):
            phase_idx, tf, mat_p, degenerate, done = carry
            tf, mat_p, degenerate, done = do_phase(
                phase_idx, tf, mat_p, degenerate, done, first=False)
            return (phase_idx + 1, tf, mat_p, degenerate, done)

        init = (jnp.ones((), jnp.int32), tf, mat_p, degenerate, done)
        _, tf, _, _, _ = jax.lax.while_loop(phase_cond, phase_body, init)
        return tf

    def body(c: _OptCarry) -> _OptCarry:
        (pa, pb, cvalid, normal, dplane, svalid) = jax.lax.cond(
            c.it % m.corresp_refresh_every == 0,
            lambda: refresh_fits(c.tf),
            lambda: (c.line_a, c.line_b, c.line_valid,
                     c.plane_n, c.plane_d, c.plane_valid))

        tf_new, mat_p, degenerate, done = iteration(
            c.tf, c.it, c.mat_p, c.degenerate, pa, pb, cvalid, normal,
            dplane, svalid)
        return _OptCarry(tf=tf_new, it=c.it + 1, mat_p=mat_p,
                         degenerate=degenerate, done=done,
                         line_a=pa, line_b=pb, line_valid=cvalid,
                         plane_n=normal, plane_d=dplane, plane_valid=svalid)

    init = _OptCarry(tf=tobe0, it=jnp.zeros((), jnp.int32),
                     mat_p=jnp.eye(6, dtype=jnp.float32),
                     degenerate=jnp.zeros((), bool),
                     done=jnp.zeros((), bool),
                     line_a=jnp.zeros((qc_n, 3), jnp.float32),
                     line_b=jnp.zeros((qc_n, 3), jnp.float32),
                     line_valid=jnp.zeros((qc_n,), bool),
                     plane_n=jnp.zeros((qs_n, 3), jnp.float32),
                     plane_d=jnp.zeros((qs_n,), jnp.float32),
                     plane_valid=jnp.zeros((qs_n,), bool))
    return jax.lax.while_loop(cond, body, init).tf


def _line_dist(x0: Array, a: Array, b: Array) -> Tuple[Array, Array]:
    """Distance to the segment-defined line and gradient direction (same
    formulas as odometry; reference BasicLaserMapping.cpp:706-745)."""
    cvec = jnp.cross(x0 - a, x0 - b)
    a012 = jnp.linalg.norm(cvec, axis=-1)
    l12 = jnp.linalg.norm(a - b, axis=-1)
    safe_a = jnp.maximum(a012, 1e-12)
    safe_l = jnp.maximum(l12, 1e-12)
    d = a012 / safe_l
    direction = jnp.cross(a - b, cvec / safe_a[..., None]) / safe_l[..., None]
    return d, direction


def step(state: MappingState, odom_pose: Array, corner_cloud: PointSet,
         surf_cloud: PointSet, cfg: LoamConfig,
         imu_rpy: Optional[Tuple[Array, Array]] = None,
         static_schedule: bool = False,
         archive_compact: bool = False
         ) -> Tuple[MappingState, MappingOutputs]:
    """One mapping refinement (reference BasicLaserMapping::process).

    odom_pose: the odometry transform_sum this frame.
    corner_cloud / surf_cloud: odometry's last clouds (sensor frame).
    imu_rpy: optional ((roll, pitch, yaw), valid) for the 0.998/0.002
    attitude blend (reference transformUpdate :171-203).
    archive_compact: statically compile the archive dedup compaction
    into this frame (normally run separately on pool pressure — see
    LoamDriver._maybe_compact_archive).
    """
    m = cfg.mapping

    # Pose prior from the odometry increment (reference :103-167).
    tobe = lm.transform_associate_to_map(odom_pose, state.transform_bef,
                                         state.transform_aft)

    # Downsample feature stacks in the sensor frame (reference transforms
    # to map and back before filtering, :283-292 + :512-527 — a no-op
    # round trip in exact arithmetic).
    corner_stack, stack_c_drop = voxel_downsample(
        corner_cloud, m.corner_leaf, m.corner_stack_capacity,
        return_dropped=True)
    surf_stack, stack_s_drop = voxel_downsample(
        surf_cloud, m.surf_leaf, m.surf_stack_capacity,
        return_dropped=True)

    # Recenter the rolling window around the prior pose. Archived rows
    # of cubes leaving the window clear with it (the reference's shift
    # loops drop those clouds, BasicLaserMapping.cpp:311-441): a row is
    # valid iff its world cube still lies in the new window — an
    # elementwise test on the row's own coordinates (a `clear[sidx]`
    # gather over the 256k-row pool cost ~the whole archive budget).
    sensor_w = world_cube_coord(tobe[lm.POS], m)
    new_origin, clear = recenter(state.origin, sensor_w, m)
    corner_cnt = jnp.where(clear, 0, state.corner_cnt)
    surf_cnt = jnp.where(clear, 0, state.surf_cnt)
    arch_xyz = state.archive_xyz
    arch_c = world_cube_coord(arch_xyz, m) - new_origin[None, :]
    arch_valid = state.archive_valid & jnp.all(
        (arch_c >= 0) & (arch_c < _dims(m)[None, :]), axis=-1)
    arch_cnt = state.archive_cnt
    # Reinstatement "wanted" probe, fused into this validity pass (the
    # pool xyz is already being read here — a separate probe pass cost
    # ~5 batched sweeps/s at 8 lanes x 262k rows): a row is wanted if
    # its cube lies inside the (2r+1)^3 search neighborhood. Rows
    # archived later this frame are probed next frame.
    arch_wanted = arch_valid & jnp.all(
        jnp.abs(arch_c - (sensor_w - new_origin)[None, :])
        <= m.neighborhood, axis=-1)

    # Gather the (2r+1)^3 neighborhood slabs ONCE; assembly, insert and
    # thinning all operate on these local copies, and the global cube
    # buffers are touched exactly twice per frame (this gather + one
    # whole-slab write-back) — point-level scatters into the 4851-cube
    # buffers cost full-buffer passes on TPU.
    sidx, valid_fov, in_bounds = fov_valid_cubes(new_origin, tobe, m)
    local_c = state.corner_xyz[sidx]
    local_cc = jnp.where(in_bounds, corner_cnt[sidx], 0)
    local_s = state.surf_xyz[sidx]
    local_sc = jnp.where(in_bounds, surf_cnt[sidx], 0)

    # Search clouds from up to max_active_cubes FOV-valid cubes,
    # populated cubes first (exact whenever the count fits the budget).
    populated = (local_cc + local_sc) > 0
    pos_a, act_a = _select_active(valid_fov, m.max_active_cubes,
                                  weight=local_cc + local_sc)

    def local_assemble(xyz, cnt):
        sel = xyz[pos_a]
        c = jnp.where(act_a, cnt[pos_a], 0)
        msk = jnp.arange(xyz.shape[1])[None, :] < c[:, None]
        return sel.reshape(-1, 3), msk.reshape(-1)

    map_c_xyz, map_c_mask = local_assemble(local_c, local_cc)
    map_s_xyz, map_s_mask = local_assemble(local_s, local_sc)

    tobe = optimize_pose(corner_stack, surf_stack, map_c_xyz, map_c_mask,
                         map_s_xyz, map_s_mask, tobe, cfg,
                         static_schedule=static_schedule)

    # transformUpdate (reference :171-203): optional IMU attitude blend.
    if imu_rpy is not None:
        rpy, imu_ok = imu_rpy
        blend = m.imu_blend
        rx = (1.0 - blend) * tobe[0] + blend * rpy[1]
        rz = (1.0 - blend) * tobe[2] + blend * rpy[0]
        tobe = tobe.at[0].set(jnp.where(imu_ok, rx, tobe[0]))
        tobe = tobe.at[2].set(jnp.where(imu_ok, rz, tobe[2]))

    # Insert the downsized stacks into the local slabs, working in
    # headroom-padded buffers: points land beyond the storage capacity
    # instead of being shed, the re-thin runs on the padded slabs, and
    # only what survives thinning is clipped back to capacity — evict
    # by thinning, not truncation (the reference's push_back map never
    # drops an in-window point, BasicLaserMapping.cpp:536-577).
    base_w = sensor_w - m.neighborhood
    corner_map_pts = _map_point(tobe, corner_stack.xyz)
    surf_map_pts = _map_point(tobe, surf_stack.xyz)
    hr = m.insert_headroom
    nl = local_c.shape[0]

    def pad_slab(x):
        return jnp.concatenate(
            [x, jnp.zeros((nl, hr, 3), jnp.float32)], axis=1)

    local_c, local_cc, recv_c, ovf_c, far_c = insert_into_local_slabs(
        pad_slab(local_c), local_cc, corner_map_pts, corner_stack.mask,
        base_w, new_origin, m)
    local_s, local_sc, recv_s, ovf_s, far_s = insert_into_local_slabs(
        pad_slab(local_s), local_sc, surf_map_pts, surf_stack.mask,
        base_w, new_origin, m)

    pool = (arch_xyz, state.archive_kind, arch_valid, arch_cnt)

    # Re-thin in place. The reference thins every FOV-valid cube
    # (BasicLaserMapping.cpp:580-593); voxel thinning is idempotent, so
    # restricting to cubes that actually RECEIVED points this frame is
    # equivalent (a cube entering the FOV untouched stays slightly
    # denser until its next insert — harmless and cheaper). Candidates
    # are all received in-window cubes (not just FOV-valid ones): a
    # received cube skipped here would lose its headroom tail to the
    # capacity clip below.
    def thin(xyz, cnt, recv, leaf):
        pos, act = _select_active(recv & in_bounds, m.thin_active_cubes,
                                  weight=cnt)
        sub_xyz, sub_cnt = downsample_local_slabs(xyz[pos], cnt[pos], act,
                                                  leaf)
        return xyz.at[pos].set(sub_xyz), cnt.at[pos].set(sub_cnt)

    local_c, local_cc = thin(local_c, local_cc, recv_c, m.corner_leaf)
    local_s, local_sc = thin(local_s, local_sc, recv_s, m.surf_leaf)

    # Clip back to storage capacity (slabs are front-packed, so the
    # first cap rows are the kept points). Post-thin tails of the top
    # over-capacity cubes AND insert-time overflow (a saturated cube
    # receiving a dense burst past even the headroom) spill into the
    # archive pool in ONE append per kind — saturated geometry (a
    # corridor cube wants ~8k surf points at the 0.4 leaf) can never
    # fit a bounded search slab, and the reference keeps every such
    # point (push_back, BasicLaserMapping.cpp:536-577). Only tails
    # beyond the per-frame archive budgets or the pool capacity count
    # as losses.
    def clip_tails(xyz, cnt, cap):
        hrw = xyz.shape[1] - cap
        pos, act = _select_active(cnt > cap, m.archive_cubes_per_frame,
                                  weight=cnt)
        # Even-reorder the selected over-capacity slabs BEFORE the clip:
        # post-thin rows are voxel centroids in cell-sort order, so a
        # prefix clip keeps a spatially-biased chunk (all low-coordinate
        # cells) and banishes a coherent slice of the cube to the
        # non-searched archive — measured +4 cm ATE at capacity 768.
        # Keeping an EVENLY SPACED subset of the cell order degrades the
        # search tier like a coarser leaf instead (same policy as
        # voxel_downsample's overflow path); the complement moves behind
        # row cap and spills to the archive as before.
        w = xyz.shape[1]
        rows = jnp.arange(w)

        def reorder(sx, sc):
            ratio = jnp.float32(cap) / jnp.maximum(sc, 1).astype(jnp.float32)
            b_here = jnp.floor(rows.astype(jnp.float32) * ratio)
            b_prev = jnp.floor((rows - 1).astype(jnp.float32) * ratio)
            keep = (rows < sc) & (b_here != b_prev)
            key = jnp.where(rows < sc,
                            jnp.where(keep, 0, 1), 2).astype(jnp.int32)
            _, x_s, y_s, z_s = jax.lax.sort(
                (key, sx[:, 0], sx[:, 1], sx[:, 2]), num_keys=1,
                is_stable=True)
            return jnp.stack([x_s, y_s, z_s], axis=1)

        sel = jax.vmap(reorder)(xyz[pos], cnt[pos])
        xyz = xyz.at[pos].set(jnp.where(act[:, None, None], sel, xyz[pos]))
        tail = xyz[pos][:, cap:, :]                    # (K, hr, 3)
        tcnt = jnp.where(act, jnp.clip(cnt[pos] - cap, 0, hrw), 0)
        tmask = jnp.arange(hrw)[None, :] < tcnt[:, None]
        missed = jnp.sum(jnp.maximum(cnt - cap, 0)) - jnp.sum(tcnt)
        return (xyz[:, :cap], jnp.minimum(cnt, cap),
                tail.reshape(-1, 3), tmask.reshape(-1), missed)

    local_c, local_cc, tail_c, tmask_c, miss_c = clip_tails(
        local_c, local_cc, m.corner_cube_capacity)
    local_s, local_sc, tail_s, tmask_s, miss_s = clip_tails(
        local_s, local_sc, m.surf_cube_capacity)
    pool, lost_c = archive_append(
        pool, jnp.concatenate([ovf_c[0], tail_c], axis=0),
        jnp.concatenate([ovf_c[1], tmask_c], axis=0), 0,
        m.archive_append_budget, m)
    pool, lost_s = archive_append(
        pool, jnp.concatenate([ovf_s[0], tail_s], axis=0),
        jnp.concatenate([ovf_s[1], tmask_s], axis=0), 1,
        m.archive_append_budget, m)
    cube_c_drop = miss_c + lost_c
    cube_s_drop = miss_s + lost_s

    # Periodic dedup compaction: evict/re-observe churn appends the
    # same voxel cell repeatedly; merging duplicates bounds the pool at
    # the true cell count. Off the hot path by default — the cursor
    # only advances while some cube is saturated.
    if archive_compact:
        pool = compact_archive(pool, m)
    arch_xyz, arch_kind, arch_valid, arch_cnt = pool

    # Whole-slab write-back; aliased out-of-window entries are dropped.
    nc = m.n_cubes
    sidx_safe = jnp.where(in_bounds, sidx, nc)
    corner_xyz = state.corner_xyz.at[sidx_safe].set(local_c, mode="drop")
    corner_cnt = corner_cnt.at[sidx_safe].set(local_cc, mode="drop")
    surf_xyz = state.surf_xyz.at[sidx_safe].set(local_s, mode="drop")
    surf_cnt = surf_cnt.at[sidx_safe].set(local_sc, mode="drop")

    # Whole-window far-point path: the rare returns beyond the +-r
    # neighborhood (ranges > r*cube_size, e.g. 150-400 m outdoors) go
    # through a bounded global scatter so they persist in the map like
    # the reference's push_back (BasicLaserMapping.cpp:536-577) instead
    # of vanishing. Compact to a small fixed budget first: the scatter
    # machinery then costs O(budget), not O(stack capacity).
    fb = m.far_insert_budget
    far_c_xyz, far_c_mask, far_c_over = _compact_xyz(corner_map_pts, far_c, fb)
    far_s_xyz, far_s_mask, far_s_over = _compact_xyz(surf_map_pts, far_s, fb)

    # Rolling archive reinstatement: a cursor-advancing window of the
    # pool rides the SAME global scatters as the far points, so archived
    # rows flow back into the SEARCH slabs wherever their cube has
    # headroom (insert-burst overflow whose cube later thinned below
    # capacity, or geometry behind a slab rebuilt after eviction). The
    # reference's per-frame KD-trees search everything stored
    # (BasicLaserMapping.cpp:503-509, :665-817); the archive tier must
    # not be write-only. Rows whose cube slab is full simply stay
    # archived (their window comes around again next sweep of the
    # cursor); accepted rows are invalidated in the pool so the point
    # lives in exactly one tier.
    rb = m.archive_reinstate_budget
    a_cap = arch_xyz.shape[0]
    # Priority cursor jump (timely reinstatement): latency for geometry
    # the sensor is ACTUALLY near must be a few frames, not a full-pool
    # cursor lap (~256 frames at 1024 rows/frame over the 262k pool).
    # "Wanted" rows are valid rows whose cube lies inside the (2r+1)^3
    # search neighborhood — exactly the rows the reference would be
    # searching this frame (BasicLaserMapping.cpp:503-509). The window
    # start jumps to the first wanted row in rotation order after the
    # carried cursor — elementwise over the pool plus one min-reduce (no
    # sort, no gather) — so wanted clusters drain round-robin within
    # ceil(wanted/rb) frames and a full cube can't starve the rest;
    # with no wanted rows it falls back to the plain rolling advance
    # over the appended region.
    pool_idx = jnp.arange(a_cap, dtype=jnp.int32)
    rot = jnp.mod(pool_idx - state.archive_cursor, a_cap)
    first = jnp.min(jnp.where(arch_wanted, rot, a_cap))
    limit = jnp.maximum(arch_cnt, 1)
    r_start = jnp.where(first < a_cap,
                        jnp.mod(state.archive_cursor + first, a_cap),
                        jnp.mod(state.archive_cursor, limit))
    r_start = jnp.minimum(r_start, jnp.int32(a_cap - rb))
    new_cursor = jnp.mod(r_start + max(rb, 1), limit)
    cand_xyz = jax.lax.dynamic_slice_in_dim(arch_xyz, r_start, rb, 0)
    cand_kind = jax.lax.dynamic_slice_in_dim(arch_kind, r_start, rb, 0)
    cand_valid = jax.lax.dynamic_slice_in_dim(arch_valid, r_start, rb, 0)
    cand_c = cand_valid & (cand_kind == 0)
    cand_s = cand_valid & (cand_kind == 1)

    corner_xyz, corner_cnt, _, keep_c, ok_c = scatter_into_cubes(
        corner_xyz, corner_cnt,
        jnp.concatenate([far_c_xyz, cand_xyz], axis=0),
        jnp.concatenate([far_c_mask, cand_c], axis=0),
        new_origin, m, return_keep=True)
    surf_xyz, surf_cnt, _, keep_s, ok_s = scatter_into_cubes(
        surf_xyz, surf_cnt,
        jnp.concatenate([far_s_xyz, cand_xyz], axis=0),
        jnp.concatenate([far_s_mask, cand_s], axis=0),
        new_origin, m, return_keep=True)
    # Capacity losses are counted for the far rows only: a reinstatement
    # candidate that doesn't fit stays in the archive, losing nothing.
    far_c_drop = jnp.sum((ok_c[:fb] & ~keep_c[:fb]).astype(jnp.int32))
    far_s_drop = jnp.sum((ok_s[:fb] & ~keep_s[:fb]).astype(jnp.int32))
    cube_c_drop = cube_c_drop + far_c_over + far_c_drop
    cube_s_drop = cube_s_drop + far_s_over + far_s_drop
    accepted = keep_c[fb:] | keep_s[fb:]
    reinstated = jnp.sum(accepted.astype(jnp.int32))
    arch_valid = jax.lax.dynamic_update_slice_in_dim(
        arch_valid, cand_valid & ~accepted, r_start, 0)

    new_state = MappingState(
        corner_xyz=corner_xyz, corner_cnt=corner_cnt,
        surf_xyz=surf_xyz, surf_cnt=surf_cnt,
        origin=new_origin, transform_tobe=tobe,
        transform_aft=tobe, transform_bef=odom_pose,
        map_frame=state.map_frame + 1,
        archive_xyz=arch_xyz, archive_kind=arch_kind,
        archive_valid=arch_valid, archive_cnt=arch_cnt,
        archive_cursor=new_cursor)

    # Surround-map cadence: the reference's _mapFrameCount starts at
    # _mapFrameNum-1, so the 1st, (N+1)th, ... mapping frames publish
    # (BasicLaserMapping.cpp:54,242-264).
    surround_due = (state.map_frame % m.map_frame_num) == 0
    telemetry = MapTelemetry(
        stack_corner_dropped=stack_c_drop,
        stack_surf_dropped=stack_s_drop,
        cube_corner_dropped=cube_c_drop,
        cube_surf_dropped=cube_s_drop,
        active_cube_deficit=jnp.maximum(
            jnp.sum((valid_fov & populated).astype(jnp.int32))
            - jnp.sum((act_a & populated[pos_a]).astype(jnp.int32)), 0),
        archive_reinstated=reinstated)
    return new_state, MappingOutputs(transform_aft=tobe,
                                     transform_bef=odom_pose,
                                     surround_due=surround_due,
                                     telemetry=telemetry)


def full_map(state: MappingState, cfg: LoamConfig) -> Tuple[Array, Array]:
    """Every stored map point (corner + surf slabs + the archive pool)
    across the whole rolling window, with a validity mask — the
    complete world model, for export."""
    m = cfg.mapping

    def flatten(xyz, cnt):
        cap = xyz.shape[1]
        mask = jnp.arange(cap)[None, :] < cnt[:, None]
        return xyz.reshape(-1, 3), mask.reshape(-1)

    cx, cm = flatten(state.corner_xyz, state.corner_cnt)
    sx, sm = flatten(state.surf_xyz, state.surf_cnt)
    a_mask = state.archive_valid & (
        jnp.arange(state.archive_xyz.shape[0]) < state.archive_cnt)
    return (jnp.concatenate([cx, sx, state.archive_xyz], axis=0),
            jnp.concatenate([cm, sm, a_mask], axis=0))


def surround_map(state: MappingState, cfg: LoamConfig,
                 capacity: int = 65536) -> PointSet:
    """Downsized surround map (reference createDownsizedMap, :242-264):
    all in-bounds neighborhood cubes, corner+surf, voxel-thinned.

    Archive rows whose cube lies in the neighborhood are included too:
    the reference publishes everything it stores for those cubes, so the
    spilled tail of a saturated cube must appear in the surround cloud,
    not just in full_map. The voxel downsample dedups slab/archive
    overlap. Runs off the hot path (publish cadence only)."""
    m = cfg.mapping
    sidx, _, in_bounds = fov_valid_cubes(state.origin,
                                         state.transform_tobe, m)
    c_xyz, c_mask = assemble_map_cloud(state.corner_xyz, state.corner_cnt,
                                       sidx, in_bounds)
    s_xyz, s_mask = assemble_map_cloud(state.surf_xyz, state.surf_cnt,
                                       sidx, in_bounds)
    sensor_w = world_cube_coord(state.transform_tobe[lm.POS], m)
    rel3 = world_cube_coord(state.archive_xyz, m) \
        - (sensor_w - m.neighborhood)[None, :]
    side = 2 * m.neighborhood + 1
    a_mask = (state.archive_valid
              & (jnp.arange(state.archive_xyz.shape[0]) < state.archive_cnt)
              & jnp.all((rel3 >= 0) & (rel3 < side), axis=-1))
    xyz = jnp.concatenate([c_xyz, s_xyz, state.archive_xyz], axis=0)
    mask = jnp.concatenate([c_mask, s_mask, a_mask], axis=0)
    n = xyz.shape[0]
    ps = PointSet(xyz=xyz, rel=jnp.zeros((n,), jnp.float32),
                  ring=jnp.zeros((n,), jnp.int32), mask=mask)
    return voxel_downsample(ps, m.corner_leaf, capacity)
