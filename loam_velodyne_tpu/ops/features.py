"""Feature extraction: curvature, rejection masks, corner/flat picks.

TPU-native equivalent of the reference extractFeatures pipeline
(BasicScanRegistration.cpp:155-386). The reference walks each ring
serially: curvature + O(n^2) insertion sort (setRegionBuffersFor,
:284-318), occlusion/parallel-beam rejection (setScanBuffersFor,
:321-363), then a greedy curvature-ordered pick with +/-5 neighbor
suppression per (ring, region) (:196-254, markAsPicked :367-386).

Here the whole sweep is processed as one fixed-shape program:

- curvature via windowed prefix sums over the (R, P) ring grid;
- rejection intervals via a difference-array cumulative-sum (the
  scatter-OR of [i-C, i] / [i+1, i+C+1] ranges);
- the insertion sort becomes ``lax.top_k`` per (ring, region);
- the greedy pick stays greedy (it is order-dependent by design) but
  runs as a short ``fori_loop`` over the top-K candidates, vmapped over
  all rings x regions in parallel. Suppression extents (markAsPicked's
  early-break walk) depend only on static geometry, so they are
  precomputed as per-point left/right run lengths.

Deliberate divergences from the reference (gated by trajectory ATE, not
bit equality):
- regions within a ring are picked in parallel, so suppression does not
  leak across region boundaries (it can in the reference, by <=5 pts);
- the candidate scan per region is capped at ``corner_scan_cap`` /
  ``flat_scan_cap`` sorted candidates instead of the whole region.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from loam_velodyne_tpu.config import Capacities, RegistrationConfig
from loam_velodyne_tpu.ops.voxel import voxel_downsample
from loam_velodyne_tpu.types import PointSet, RingGrid

Array = jax.Array

LABEL_SHARP = 2
LABEL_LESS_SHARP = 1
LABEL_NEUTRAL = 0
LABEL_FLAT = -1


class SweepFeatures(NamedTuple):
    """The four feature clouds of one sweep (reference publish set,
    ScanRegistration.cpp:152-156)."""

    sharp: PointSet
    less_sharp: PointSet
    flat: PointSet
    less_flat: PointSet
    # () int32 — candidate points / voxel cells lost to fixed capacities
    # (pool compaction + less-flat voxel output); overflow telemetry.
    dropped: Array = None


def ring_curvature(xyz: Array, count: Array, c_region: int) -> Tuple[Array, Array]:
    """Windowed curvature per point of one ring row.

    curvature_i = || sum_{j in [-C, C]} p_{i+j} - (2C+1) p_i ||^2
    (equivalent to the reference's accumulated differences,
    BasicScanRegistration.cpp:296-307). Returns (curvature, valid_mask);
    valid for i in [C, count-1-C] on rings with count-1 > 2C.
    """
    p_cap = xyz.shape[0]
    c = c_region
    pad = jnp.zeros((c, 3), xyz.dtype)
    xp = jnp.concatenate([pad, xyz, pad], axis=0)
    cs = jnp.concatenate([jnp.zeros((1, 3), xyz.dtype),
                          jnp.cumsum(xp, axis=0)], axis=0)
    # window(i) = sum xp[i .. i+2C] = sum xyz[i-C .. i+C]
    window = cs[2 * c + 1:] - cs[:-(2 * c + 1)]
    diff = window - (2 * c + 1) * xyz
    curv = jnp.sum(diff * diff, axis=-1)
    idx = jnp.arange(p_cap)
    e = count - 1
    active = e > 2 * c
    valid = active & (idx >= c) & (idx <= e - c)
    return curv, valid


def ring_rejection_mask(xyz: Array, count: Array, c_region: int) -> Array:
    """Initial neighbor-picked mask: occluded-edge and parallel-beam
    points (reference setScanBuffersFor, BasicScanRegistration.cpp:321-363).

    Returns a (P,) bool mask of points excluded from feature picking.
    """
    p_cap = xyz.shape[0]
    c = c_region
    idx = jnp.arange(p_cap)
    e = count - 1

    nxt = jnp.concatenate([xyz[1:], jnp.zeros((1, 3), xyz.dtype)], axis=0)
    prv = jnp.concatenate([jnp.zeros((1, 3), xyz.dtype), xyz[:-1]], axis=0)
    d_next2 = jnp.sum((nxt - xyz) ** 2, axis=-1)
    d_prev2 = jnp.sum((xyz - prv) ** 2, axis=-1)
    depth = jnp.sqrt(jnp.sum(xyz * xyz, axis=-1))
    depth_n = jnp.sqrt(jnp.sum(nxt * nxt, axis=-1))
    dis2 = jnp.sum(xyz * xyz, axis=-1)

    in_scan = (idx >= c) & (idx <= e - c - 1)

    big_gap = d_next2 > 0.1
    nearer_next = depth > depth_n
    safe_depth = jnp.maximum(depth, 1e-12)
    safe_depth_n = jnp.maximum(depth_n, 1e-12)
    # ||p_next - p * (dn/d)|| / dn   (occlusion where current is farther)
    wd_a = jnp.sqrt(jnp.sum((nxt - xyz * (safe_depth_n / safe_depth)[:, None]) ** 2,
                            axis=-1)) / safe_depth_n
    # ||p - p_next * (d/dn)|| / d    (occlusion where next is farther)
    wd_b = jnp.sqrt(jnp.sum((xyz - nxt * (safe_depth / safe_depth_n)[:, None]) ** 2,
                            axis=-1)) / safe_depth

    occ_a = in_scan & big_gap & nearer_next & (wd_a < 0.1)          # mark [i-C, i]
    occ_b = in_scan & big_gap & ~nearer_next & (wd_b < 0.1)         # mark [i+1, i+C+1]
    # Branch A 'continue' skips the parallel-beam check for that i.
    parallel = (in_scan & ~occ_a
                & (d_next2 > 0.0002 * dis2) & (d_prev2 > 0.0002 * dis2))

    # Scatter-OR of index intervals via a difference array.
    dif = jnp.zeros((p_cap + c + 2,), jnp.int32)
    add = occ_a.astype(jnp.int32)
    dif = dif.at[jnp.maximum(idx - c, 0)].add(add)
    dif = dif.at[idx + 1].add(-add)
    add = occ_b.astype(jnp.int32)
    dif = dif.at[idx + 1].add(add)
    dif = dif.at[idx + c + 2].add(-add)
    add = parallel.astype(jnp.int32)
    dif = dif.at[idx].add(add)
    dif = dif.at[idx + 1].add(-add)
    return jnp.cumsum(dif)[:p_cap] > 0


def suppression_extents(xyz: Array, count: Array, c_region: int) -> Tuple[Array, Array]:
    """Per-point left/right suppression run lengths for markAsPicked.

    The reference walk (BasicScanRegistration.cpp:367-386) extends up to
    C steps each way but stops at the first consecutive-point squared
    gap > 0.05. That break depends only on geometry, so the extents are
    precomputed: step_ok[i] is the edge (i, i+1) being continuous, and
    the extent is the run length of ok edges (unrolled, C is small).
    """
    p_cap = xyz.shape[0]
    c = c_region
    idx = jnp.arange(p_cap)
    nxt = jnp.concatenate([xyz[1:], jnp.zeros((1, 3), xyz.dtype)], axis=0)
    gap2 = jnp.sum((nxt - xyz) ** 2, axis=-1)
    step_ok = (gap2 <= 0.05) & (idx + 1 <= count - 1)   # edge i <-> i+1

    def shift_right(a, k):  # a[i+k], False beyond
        return jnp.concatenate([a[k:], jnp.zeros((k,), bool)])

    def shift_left(a, k):   # a[i-k], False before
        return jnp.concatenate([jnp.zeros((k,), bool), a[:-k]])

    right = jnp.zeros((p_cap,), jnp.int32)
    run = jnp.ones((p_cap,), bool)
    for r in range(c):
        run = run & shift_right(step_ok, r)
        right = right + run.astype(jnp.int32)

    left = jnp.zeros((p_cap,), jnp.int32)
    run = jnp.ones((p_cap,), bool)
    for r in range(1, c + 1):
        run = run & shift_left(step_ok, r)
        left = left + run.astype(jnp.int32)

    return left, right


def region_bounds(count: Array, c_region: int, n_regions: int) -> Tuple[Array, Array]:
    """Integer region boundaries [sp_j, ep_j] within a ring row.

    Row-local form of the reference's global-index arithmetic
    (BasicScanRegistration.cpp:179-183); exact because the global start
    offset factors out of the integer division.
    """
    j = jnp.arange(n_regions)
    e = count - 1
    c = c_region
    sp = (c * (n_regions - j) + (e - c) * j) // n_regions
    ep = (c * (n_regions - 1 - j) + (e - c) * (j + 1)) // n_regions - 1
    return sp, ep


def _greedy_pick(cand_idx: Array, cand_ok: Array, curv: Array,
                 picked0: Array, left_ext: Array, right_ext: Array,
                 threshold: float, quota: int, sharp_quota: int,
                 is_corner: bool) -> Tuple[Array, Array]:
    """Greedy suppressed pick over sorted candidates of ONE region.

    Returns (labels, newly_suppressed). Corner labels: 2 for the first
    ``sharp_quota`` picks, 1 after; flat label: -1.
    (reference BasicScanRegistration.cpp:196-243)
    """
    p_cap = curv.shape[0]
    idx = jnp.arange(p_cap)
    k_cap = cand_idx.shape[0]

    def body(k, carry):
        picked, labels, n_picked = carry
        i = cand_idx[k]
        if is_corner:
            passes = curv[i] > threshold
        else:
            passes = curv[i] < threshold
        eligible = cand_ok[k] & ~picked[i] & passes & (n_picked < quota)
        n_new = n_picked + eligible.astype(jnp.int32)
        if is_corner:
            lab = jnp.where(n_new <= sharp_quota, LABEL_SHARP, LABEL_LESS_SHARP)
        else:
            lab = jnp.full((), LABEL_FLAT, jnp.int32)
        labels = labels.at[i].set(jnp.where(eligible, lab, labels[i]))
        lo = i - left_ext[i]
        hi = i + right_ext[i]
        newmark = (idx >= lo) & (idx <= hi) & eligible
        return picked | newmark, labels, n_new

    picked, labels, _ = jax.lax.fori_loop(
        0, k_cap, body,
        (picked0, jnp.zeros((p_cap,), jnp.int32), jnp.zeros((), jnp.int32)))
    return labels, picked & ~picked0


def _ring_labels(xyz: Array, count: Array, reg: RegistrationConfig
                 ) -> Tuple[Array, Array]:
    """Labels + in-region mask for one ring. vmapped over rings."""
    p_cap = xyz.shape[0]
    c = reg.curvature_region
    idx = jnp.arange(p_cap)

    curv, curv_valid = ring_curvature(xyz, count, c)
    rejected = ring_rejection_mask(xyz, count, c)
    left_ext, right_ext = suppression_extents(xyz, count, c)
    sp, ep = region_bounds(count, c, reg.n_feature_regions)
    region_ok = ep > sp                      # reference skips ep <= sp

    in_region = ((idx[None, :] >= sp[:, None]) & (idx[None, :] <= ep[:, None])
                 & region_ok[:, None] & curv_valid[None, :])   # (J, P)

    picked0 = rejected

    def corner_region(reg_mask):
        scores = jnp.where(reg_mask & ~picked0, curv, -jnp.inf)
        top, cand = jax.lax.top_k(scores, reg.corner_scan_cap)
        return _greedy_pick(cand, jnp.isfinite(top), curv, picked0,
                            left_ext, right_ext,
                            reg.surface_curvature_threshold,
                            reg.max_corner_less_sharp, reg.max_corner_sharp,
                            is_corner=True)

    corner_labels, corner_marks = jax.vmap(corner_region)(in_region)
    labels = jnp.max(corner_labels, axis=0)                  # regions disjoint
    picked1 = picked0 | jnp.any(corner_marks, axis=0)

    def flat_region(reg_mask):
        scores = jnp.where(reg_mask & ~picked1, -curv, -jnp.inf)
        top, cand = jax.lax.top_k(scores, reg.flat_scan_cap)
        return _greedy_pick(cand, jnp.isfinite(top), curv, picked1,
                            left_ext, right_ext,
                            reg.surface_curvature_threshold,
                            reg.max_surface_flat, 0, is_corner=False)

    flat_labels, _ = jax.vmap(flat_region)(in_region)
    labels = labels + jnp.min(flat_labels, axis=0)           # -1 never overlaps picks

    any_region = jnp.any(in_region, axis=0)
    return labels, any_region


def _all_labels_pallas(grid: RingGrid, reg: RegistrationConfig
                       ) -> Tuple[Array, Array]:
    """Batched (ring x region) greedy labeling through the Pallas kernel
    (ops/pallas_greedy.py): the whole suppressed pick loop runs inside
    one Mosaic program instead of ~160 XLA while-loop dispatches.

    Each (ring, region) row is processed in a WINDOW of the ring
    (region span + the +-curvature_region mark spill, lane-aligned)
    instead of the full ring width: a region covers only ~P/J columns,
    so full-width rows made every sequential pick step ~J times more
    expensive than the work it did (HDL-64E: (384, 2304) state for
    383-point regions — the kernel profiled at 1.9 ms/sweep, ~4.5x the
    windowed cost). Windows are contiguous dynamic slices (PERF.md §1);
    results scatter back by one vmapped dynamic_update_slice into
    per-region lanes summed over regions — exact, because regions are
    disjoint and a window always contains its region's full mark reach
    (off <= sp - C and off + W > ep + C by construction).
    """
    from loam_velodyne_tpu.ops.pallas_greedy import greedy_pick_rows

    r, p = grid.xyz.shape[:2]
    j = reg.n_feature_regions
    c = reg.curvature_region

    curv, curv_valid = jax.vmap(
        lambda x, n: ring_curvature(x, n, c))(grid.xyz, grid.count)
    rejected = jax.vmap(
        lambda x, n: ring_rejection_mask(x, n, c))(grid.xyz, grid.count)
    left_ext, right_ext = jax.vmap(
        lambda x, n: suppression_extents(x, n, c))(grid.xyz, grid.count)
    sp, ep = jax.vmap(
        lambda n: region_bounds(n, c, reg.n_feature_regions))(grid.count)
    region_ok = ep > sp                                    # (R, J)

    rows = r * j
    # Window width: the longest possible region (count = P) plus the
    # +-C suppression spill, rounded up to the 128-lane tile.
    max_len = (p - 1 - 2 * c + j - 1) // j + 1
    w = min(((max_len + 2 * c + 127) // 128) * 128, p)
    off = jnp.clip(sp - c, 0, p - w).astype(jnp.int32)     # (R, J)
    off_flat = off.reshape(rows)
    ring_row = jnp.repeat(jnp.arange(r, dtype=jnp.int32), j)

    def win(a):
        """(R, P) -> (rows, W): each (ring, region) row's window, as a
        vmapped 2D dynamic_slice — ONE gather-of-blocks kernel straight
        from the (R, P) source (no (rows, P) broadcast materializes)."""
        return jax.vmap(
            lambda rr, o: jax.lax.dynamic_slice(a, (rr, o), (1, w))[0]
        )(ring_row, off_flat)

    def place_sum(vals_w):
        """(rows, W) -> (R, P): re-position windows at their offsets and
        sum over the region axis. Built as pad + vmapped dynamic_slice —
        a GATHER of contiguous blocks — because the scatter dual
        (vmapped dynamic_update_slice) profiled at ~0.9 ms per call on
        HDL-64E where this form is ~10x cheaper (PERF.md §1: re-tile
        anything shaped like random-offset writes into contiguous
        reads). Exact for region-disjoint values (labels, in-region
        flags); summed mark spill is thresholded >0 by the caller."""
        padded = jnp.pad(vals_w, ((0, 0), (p, p)))
        placed = jax.vmap(
            lambda row, o: jax.lax.dynamic_slice(row, (p - o,), (p,))
        )(padded, off_flat)
        return jnp.sum(placed.reshape(r, j, p), axis=1)

    curv_w = win(curv)
    left_w = win(left_ext)
    right_w = win(right_ext)
    picked0_w = win(rejected)

    col_w = off_flat[:, None] + jnp.arange(w, dtype=jnp.int32)[None, :]
    sp_f, ep_f = sp.reshape(rows), ep.reshape(rows)
    in_region_w = ((col_w >= sp_f[:, None]) & (col_w <= ep_f[:, None])
                   & region_ok.reshape(rows)[:, None] & win(curv_valid))

    def candidates(scores, cap):
        top, cand = jax.lax.top_k(scores, cap)
        ok = jnp.isfinite(top)
        pad = (-cap) % 128
        if pad:
            cand = jnp.pad(cand, ((0, 0), (0, pad)))
            ok = jnp.pad(ok, ((0, 0), (0, pad)))
        return cand, ok

    # corners
    scores = jnp.where(in_region_w & ~picked0_w, curv_w, -jnp.inf)
    cand, ok = candidates(scores, reg.corner_scan_cap)
    corner_labels_w, corner_marks_w = greedy_pick_rows(
        curv_w, cand, ok, picked0_w, left_w, right_w,
        reg.surface_curvature_threshold, reg.max_corner_less_sharp,
        reg.max_corner_sharp, True, n_steps=reg.corner_scan_cap)
    # One reconstruction for labels AND marks: labels ride the low bits
    # (region-disjoint, values 0..2), the mark spill rides bit 2+ (its
    # cross-window overlap sums to at most 2).
    packed = place_sum(corner_labels_w + 4 * corner_marks_w.astype(jnp.int32))
    labels = packed % 4
    picked1 = rejected | (packed >= 4)

    # flats
    picked1_w = win(picked1)
    scores = jnp.where(in_region_w & ~picked1_w, -curv_w, -jnp.inf)
    cand, ok = candidates(scores, reg.flat_scan_cap)
    flat_labels_w, _ = greedy_pick_rows(
        curv_w, cand, ok, picked1_w, left_w, right_w,
        reg.surface_curvature_threshold, reg.max_surface_flat, 0, False,
        n_steps=reg.flat_scan_cap)
    labels = labels + place_sum(flat_labels_w)

    idx = jnp.arange(p)
    any_region = jnp.any(
        (idx[None, None, :] >= sp[:, :, None])
        & (idx[None, None, :] <= ep[:, :, None]) & region_ok[:, :, None],
        axis=1) & curv_valid
    return labels, any_region


def _assemble_features(grid: RingGrid, labels: Array, in_region: Array,
                       reg: RegistrationConfig, caps: Capacities
                       ) -> SweepFeatures:
    """Feature clouds straight from the labeled grid.

    Replaces the former full-grid class-ordered compaction sort (a
    6-operand stable sort over all R*P rows — 147k on HDL-64E, the
    single widest pass of the feature stage) with quota-shaped work:

    - sharp / less-sharp / flat points are bounded per (ring, region)
      by the greedy quotas, so each cloud is extracted by one
      ``lax.top_k`` over the region WINDOWS (ascending-column scores —
      azimuth order within a region, so the assembled order is exactly
      the ring-major azimuth order the class sort produced) followed by
      a quota-sized row gather and a small front-pack sort at the
      cloud's own capacity (<= 7.8k rows vs R*P).
    - the less-flat candidate pool (everything in-region that is not a
      corner, reference BasicScanRegistration.cpp:245-252) is NOT
      compacted at all: ``voxel_downsample`` re-sorts by cell identity
      anyway, so the grid feeds it directly with a candidate mask and
      the former pool capacity/truncation (and its telemetry) vanishes
      — strictly more faithful (the reference never drops candidates).
    """
    r, p = labels.shape
    j = reg.n_feature_regions
    c = reg.curvature_region
    sp, ep = jax.vmap(lambda n: region_bounds(n, c, j))(grid.count)
    region_ok = ep > sp
    rows = r * j
    max_len = (p - 1 - 2 * c + j - 1) // j + 1
    w = min(((max_len + 2 * c + 127) // 128) * 128, p)
    off = jnp.clip(sp - c, 0, p - w).astype(jnp.int32)     # (R, J)
    off_flat = off.reshape(rows)
    ring_row = jnp.repeat(jnp.arange(r, dtype=jnp.int32), j)

    def win(a):
        return jax.vmap(
            lambda rr, o: jax.lax.dynamic_slice(a, (rr, o), (1, w))[0]
        )(ring_row, off_flat)

    labels_w = win(labels)
    valid_w = win(in_region & grid.mask)
    wincol = jnp.arange(w, dtype=jnp.int32)
    col_w = off_flat[:, None] + wincol[None, :]
    own = (valid_w & (col_w >= sp.reshape(rows)[:, None])
           & (col_w <= ep.reshape(rows)[:, None])
           & region_ok.reshape(rows)[:, None])

    n = r * p
    flat_xyz = grid.xyz.reshape(n, 3)
    flat_rel = grid.rel.reshape(n)

    def cloud(match: Array, quota: int, capacity: int):
        # Ascending-column scores: top_k returns each region's matches
        # in azimuth order (scores are distinct; zero = no match).
        score = jnp.where(match, w - wincol[None, :], 0)
        top, kidx = jax.lax.top_k(score, quota)            # (rows, q)
        ok = top > 0
        gidx = ring_row[:, None] * p + off_flat[:, None] + kidx
        gidx = jnp.where(ok, gidx, 0).reshape(-1)
        xyz = flat_xyz[gidx]                               # (rows*q, 3)
        rel = flat_rel[gidx]
        ring_col = jnp.repeat(ring_row, quota).astype(jnp.float32)
        okf = ok.reshape(-1)
        n_rows = rows * quota
        # Front-pack at the cloud's own capacity (downstream consumers
        # rely on front-packed masks); stable on the row order, which
        # is already ring-major / region-major / azimuth-ascending.
        _, x_s, y_s, z_s, rel_s, ring_s = jax.lax.sort(
            ((~okf).astype(jnp.int32), xyz[:, 0], xyz[:, 1], xyz[:, 2],
             rel, ring_col), num_keys=1, is_stable=True)
        if capacity > n_rows:
            pad = (0, capacity - n_rows)
            x_s, y_s, z_s, rel_s, ring_s = (
                jnp.pad(a, pad) for a in (x_s, y_s, z_s, rel_s, ring_s))
        count = jnp.sum(okf.astype(jnp.int32))
        m = jnp.arange(capacity) < jnp.minimum(count, capacity)
        xyz_o = jnp.stack([x_s[:capacity], y_s[:capacity], z_s[:capacity]],
                          axis=1)
        ps = PointSet(xyz=jnp.where(m[:, None], xyz_o, 0.0),
                      rel=jnp.where(m, rel_s[:capacity], 0.0),
                      ring=jnp.where(m, ring_s[:capacity].astype(jnp.int32),
                                     0),
                      mask=m)
        return ps, jnp.maximum(count - capacity, 0)

    sharp, d_sharp = cloud(own & (labels_w == LABEL_SHARP),
                           reg.max_corner_sharp, caps.sharp)
    less_sharp, d_lsharp = cloud(own & (labels_w >= LABEL_LESS_SHARP),
                                 reg.max_corner_less_sharp, caps.less_sharp)
    flat, d_flat = cloud(own & (labels_w == LABEL_FLAT),
                         reg.max_surface_flat, caps.flat)

    # Less-flat candidates: in-region, valid, not a corner (includes
    # flat picks, reference labels <= 0). The grid IS the pool.
    cand = (in_region & grid.mask & (labels < LABEL_LESS_SHARP)).reshape(n)
    pool = PointSet(xyz=flat_xyz, rel=flat_rel,
                    ring=jnp.repeat(jnp.arange(r, dtype=jnp.int32), p),
                    mask=cand)
    less_flat, voxel_dropped = voxel_downsample(
        pool, reg.less_flat_filter_size, caps.less_flat,
        per_ring=True, return_dropped=True)
    return SweepFeatures(sharp=sharp, less_sharp=less_sharp, flat=flat,
                         less_flat=less_flat,
                         dropped=d_sharp + d_lsharp + d_flat + voxel_dropped)


def extract_features(grid: RingGrid, reg: RegistrationConfig,
                     caps: Capacities) -> SweepFeatures:
    """Full-sweep feature extraction over the ring grid."""
    if jax.default_backend() in ("tpu", "axon"):
        labels, in_region = _all_labels_pallas(grid, reg)
    else:
        labels, in_region = jax.vmap(lambda x, n: _ring_labels(x, n, reg))(
            grid.xyz, grid.count)
    return _assemble_features(grid, labels, in_region, reg, caps)
