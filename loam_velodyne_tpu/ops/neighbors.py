"""Correspondence search: masked brute-force nearest neighbors.

The reference builds nanoflann KD-trees over the previous sweep's
feature clouds and, per query, does a 1-NN lookup plus an index-ordered
walk across neighboring scan rings (BasicLaserOdometry.cpp:246-297 for
corners, :364-441 for surfaces; trees rebuilt per sweep :654-664).

On TPU, tree traversal is hostile (data-dependent branching) while the
feature sets are small (10^2-10^3 corners, 10^3-10^4 surfels), so the
whole search is a masked pairwise-distance problem: one (Q, M) distance
matrix per cloud pair, with the ring-bracket walks expressed as masked
argmins over the same matrix. The reference's ring-major cloud ordering
made "walk the index range" equal "points within +/-2 rings"; here the
ring ids are explicit, so the masks say exactly what the walk meant:

- corner second point: nearest with ring != ring(nn), |dring| <= 2
- surf second point:   nearest with ring == ring(nn), index != nn
- surf third point:    nearest with ring != ring(nn), |dring| <= 2

All candidate gates are 25 m^2 (the reference's minPointSqDis inits).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from loam_velodyne_tpu.types import PointSet

Array = jax.Array

NN_GATE_SQ = 25.0
RING_BRACKET = 2.5


def pairwise_sq_dist(q: Array, p: Array) -> Array:
    """(Q,3) x (M,3) -> (Q,M) squared distances, full f32 on the VPU.

    Kept as three fused (Q,M) broadcast terms rather than a matmul: the
    |q|^2+|p|^2-2qp MXU form loses ~3 decimal digits to bf16 rounding
    and cancellation, which is enough to flip nearest neighbors at the
    sub-meter scales that matter here.
    """
    acc = jnp.zeros((q.shape[0], p.shape[0]), jnp.float32)
    for k in range(3):
        d = q[:, None, k] - p[None, :, k]
        acc = acc + d * d
    return acc


class CornerMatch(NamedTuple):
    j: Array      # (Q,) index of nearest corner in last cloud
    l: Array      # (Q,) index of second line point (different ring)
    valid: Array  # (Q,) both points found within gates


class SurfMatch(NamedTuple):
    j: Array      # (Q,) nearest surfel
    l: Array      # (Q,) second point, same ring
    m: Array      # (Q,) third point, different ring
    valid: Array


def _masked_argmin(d2: Array, mask: Array) -> tuple[Array, Array]:
    d = jnp.where(mask, d2, jnp.inf)
    idx = jnp.argmin(d, axis=1)
    return idx, jnp.take_along_axis(d, idx[:, None], axis=1)[:, 0]


def corner_correspondences(query_xyz: Array, query_mask: Array,
                           last: PointSet,
                           ring_bracket: float = RING_BRACKET) -> CornerMatch:
    """Point-to-line pairs (reference BasicLaserOdometry.cpp:246-302).

    ring_bracket: the reference walks neighbors while their (float) scan
    id stays within closestPointScan +- 2.5 (BasicLaserOdometry.cpp:262,
    OdometryConfig.ring_bracket); with integer ring ids that's
    |dring| <= 2.
    """
    d2 = pairwise_sq_dist(query_xyz, last.xyz)
    j, dj = _masked_argmin(d2, last.mask[None, :])
    ok_j = (dj < NN_GATE_SQ) & query_mask

    ring_j = last.ring[j]                          # (Q,)
    dring = last.ring[None, :] - ring_j[:, None]   # (Q,M)
    bracket = (dring != 0) & (jnp.abs(dring) <= ring_bracket) & last.mask[None, :]
    l, dl = _masked_argmin(d2, bracket)
    ok_l = dl < NN_GATE_SQ
    return CornerMatch(j=j, l=l, valid=ok_j & ok_l)


def surf_correspondences(query_xyz: Array, query_mask: Array,
                         last: PointSet,
                         ring_bracket: float = RING_BRACKET) -> SurfMatch:
    """Point-to-plane tripods (reference BasicLaserOdometry.cpp:364-441)."""
    mcap = last.xyz.shape[0]
    d2 = pairwise_sq_dist(query_xyz, last.xyz)
    j, dj = _masked_argmin(d2, last.mask[None, :])
    ok_j = (dj < NN_GATE_SQ) & query_mask

    ring_j = last.ring[j]
    dring = last.ring[None, :] - ring_j[:, None]
    col = jnp.arange(mcap)[None, :]
    same_ring = (dring == 0) & (col != j[:, None]) & last.mask[None, :]
    diff_ring = (dring != 0) & (jnp.abs(dring) <= ring_bracket) & last.mask[None, :]

    l, dl = _masked_argmin(d2, same_ring)
    m, dm = _masked_argmin(d2, diff_ring)
    valid = ok_j & (dl < NN_GATE_SQ) & (dm < NN_GATE_SQ)
    return SurfMatch(j=j, l=l, m=m, valid=valid)


def _use_pallas_corresp() -> bool:
    import os
    if os.environ.get("LOAM_DISABLE_PALLAS_CORRESP"):   # A/B escape hatch
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def corner_correspondences_fused(query_xyz: Array, query_mask: Array,
                                 last: PointSet,
                                 ring_bracket: float = RING_BRACKET,
                                 interpret: bool = False) -> CornerMatch:
    """``corner_correspondences`` through the fused streaming kernel
    (ops/pallas_corresp.py): identical matches, one VMEM-resident pass
    per argmin instead of HBM-materialized (Q, M) matrices."""
    from loam_velodyne_tpu.ops.pallas_corresp import _corresp_call
    j, dj, l, dl, _, _ = _corresp_call(
        query_xyz, last.xyz, last.ring, last.mask,
        bracket=float(ring_bracket), surf_mode=False, interpret=interpret)
    valid = (dj < NN_GATE_SQ) & query_mask & (dl < NN_GATE_SQ)
    return CornerMatch(j=j, l=l, valid=valid)


def surf_correspondences_fused(query_xyz: Array, query_mask: Array,
                               last: PointSet,
                               ring_bracket: float = RING_BRACKET,
                               interpret: bool = False) -> SurfMatch:
    """``surf_correspondences`` through the fused streaming kernel."""
    from loam_velodyne_tpu.ops.pallas_corresp import _corresp_call
    j, dj, l, dl, m, dm = _corresp_call(
        query_xyz, last.xyz, last.ring, last.mask,
        bracket=float(ring_bracket), surf_mode=True, interpret=interpret)
    valid = ((dj < NN_GATE_SQ) & query_mask
             & (dl < NN_GATE_SQ) & (dm < NN_GATE_SQ))
    return SurfMatch(j=j, l=l, m=m, valid=valid)


def corner_correspondences_auto(query_xyz: Array, query_mask: Array,
                                last: PointSet,
                                ring_bracket: float = RING_BRACKET
                                ) -> CornerMatch:
    if _use_pallas_corresp():
        return corner_correspondences_fused(query_xyz, query_mask, last,
                                            ring_bracket)
    return corner_correspondences(query_xyz, query_mask, last, ring_bracket)


def surf_correspondences_auto(query_xyz: Array, query_mask: Array,
                              last: PointSet,
                              ring_bracket: float = RING_BRACKET
                              ) -> SurfMatch:
    if _use_pallas_corresp():
        return surf_correspondences_fused(query_xyz, query_mask, last,
                                          ring_bracket)
    return surf_correspondences(query_xyz, query_mask, last, ring_bracket)


def knn_sq_dist(query_xyz: Array, query_mask: Array, ref_xyz: Array,
                ref_mask: Array, k: int) -> tuple[Array, Array]:
    """k nearest neighbors by brute force: returns (indices (Q,k),
    sq_dists (Q,k)). Used for small reference sets and as the exactness
    oracle for windowed_knn in tests."""
    d2 = pairwise_sq_dist(query_xyz, ref_xyz)
    d2 = jnp.where(ref_mask[None, :], d2, jnp.inf)
    d2 = jnp.where(query_mask[:, None], d2, jnp.inf)
    neg_top, idx = jax.lax.top_k(-d2, k)
    return idx, -neg_top


_FAR_SENTINEL = 1e8


def _use_pallas_knn() -> bool:
    import os
    if os.environ.get("LOAM_DISABLE_PALLAS_KNN"):   # A/B escape hatch
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


class SortedCloud(NamedTuple):
    """A point cloud sorted along one spatial axis for windowed search.

    Padded points are moved to the far sentinel coordinate instead of
    carrying a mask: their distance to any real query exceeds every
    gate, which spares a (Q, W) boolean gather on the hot path.
    """

    xyz: Array    # (M, 3) sorted by xyz[:, axis]; sentinel rows last
    mask: Array   # (M,)
    keys: Array   # (M,) sort keys (= xyz[:, axis], +inf for padding)
    axis: int


def sort_cloud(xyz: Array, mask: Array, axis: int = 2) -> SortedCloud:
    # Payload-carrying sort: argsort-then-gather costs O(M) random
    # row-gathers (the dominant cost at map-cloud sizes of ~5e4 rows on
    # TPU); lax.sort moves the coordinates through the sort network.
    keys = jnp.where(mask, xyz[:, axis], jnp.inf)
    k_s, x_s, y_s, z_s, m_s = jax.lax.sort(
        (keys, xyz[:, 0], xyz[:, 1], xyz[:, 2], mask.astype(jnp.int32)),
        num_keys=1, is_stable=True)
    mask_s = m_s.astype(bool)
    xyz_s = jnp.where(mask_s[:, None],
                      jnp.stack([x_s, y_s, z_s], axis=1), _FAR_SENTINEL)
    return SortedCloud(xyz=xyz_s, mask=mask_s, keys=k_s, axis=axis)


def windowed_knn(query_xyz: Array, query_mask: Array, ref: SortedCloud,
                 k: int, window: int) -> tuple[Array, Array]:
    """k-NN against an axis-sorted cloud using per-query windows.

    TPU replacement for the mapping stage's per-point KD-tree 5-NN
    (BasicLaserMapping.cpp:669-671, :758-760): each query binary-searches
    its position along the sort axis (searchsorted) and computes exact
    distances only to a contiguous window of ``window`` sorted
    candidates around it. Exact whenever the true k-NN lie within the
    window along the axis — with a 1 m acceptance gate
    (MappingConfig.nn_sq_dist_gate) and map resolution 0.2-0.4 m, a
    window of O(10^3) is conservative; a miss degrades one
    correspondence, not correctness (the gate filters it).

    Returns (indices into the sorted cloud (Q,k), sq_dists (Q,k)).
    """
    m = ref.xyz.shape[0]
    pos = jnp.searchsorted(ref.keys, query_xyz[:, ref.axis])
    start = jnp.clip(pos - window // 2, 0, jnp.maximum(m - window, 0))
    cols = start[:, None] + jnp.arange(window)[None, :]     # (Q, W)
    cand = ref.xyz[cols]                                    # (Q, W, 3)
    d2 = jnp.sum((cand - query_xyz[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(query_mask[:, None], d2, jnp.inf)
    # approx_min_k rides the TPU's hardware top-k unit (~10x faster
    # than a sort-based exact top_k at W~10^3; exact fallback on CPU);
    # recall loss at k=5, W>=256 is negligible next to the 1 m gate.
    top, widx = jax.lax.approx_min_k(d2, k)
    return jnp.take_along_axis(cols, widx, axis=1), top


def tiled_windowed_knn(query_xyz: Array, query_mask: Array, ref: SortedCloud,
                       k: int, window: int, group: int = 128,
                       return_neighbors: bool = False):
    """k-NN against an axis-sorted cloud, tiled for TPU gather economics.

    ``windowed_knn`` issues one gathered row per (query, candidate) —
    Q*W random row-gathers, which profile at ~3 GB/s effective on TPU
    and dominated the whole mapping stage. Here queries are sorted
    along the same axis and processed in groups of ``group`` neighbors
    in sort order; each group reads ONE contiguous window of the
    reference cloud via dynamic_slice (vmapped: a gather of G-sized
    blocks instead of Q*W rows). The distance block (T, G, W) is dense
    VPU work. Results are exact whenever each query's true k-NN lie
    within the shared window (window must cover the group's key spread
    + the acceptance radius; misses are filtered by the caller's gate).

    Returns (indices into the sorted cloud (Q, k), sq_dists (Q, k)) in
    the ORIGINAL query order. With return_neighbors=True additionally
    returns the neighbor coordinates (Q, k, 3), gathered inside the
    per-group windows — a (G, k)-row gather from a window-sized array
    per group instead of a (Q, k)-row random gather from the full
    sorted cloud (the caller's ``ref.xyz[idx]`` was one of the largest
    kernels of the batched mapping program).
    """
    q = query_xyz.shape[0]
    m = ref.xyz.shape[0]
    assert q % group == 0, (q, group)
    t = q // group

    # sort queries along the axis (payload-carrying sort, no gathers);
    # padded queries to the end. The row iota rides along so results can
    # be scattered straight back to the original query order.
    qkeys = jnp.where(query_mask, query_xyz[:, ref.axis], jnp.inf)
    qkeys_sorted, qx, qy, qz, qm, qid = jax.lax.sort(
        (qkeys, query_xyz[:, 0], query_xyz[:, 1], query_xyz[:, 2],
         query_mask.astype(jnp.int32),
         jnp.arange(q, dtype=jnp.int32)), num_keys=1, is_stable=True)
    q_sorted = jnp.stack([qx, qy, qz], axis=1)
    qmask_sorted = qm.astype(bool)

    # one window per group, centered on the group's median key
    med = qkeys_sorted.reshape(t, group)[:, group // 2]
    med = jnp.where(jnp.isfinite(med), med, 0.0)
    pos = jnp.searchsorted(ref.keys, med)
    start = jnp.clip(pos - window // 2, 0, jnp.maximum(m - window, 0))

    windows = jax.vmap(
        lambda s: jax.lax.dynamic_slice(ref.xyz, (s, 0), (window, 3))
    )(start)                                               # (T, W, 3)

    qg = q_sorted.reshape(t, group, 3)
    if _use_pallas_knn():
        # Mosaic kernel: the (G, W) distance tile stays in VMEM and the
        # exact top-k comes out directly — in XLA the tile round-trips
        # HBM between the subtract/square fusion and approx_min_k.
        from loam_velodyne_tpu.ops.pallas_knn import grouped_window_knn
        d2k, colk = grouped_window_knn(qg, windows, k=k)
        top = jnp.where(qmask_sorted[:, None], d2k.reshape(q, k), jnp.inf)
        widx = colk.reshape(q, k)
    else:
        # difference form, not |q|^2 - 2qp + |p|^2: at map-frame
        # coordinate scales (10^2 m) the expanded form's f32
        # cancellation error (~1e-2 m^2) would swamp sub-decimeter
        # neighbor discrimination
        d2 = jnp.zeros((t, group, window), jnp.float32)
        for c in range(3):
            diff = qg[:, :, None, c] - windows[:, None, :, c]
            d2 = d2 + diff * diff
        d2 = jnp.where(qmask_sorted.reshape(t, group)[:, :, None], d2,
                       jnp.inf)
        top, widx = jax.lax.approx_min_k(d2.reshape(q, window), k)
    starts_per_q = jnp.repeat(start, group)
    idx_sorted = starts_per_q[:, None] + widx

    # unsort back to the original query order: one scatter by the
    # carried iota instead of argsort(order) + two gathers
    idx_out = jnp.zeros((q, k), jnp.int32).at[qid].set(idx_sorted)
    d2_out = jnp.full((q, k), jnp.inf, jnp.float32).at[qid].set(top)
    if not return_neighbors:
        return idx_out, d2_out

    nbr = jax.vmap(lambda w, i: w[i])(
        windows, widx.reshape(t, group, k))                # (T, G, k, 3)
    nbr_out = (jnp.zeros((q, k, 3), jnp.float32)
               .at[qid].set(nbr.reshape(q, k, 3)))
    return idx_out, d2_out, nbr_out
