"""Pallas greedy-pick kernel vs the XLA fori_loop implementation
(interpret mode on CPU; the real kernel runs on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from loam_velodyne_tpu.config import VLP16, RegistrationConfig
from loam_velodyne_tpu.io import synthetic
from loam_velodyne_tpu.ops import features, scan
from loam_velodyne_tpu.ops.pallas_greedy import greedy_pick_rows

REG = RegistrationConfig()


def _fixture_rows():
    sweeps, _, _ = synthetic.generate_sequence(1, n_azimuth=600,
                                               noise_std=0.01)
    pts = sweeps[0]
    cap = 16384
    xyz = np.zeros((cap, 3), np.float32)
    xyz[:len(pts)] = pts
    mask = np.zeros(cap, bool)
    mask[:len(pts)] = True
    grid, _ = scan.ingest_sweep(scan.RawSweep(jnp.asarray(xyz),
                                              jnp.asarray(mask)),
                                VLP16, REG)
    c = REG.curvature_region
    curv, curv_valid = jax.vmap(
        lambda x, n: features.ring_curvature(x, n, c))(grid.xyz, grid.count)
    rejected = jax.vmap(
        lambda x, n: features.ring_rejection_mask(x, n, c))(grid.xyz,
                                                            grid.count)
    left, right = jax.vmap(
        lambda x, n: features.suppression_extents(x, n, c))(grid.xyz,
                                                            grid.count)
    sp, ep = jax.vmap(
        lambda n: features.region_bounds(n, c, REG.n_feature_regions))(
        grid.count)
    idx = jnp.arange(grid.xyz.shape[1])
    in_region = ((idx[None, None, :] >= sp[:, :, None])
                 & (idx[None, None, :] <= ep[:, :, None])
                 & (ep > sp)[:, :, None] & curv_valid[:, None, :])
    return grid, curv, rejected, left, right, in_region


def test_pallas_kernel_matches_xla_loop():
    grid, curv, rejected, left, right, in_region = _fixture_rows()
    r, j, p = in_region.shape
    rows = r * j

    def rep(a):
        return jnp.broadcast_to(a[:, None, :], (r, j, p)).reshape(rows, p)

    curv_r, left_r, right_r = rep(curv), rep(left), rep(right)
    picked0 = rep(rejected)
    scores = jnp.where(in_region.reshape(rows, p) & ~picked0, curv_r,
                       -jnp.inf)
    top, cand = jax.lax.top_k(scores, REG.corner_scan_cap)
    ok = jnp.isfinite(top)

    # pallas (interpreter) path
    pl_labels, pl_marks = greedy_pick_rows(
        curv_r, cand, ok, picked0, left_r, right_r,
        REG.surface_curvature_threshold, REG.max_corner_less_sharp,
        REG.max_corner_sharp, True, interpret=True)

    # XLA reference path, row by row
    def one(args):
        cand_i, ok_i, curv_i, picked_i, left_i, right_i = args
        return features._greedy_pick(
            cand_i, ok_i, curv_i, picked_i, left_i, right_i,
            REG.surface_curvature_threshold, REG.max_corner_less_sharp,
            REG.max_corner_sharp, is_corner=True)

    xla_labels, xla_marks = jax.vmap(
        lambda ci, oi, cu, pi, le, ri: features._greedy_pick(
            ci, oi, cu, pi, le, ri, REG.surface_curvature_threshold,
            REG.max_corner_less_sharp, REG.max_corner_sharp,
            is_corner=True))(cand, ok, curv_r, picked0, left_r, right_r)

    np.testing.assert_array_equal(np.asarray(pl_labels),
                                  np.asarray(xla_labels))
    np.testing.assert_array_equal(np.asarray(pl_marks),
                                  np.asarray(xla_marks))
    assert int(np.asarray(pl_labels).max()) == 2  # fixture has corners


def test_extract_features_pallas_path_matches_fallback(monkeypatch):
    """Force the pallas (interpret) labeling path and compare the final
    feature sets against the XLA fallback path."""
    grid, *_ = _fixture_rows()
    from loam_velodyne_tpu.config import Capacities, MappingConfig
    caps = Capacities.for_lidar(VLP16, REG, MappingConfig())

    feats_xla = features.extract_features(grid, REG, caps)

    import loam_velodyne_tpu.ops.pallas_greedy as pg
    orig = pg.greedy_pick_rows
    monkeypatch.setattr(
        pg, "greedy_pick_rows",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    labels_p, in_region_p = features._all_labels_pallas(grid, REG)

    labels_x, in_region_x = jax.vmap(
        lambda x, n: features._ring_labels(x, n, REG))(grid.xyz, grid.count)
    np.testing.assert_array_equal(np.asarray(labels_p), np.asarray(labels_x))
    np.testing.assert_array_equal(np.asarray(in_region_p),
                                  np.asarray(in_region_x))
