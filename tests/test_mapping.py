"""Mapping-stage tests: toroidal cube map mechanics, windowed k-NN
exactness, and end-to-end odometry+mapping accuracy on synthetic data."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from loam_velodyne_tpu.config import LoamConfig
from loam_velodyne_tpu.eval.metrics import ate_rmse, rpe_rmse
from loam_velodyne_tpu.io import synthetic
from loam_velodyne_tpu.models import mapping, odometry
from loam_velodyne_tpu.ops import features, neighbors, scan
from loam_velodyne_tpu.types import PointSet


CFG = LoamConfig.preset("VLP-16")
M = CFG.mapping


def test_world_cube_coord_floor_semantics():
    pos = jnp.asarray([[0.0, 0.0, 0.0], [24.9, 25.0, -25.0],
                       [-25.1, 74.9, 75.0]], jnp.float32)
    w = mapping.world_cube_coord(pos, M)
    # floor((p+25)/50): -25.0 -> 0 (the reference's negative fixup only
    # fires strictly below -25), -25.1 -> -1.
    np.testing.assert_array_equal(np.asarray(w),
                                  [[0, 0, 0], [0, 1, 0], [-1, 1, 2]])


def test_recenter_no_move_when_inside():
    origin = jnp.asarray([-10, -5, -10], jnp.int32)
    sensor_w = jnp.asarray([0, 0, 0], jnp.int32)
    new_origin, clear = mapping.recenter(origin, sensor_w, M)
    np.testing.assert_array_equal(np.asarray(new_origin), [-10, -5, -10])
    assert not np.asarray(clear).any()


def test_recenter_clears_entering_band():
    origin = jnp.asarray([-10, -5, -10], jnp.int32)
    # sensor moved to world cube x=8: center index would be 18 >= 21-3,
    # so the window shifts right by 1 and one yz-plane of cubes clears.
    sensor_w = jnp.asarray([8, 0, 0], jnp.int32)
    new_origin, clear = mapping.recenter(origin, sensor_w, M)
    np.testing.assert_array_equal(np.asarray(new_origin), [-9, -5, -10])
    n_cleared = int(np.asarray(clear).sum())
    assert n_cleared == M.grid_height * M.grid_depth
    # cleared storage cells are those aliasing world x = +11 == storage
    # x = 11 mod 21 ... world -10 leaves, its storage col is (-10 % 21) = 11
    cleared_idx = np.flatnonzero(np.asarray(clear))
    xs = cleared_idx % M.grid_width
    assert (xs == (-10) % M.grid_width).all()


def test_scatter_and_assemble_roundtrip(rng):
    state = mapping.MappingState.create(CFG)
    pts = rng.uniform(-40, 40, (256, 3)).astype(np.float32)
    mask = np.ones(256, bool)
    mask[200:] = False
    new_xyz, new_cnt, recv = mapping.scatter_into_cubes(
        state.corner_xyz, state.corner_cnt, jnp.asarray(pts),
        jnp.asarray(mask), state.origin, M)
    assert int(np.asarray(recv).sum()) > 0
    assert int(np.asarray(new_cnt).sum()) == 200

    # all stored points recoverable via the neighborhood assembly around
    # the origin pose
    sidx, valid_fov, in_bounds = mapping.fov_valid_cubes(
        state.origin, jnp.zeros(6, jnp.float32), M)
    xyz, msk = mapping.assemble_map_cloud(new_xyz, new_cnt, sidx, in_bounds)
    got = np.asarray(xyz)[np.asarray(msk)]
    # every point within the 5x5x5 neighborhood (|coord| <= 62.5 m here
    # since all pts are within +-40 m -> cubes -1..1 < neighborhood 2)
    assert got.shape[0] == 200
    got_sorted = got[np.lexsort(got.T)]
    exp_sorted = pts[:200][np.lexsort(pts[:200].T)]
    np.testing.assert_allclose(got_sorted, exp_sorted, atol=1e-6)


def test_scatter_respects_existing_and_capacity(rng):
    state = mapping.MappingState.create(CFG)
    cap = M.corner_cube_capacity
    # overfill one cube: 2 rounds of cap points into the same cube
    pts = rng.uniform(-1, 1, (cap, 3)).astype(np.float32)
    xyz1, cnt1, _ = mapping.scatter_into_cubes(
        state.corner_xyz, state.corner_cnt, jnp.asarray(pts),
        jnp.ones(cap, bool), state.origin, M)
    xyz2, cnt2, _ = mapping.scatter_into_cubes(
        xyz1, cnt1, jnp.asarray(pts), jnp.ones(cap, bool), state.origin, M)
    assert int(np.asarray(cnt1).max()) == cap
    assert int(np.asarray(cnt2).max()) == cap  # capped, not overflowed


def test_windowed_knn_matches_bruteforce(rng):
    ref_pts = rng.uniform(-5, 5, (2048, 3)).astype(np.float32)
    ref_mask = np.ones(2048, bool)
    ref_mask[1900:] = False
    q = rng.uniform(-5, 5, (64, 3)).astype(np.float32)
    qmask = np.ones(64, bool)

    sc = neighbors.sort_cloud(jnp.asarray(ref_pts), jnp.asarray(ref_mask))
    idx_w, d2_w = neighbors.windowed_knn(jnp.asarray(q), jnp.asarray(qmask),
                                         sc, k=5, window=2048)
    idx_b, d2_b = neighbors.knn_sq_dist(jnp.asarray(q), jnp.asarray(qmask),
                                        sc.xyz, sc.mask, k=5)
    # full-size window => exact agreement on distances
    np.testing.assert_allclose(np.sort(np.asarray(d2_w), axis=1),
                               np.sort(np.asarray(d2_b), axis=1), rtol=1e-5)

    # realistic window: 5th-NN distance still near-exact for most queries
    idx_s, d2_s = neighbors.windowed_knn(jnp.asarray(q), jnp.asarray(qmask),
                                         sc, k=5, window=512)
    close = np.isclose(np.asarray(d2_s)[:, 4], np.asarray(d2_b)[:, 4],
                       rtol=1e-3).mean()
    assert close > 0.9, close


def test_tiled_windowed_knn_matches_bruteforce(rng):
    ref_pts = rng.uniform(-5, 5, (2048, 3)).astype(np.float32)
    ref_mask = np.ones(2048, bool)
    ref_mask[1800:] = False
    q = rng.uniform(-4, 4, (256, 3)).astype(np.float32)
    qmask = np.ones(256, bool)
    qmask[250:] = False

    sc = neighbors.sort_cloud(jnp.asarray(ref_pts), jnp.asarray(ref_mask))
    idx_t, d2_t = neighbors.tiled_windowed_knn(
        jnp.asarray(q), jnp.asarray(qmask), sc, k=5, window=2048, group=64)
    idx_b, d2_b = neighbors.knn_sq_dist(jnp.asarray(q), jnp.asarray(qmask),
                                        sc.xyz, sc.mask, k=5)
    # full-size window => exact distances, original query order
    np.testing.assert_allclose(np.sort(np.asarray(d2_t)[:250], axis=1),
                               np.sort(np.asarray(d2_b)[:250], axis=1),
                               rtol=1e-4)
    # padded queries return inf
    assert np.isinf(np.asarray(d2_t)[250:]).all()

    # realistic window still finds the true 5-NN for nearly all queries
    idx_s, d2_s = neighbors.tiled_windowed_knn(
        jnp.asarray(q), jnp.asarray(qmask), sc, k=5, window=512, group=64)
    close = np.isclose(np.asarray(d2_s)[:250, 4],
                       np.asarray(d2_b)[:250, 4], rtol=1e-3).mean()
    assert close > 0.85, close


@pytest.mark.slow
def test_full_pipeline_mapping_improves_odometry():
    cfg = CFG
    sweeps, gt, _ = synthetic.generate_sequence(8, n_azimuth=900, speed=1.0)

    ostate = odometry.OdometryState.create(cfg)
    mstate = mapping.MappingState.create(cfg)

    @jax.jit
    def odo_step(state, raw_xyz, raw_mask):
        grid, _ = scan.ingest_sweep(scan.RawSweep(raw_xyz, raw_mask),
                                    cfg.lidar, cfg.registration)
        feats = features.extract_features(grid, cfg.registration,
                                          cfg.capacities)
        return odometry.step(state, feats, cfg)

    @jax.jit
    def map_step(mstate, pose, corner, surf):
        return mapping.step(mstate, pose, corner, surf, cfg)

    cap = 16384
    est_odo, est_map = [], []
    for pts in sweeps:
        xyz = np.zeros((cap, 3), np.float32)
        xyz[:len(pts)] = pts
        mask = np.zeros(cap, bool)
        mask[:len(pts)] = True
        ostate, oouts = odo_step(ostate, jnp.asarray(xyz), jnp.asarray(mask))
        mstate, mouts = map_step(mstate, oouts.transform_sum,
                                 oouts.corner_cloud, oouts.surf_cloud)
        est_odo.append(np.asarray(oouts.transform_sum)[3:])
        est_map.append(np.asarray(mouts.transform_aft)[3:])

    est_odo = np.stack(est_odo)
    est_map = np.stack(est_map)
    ate_o = ate_rmse(est_odo, gt)
    ate_m = ate_rmse(est_map, gt)
    # mapping should not be (much) worse than raw odometry, and should
    # keep absolute error bounded
    assert ate_m < max(ate_o * 1.2, 0.2), (ate_o, ate_m)
