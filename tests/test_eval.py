"""Trajectory metrics unit tests + odometry-only regression gate."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from loam_velodyne_tpu.config import LoamConfig
from loam_velodyne_tpu.eval.metrics import ate_rmse, rpe_rmse, umeyama_align
from loam_velodyne_tpu.io import synthetic
from loam_velodyne_tpu.models import odometry
from loam_velodyne_tpu.ops import features, scan


def test_ate_zero_for_identical():
    t = np.random.default_rng(0).normal(size=(20, 3))
    assert ate_rmse(t, t) == 0.0
    assert rpe_rmse(t, t) == 0.0


def test_umeyama_undoes_rigid_motion():
    rng = np.random.default_rng(1)
    gt = rng.normal(size=(30, 3))
    ang = 0.7
    r = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    est = gt @ r.T + np.array([1.0, -2.0, 3.0])
    assert ate_rmse(est, gt, align=True) < 1e-9
    assert ate_rmse(est, gt, align=False) > 1.0


@pytest.mark.slow
def test_odometry_only_regression():
    """Regression gate: odometry-only drift on the synthetic corridor.

    Thresholds set from the measured baseline at implementation time
    (ATE 0.13 m, RPE 0.019 m over 10 sweeps); fails on regressions.
    """
    cfg = LoamConfig.preset("VLP-16")
    sweeps, gt, _ = synthetic.generate_sequence(10, n_azimuth=900, speed=1.0)
    state = odometry.OdometryState.create(cfg)

    @jax.jit
    def full_step(state, raw_xyz, raw_mask):
        grid, _ = scan.ingest_sweep(scan.RawSweep(raw_xyz, raw_mask),
                                    cfg.lidar, cfg.registration)
        feats = features.extract_features(grid, cfg.registration,
                                          cfg.capacities)
        return odometry.step(state, feats, cfg)

    cap = 16384
    est = []
    for pts in sweeps:
        xyz = np.zeros((cap, 3), np.float32)
        xyz[:len(pts)] = pts
        mask = np.zeros(cap, bool)
        mask[:len(pts)] = True
        state, outs = full_step(state, jnp.asarray(xyz), jnp.asarray(mask))
        est.append(np.asarray(outs.transform_sum)[3:])
    est = np.stack(est)

    assert ate_rmse(est, gt) < 0.20, ate_rmse(est, gt)
    assert rpe_rmse(est, gt) < 0.03, rpe_rmse(est, gt)
