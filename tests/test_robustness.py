"""Robustness integration tests: map recentering under real motion and
sensor dropouts mid-sequence."""

import dataclasses

import numpy as np
import jax
import pytest

from loam_velodyne_tpu.config import LoamConfig, MappingConfig
from loam_velodyne_tpu.eval.metrics import ate_rmse
from loam_velodyne_tpu.io import synthetic
from loam_velodyne_tpu.io.driver import LoamDriver


@pytest.mark.slow
def test_recenter_fires_during_run():
    """Shrunken cube grid so the rolling window actually recenters
    within a short trajectory (the default 21x11x21 x 50 m grid only
    recenters after ~350 m). Exercises the toroidal clear + window
    shift under live mapping."""
    mapping = MappingConfig(
        cube_size=2.5, grid_width=9, grid_height=5, grid_depth=9,
        center_width=4, center_height=2, center_depth=4,
        recenter_margin=1, neighborhood=1,
        corner_cube_capacity=128, surf_cube_capacity=256,
        corner_stack_capacity=1024, surf_stack_capacity=2048,
        knn_window=256, knn_group=128)
    cfg = LoamConfig.preset("VLP-16", mapping=mapping)

    # recenter needs the sensor cube index to reach 8 of 9: > 8.75 m of
    # forward travel with 2.5 m cubes (margin 1, center 4)
    traj = synthetic.straight_trajectory(speed=5.0, yaw_amp=0.0,
                                         sway_amp=0.0)
    sweeps, gt, _ = synthetic.generate_sequence(22, n_azimuth=900,
                                                traj=traj)
    drv = LoamDriver(cfg, system_delay=0)
    origin0 = np.asarray(drv.state.mapping.origin).copy()
    for pts in sweeps:
        drv.process_sweep(pts)
    origin1 = np.asarray(drv.state.mapping.origin)

    # ~8.5 m of forward travel: the window must have shifted along the
    # forward (z) axis.
    assert origin1[2] > origin0[2], (origin0, origin1)
    est = drv.positions()
    assert np.isfinite(est).all()
    assert ate_rmse(est, gt, align=True) < 0.5


@pytest.mark.slow
def test_empty_sweep_dropout_does_not_poison_state():
    """A sensor dropout (empty sweep) mid-sequence must not produce
    NaNs or reset the trajectory — the GN gates skip the update and
    the motion prior carries through (reference behavior: the sync
    gate would simply never fire for that sweep)."""
    cfg = LoamConfig.preset("VLP-16")
    sweeps, gt, _ = synthetic.generate_sequence(6, n_azimuth=900)
    sweeps[3] = np.zeros((0, 3), np.float32)   # dropout

    drv = LoamDriver(cfg, system_delay=0)
    for pts in sweeps:
        drv.process_sweep(pts)
    traj = np.stack(drv.trajectory)
    assert np.isfinite(traj).all()
    # recovery: the final pose is still within tolerance of ground truth
    err = np.linalg.norm(traj[-1][3:] - gt[5])
    assert err < 0.4, (traj[-1], gt[5])
