"""KITTI reader tests + HDL-32/HDL-64E configuration smoke tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from loam_velodyne_tpu.config import HDL32, HDL64E, LoamConfig
from loam_velodyne_tpu.io import kitti, synthetic
from loam_velodyne_tpu.io.driver import LoamDriver


def test_kitti_bin_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(1000, 3)).astype(np.float32)
    p = str(tmp_path / "000000.bin")
    kitti.write_velodyne_bin(p, xyz)
    got = kitti.read_velodyne_bin(p)
    np.testing.assert_allclose(got, xyz)

    sweeps, times = kitti.read_sequence(str(tmp_path))
    assert len(sweeps) == 1 and times == [0.0]


def test_kitti_poses(tmp_path):
    # two poses: identity and 5 m forward (z in cam frame)
    rows = np.zeros((2, 12))
    rows[:, 0] = rows[:, 5] = rows[:, 10] = 1.0
    rows[1, 11] = 5.0
    p = str(tmp_path / "poses.txt")
    np.savetxt(p, rows)
    poses = kitti.read_poses(p)
    assert poses.shape == (2, 3, 4)
    pos = kitti.poses_to_loam_positions(poses)
    np.testing.assert_allclose(pos[1], [0, 0, 5.0])


@pytest.mark.slow
@pytest.mark.parametrize("lidar", ["HDL-32", "HDL-64E"])
def test_multilidar_pipeline_smoke(lidar):
    """The full engine compiles and tracks forward motion for the other
    ring geometries (reference MultiScanMapper presets,
    MultiScanRegistration.h:83-89)."""
    cfg = LoamConfig.preset(lidar)
    traj = synthetic.straight_trajectory(speed=2.0, yaw_amp=0.0,
                                         sway_amp=0.0)
    sweeps, gt, _ = synthetic.generate_sequence(
        3, lidar=cfg.lidar, n_azimuth=600, traj=traj)
    drv = LoamDriver(cfg, system_delay=0, sweep_capacity=65536)
    for pts in sweeps:
        outs = drv.process_sweep(pts)
    pose = np.asarray(outs.fused_pose)
    # moved forward ~0.2 m per sweep after init
    assert 0.25 < pose[5] < 0.55, pose
