"""Registered full-res cloud: deskewed + map-projected export."""

import numpy as np
import jax
import pytest

from loam_velodyne_tpu.config import LoamConfig
from loam_velodyne_tpu.io import synthetic
from loam_velodyne_tpu.io.driver import LoamDriver
from loam_velodyne_tpu.models import engine as engine_mod


@pytest.mark.slow
def test_registered_cloud_lands_in_world_frame():
    cfg = LoamConfig.preset("VLP-16")
    traj = synthetic.straight_trajectory(speed=2.0, yaw_amp=0.0,
                                         sway_amp=0.0)
    sweeps, gt, _ = synthetic.generate_sequence(3, n_azimuth=900, traj=traj)
    drv = LoamDriver(cfg, system_delay=0)
    for pts in sweeps:
        drv.process_sweep(pts)

    raw = drv.pad_sweep(sweeps[-1])
    reg = jax.jit(lambda s, r: engine_mod.registered_cloud(s, r, cfg))(
        drv.state, raw)
    xyz = np.asarray(reg.xyz)[np.asarray(reg.mask)]

    # corridor walls are at x = +-4 in the world (LOAM camera) frame;
    # registered points should align with them regardless of sensor
    # motion (walls span the whole corridor)
    left_wall = xyz[np.abs(xyz[:, 0] - 4.0) < 0.3]
    right_wall = xyz[np.abs(xyz[:, 0] + 4.0) < 0.3]
    assert len(left_wall) > 300 and len(right_wall) > 300
    # floor at y = -1.6 (sensor 1.6 m above floor)
    floor = xyz[np.abs(xyz[:, 1] + 1.6) < 0.2]
    assert len(floor) > 500
