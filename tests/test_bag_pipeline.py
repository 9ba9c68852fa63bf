"""End-to-end bag replay: synthetic sweeps + IMU written to a rosbag,
replayed through the full pipeline via LoamDriver.run_bag — the
TPU-native twin of the reference's rostest topology
(tests/loam.test.in: rosbag play -> 4 nodes -> record)."""

import numpy as np
import pytest

from loam_velodyne_tpu.config import LoamConfig
from loam_velodyne_tpu.eval.metrics import ate_rmse
from loam_velodyne_tpu.io import synthetic
from loam_velodyne_tpu.io.driver import LoamDriver
from loam_velodyne_tpu.io.rosbag import BagWriter


@pytest.mark.slow
def test_bag_replay_with_imu(tmp_path):
    sweeps, gt, _ = synthetic.generate_sequence(5, n_azimuth=900, speed=1.0)
    path = str(tmp_path / "seq.bag")
    with BagWriter(path) as w:
        for k, pts in enumerate(sweeps):
            t = 1000.0 + 0.1 * k
            # stationary-attitude IMU at 100 Hz through the sweep
            for j in range(10):
                w.write_imu("/imu/data", t + 0.01 * j, (0, 0, 0, 1),
                            (0.0, 0.0, 9.81))
            w.write_cloud("/velodyne_points", t, pts)

    drv = LoamDriver(LoamConfig.preset("VLP-16"), system_delay=0)
    est = drv.run_bag(path, native=False)
    assert len(est) == 5
    assert ate_rmse(est, gt[:5], align=True) < 0.15


@pytest.mark.slow
def test_run_bag_resume_skips_processed(tmp_path):
    """Crash-resume against the same bag: run_bag after resume() skips
    the already-consumed cloud messages (ADVICE round 1: previously the
    restored state was re-fed the whole bag)."""
    sweeps, _, _ = synthetic.generate_sequence(6, n_azimuth=600)
    full = str(tmp_path / "full.bag")
    first3 = str(tmp_path / "first3.bag")
    for path, sel in ((full, sweeps), (first3, sweeps[:3])):
        with BagWriter(path) as w:
            for k, pts in enumerate(sel):
                w.write_cloud("/velodyne_points", 1000.0 + 0.1 * k, pts)

    cfg = LoamConfig.preset("VLP-16")
    ref = LoamDriver(cfg, system_delay=0)
    ref.run_bag(full, native=False)

    ckpt = str(tmp_path / "ck.npz")
    drv = LoamDriver(cfg, system_delay=0, checkpoint_path=ckpt,
                     checkpoint_every=1)
    drv.run_bag(first3, native=False)   # "crash" after 3 sweeps

    drv2 = LoamDriver(cfg, system_delay=0, checkpoint_path=ckpt)
    assert drv2.resume()
    assert drv2.resumed_sweeps == 3
    drv2.run_bag(full, native=False)    # re-fed from the start
    assert len(drv2.trajectory) == 3
    np.testing.assert_allclose(np.stack(drv2.trajectory),
                               np.stack(ref.trajectory[3:]), atol=1e-5)
