"""Mesh-sharded batched replay tests (8-device virtual CPU mesh)."""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from loam_velodyne_tpu.io import synthetic
from loam_velodyne_tpu.parallel.replay import replay_sequences, tiny_config


@pytest.mark.slow
def test_replay_sequences_over_mesh():
    cfg = tiny_config()
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("data",))
    rng = np.random.default_rng(0)
    # 8 tiny random sequences (content irrelevant; exercises sharding)
    seqs = [[rng.uniform(-5, 5, (200, 3)).astype(np.float32)
             for _ in range(3)] for _ in range(8)]
    pos = replay_sequences(cfg, seqs, mesh, sweep_capacity=256)
    assert pos.shape == (8, 3, 3)
    assert np.isfinite(pos).all()


@pytest.mark.slow
def test_engine_is_deterministic():
    """Functional engine => bit-identical reruns (the 'race detection'
    story: there is no shared mutable state to race on)."""
    from loam_velodyne_tpu.config import LoamConfig
    from loam_velodyne_tpu.io.driver import LoamDriver
    sweeps, _, _ = synthetic.generate_sequence(3, n_azimuth=600)
    runs = []
    for _ in range(2):
        drv = LoamDriver(LoamConfig.preset("VLP-16"), system_delay=0)
        for pts in sweeps:
            drv.process_sweep(pts)
        runs.append(np.stack(drv.trajectory))
    np.testing.assert_array_equal(runs[0], runs[1])
