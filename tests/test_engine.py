"""Engine + driver tests: full pipeline, cadence, checkpoint/resume."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from loam_velodyne_tpu.config import LoamConfig
from loam_velodyne_tpu.eval.metrics import ate_rmse
from loam_velodyne_tpu.io import synthetic
from loam_velodyne_tpu.io.driver import LoamDriver
from loam_velodyne_tpu.models import engine as engine_mod
from loam_velodyne_tpu.models import fusion as fusion_mod
from loam_velodyne_tpu.utils import math as lm


CFG = LoamConfig.preset("VLP-16")


def test_fusion_matches_transform_associate(rng):
    st = fusion_mod.FusionState(
        transform_aft=jnp.asarray(rng.uniform(-1, 1, 6), jnp.float32),
        transform_bef=jnp.asarray(rng.uniform(-1, 1, 6), jnp.float32))
    odom = jnp.asarray(rng.uniform(-1, 1, 6), jnp.float32)
    fused = fusion_mod.fuse(st, odom)
    expect = lm.transform_associate_to_map(odom, st.transform_bef,
                                           st.transform_aft)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(expect))


def test_fusion_identity_passthrough():
    st = fusion_mod.FusionState.create()
    odom = jnp.asarray([0.1, -0.2, 0.05, 1.0, 2.0, 3.0], jnp.float32)
    fused = fusion_mod.fuse(st, odom)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(odom),
                               atol=1e-5)


@pytest.mark.slow
def test_engine_cadence_and_driver(tmp_path):
    sweeps, gt, _ = synthetic.generate_sequence(6, n_azimuth=900)
    drv = LoamDriver(CFG, system_delay=0)
    ran = []
    for pts in sweeps:
        outs = drv.process_sweep(pts)
        ran.append(bool(np.asarray(outs.mapping_ran)))
    # io_ratio=2: mapping on sweeps 1, 3, 5 (never the init sweep 0)
    assert ran == [False, True, False, True, False, True]
    assert len(drv.trajectory) == 6
    est = drv.positions()
    assert ate_rmse(est, gt) < 0.25

    # TUM export: 6 lines, parseable
    out = tmp_path / "traj.tum"
    drv.export_tum(str(out))
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 6 and len(lines[0].split()) == 8


@pytest.mark.slow
def test_checkpoint_resume_bitexact(tmp_path):
    sweeps, _, _ = synthetic.generate_sequence(5, n_azimuth=600)

    drv_a = LoamDriver(CFG, system_delay=0)
    for pts in sweeps[:3]:
        drv_a.process_sweep(pts)
    ckpt = str(tmp_path / "state.npz")
    drv_a.save_checkpoint(ckpt)
    for pts in sweeps[3:]:
        drv_a.process_sweep(pts)

    drv_b = LoamDriver(CFG, system_delay=0)
    drv_b.load_checkpoint(ckpt)
    for pts in sweeps[3:]:
        drv_b.process_sweep(pts)

    np.testing.assert_allclose(np.stack(drv_a.trajectory[3:]),
                               np.stack(drv_b.trajectory), atol=1e-6)


@pytest.mark.slow
def test_auto_checkpoint_and_resume(tmp_path):
    """Crash-resume: a driver dies mid-sequence; a fresh driver resumes
    from the auto-checkpoint and finishes with an identical trajectory
    to an uninterrupted run."""
    sweeps, _, _ = synthetic.generate_sequence(4, n_azimuth=600)
    ckpt = str(tmp_path / "auto.npz")

    ref = LoamDriver(CFG, system_delay=0)
    for pts in sweeps:
        ref.process_sweep(pts)

    drv = LoamDriver(CFG, system_delay=0, checkpoint_path=ckpt,
                     checkpoint_every=1)
    for pts in sweeps[:2]:
        drv.process_sweep(pts)
    del drv   # "crash"

    drv2 = LoamDriver(CFG, system_delay=0, checkpoint_path=ckpt)
    assert drv2.resume()
    for pts in sweeps[2:]:
        drv2.process_sweep(pts)
    np.testing.assert_allclose(np.stack(drv2.trajectory),
                               np.stack(ref.trajectory[2:]), atol=1e-6)


def test_system_delay_drops_sweeps():
    sweeps, _, _ = synthetic.generate_sequence(3, n_azimuth=240)
    drv = LoamDriver(CFG, system_delay=2)
    assert drv.process_sweep(sweeps[0]) is None
    assert drv.process_sweep(sweeps[1]) is None
    assert drv.process_sweep(sweeps[2]) is not None
    assert len(drv.trajectory) == 1
