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


def test_static_cadence_chunk_matches_dynamic():
    """run_chunk(static_cadence=True) must produce the same trajectory
    and cadence pattern as the dynamic-cond engine (it is the vmap-safe
    compilation of the same semantics)."""
    import jax
    import jax.numpy as jnp
    from loam_velodyne_tpu.models import engine as engine_mod
    from loam_velodyne_tpu.ops.scan import RawSweep

    cfg = tiny_config()
    rng = np.random.default_rng(3)
    k, cap = 8, 256
    xyz = rng.uniform(-5, 5, (k, cap, 3)).astype(np.float32)
    raws = RawSweep(xyz=jnp.asarray(xyz), mask=jnp.ones((k, cap), bool))

    s_dyn = engine_mod.EngineState.create(cfg)
    s_dyn, o_dyn = jax.jit(lambda s, r: engine_mod.run_chunk(s, r, cfg))(
        s_dyn, raws)

    s_st = engine_mod.EngineState.create(cfg)
    s_st, o_st = jax.jit(lambda s, r: engine_mod.run_chunk(
        s, r, cfg, static_cadence=True))(s_st, raws)

    np.testing.assert_array_equal(np.asarray(o_dyn.mapping_ran),
                                  np.asarray(o_st.mapping_ran))
    np.testing.assert_allclose(np.asarray(o_dyn.odom_pose),
                               np.asarray(o_st.odom_pose), atol=2e-4)
    np.testing.assert_allclose(np.asarray(o_dyn.fused_pose),
                               np.asarray(o_st.fused_pose), atol=2e-3)


def test_batched_static_chunk_runs_and_matches():
    """make_batched_chunk (static cadence) over B replicas of the same
    sequence equals the single-sequence static chunk."""
    import jax
    import jax.numpy as jnp
    from loam_velodyne_tpu.models import engine as engine_mod
    from loam_velodyne_tpu.ops.scan import RawSweep
    from loam_velodyne_tpu.parallel.replay import (make_batched_chunk,
                                                   stack_states)

    cfg = tiny_config()
    rng = np.random.default_rng(4)
    b, k, cap = 2, 4, 256
    xyz1 = rng.uniform(-5, 5, (k, cap, 3)).astype(np.float32)
    raws1 = RawSweep(xyz=jnp.asarray(xyz1), mask=jnp.ones((k, cap), bool))

    s1 = engine_mod.EngineState.create(cfg)
    s1, o1 = jax.jit(lambda s, r: engine_mod.run_chunk(
        s, r, cfg, static_cadence=True))(s1, raws1)

    states = stack_states([engine_mod.EngineState.create(cfg)
                           for _ in range(b)])
    raws_b = RawSweep(
        xyz=jnp.asarray(np.repeat(xyz1[None], b, 0)),
        mask=jnp.ones((b, k, cap), bool))
    bstep = make_batched_chunk(cfg, donate=False)
    states, ob = bstep(states, raws_b)
    for i in range(b):
        np.testing.assert_allclose(np.asarray(ob.fused_pose)[i],
                                   np.asarray(o1.fused_pose), atol=1e-5)
