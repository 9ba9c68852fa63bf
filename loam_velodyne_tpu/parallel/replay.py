"""Multi-chip batched replay: shard independent sequences over a mesh.

The reference's only parallelism is its 4-process pipeline on one host
(SURVEY.md §2, "Parallelism strategies"). The TPU-native scaling story
is offline batched replay: the engine step is a pure function of
(state, sweep), so B independent bag segments/trajectories replay as a
vmapped engine sharded over a device mesh — pure data parallelism on
the batch axis riding ICI, no collectives in the step itself (stages
communicate through the carried state, which stays device-resident).

This is what `dryrun_multichip` in __graft_entry__.py exercises, and
what a fleet-scale mapping job would use to chew through a bag archive.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from loam_velodyne_tpu.config import LoamConfig
from loam_velodyne_tpu.models import engine as engine_mod
from loam_velodyne_tpu.ops.scan import RawSweep

Array = jax.Array


def stack_states(states) -> engine_mod.EngineState:
    """Stack B engine states into one batched state (leading axis B)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def make_batched_step(cfg: LoamConfig, mesh: Mesh | None = None,
                      axis: str = "data", donate: bool = True,
                      with_imu: bool = False):
    """jit-compiled batched engine step, optionally sharded over
    ``axis`` of ``mesh``.

    Inputs: batched EngineState (leaves with leading dim B) and a
    batched RawSweep (B, N, 3)/(B, N); with a mesh, B must be divisible
    by the axis size. Without a mesh this is the single-chip throughput
    mode: B independent replicas as one wide vmapped program (hides the
    per-stage sequential latency that bounds single-stream rate).
    with_imu=True adds a third argument: an ops.imu.ImuWindow with a
    leading B axis (per-replica sweep-relative windows).
    """

    if with_imu:
        def step_one(state, raw, win):
            return engine_mod.step(state, raw, cfg, win)
    else:
        def step_one(state, raw):
            return engine_mod.step(state, raw, cfg)

    batched = jax.vmap(step_one)
    dn = (0,) if donate else ()
    if mesh is None:
        return jax.jit(batched, donate_argnums=dn)

    # Shardings must be declared as real in_shardings on the jit (not as
    # with_sharding_constraint inside the traced function): donation is
    # resolved against the *declared* input shardings, and the
    # constraint-inside-jit form leaves the inputs unspecified, so every
    # state leaf — including the (B, 262144, 3) archive — was recopied
    # each dispatch ("Some donated buffers were not usable", round-3
    # weak #2). With matching in/out shardings the batched state aliases
    # in place.
    shard = NamedSharding(mesh, P(axis))
    n_in = 3 if with_imu else 2
    return jax.jit(batched, in_shardings=(shard,) * n_in,
                   out_shardings=(shard, shard), donate_argnums=dn)


def replay_sequences(cfg: LoamConfig, sequences, mesh: Mesh,
                     sweep_capacity: int = 32768) -> np.ndarray:
    """Replay B equal-length sweep sequences in parallel over the mesh.

    sequences: list of B lists of (N_i, 3) float32 arrays.
    Returns fused positions (B, T, 3).
    """
    b = len(sequences)
    t = len(sequences[0])
    assert all(len(s) == t for s in sequences), "sequences must be equal length"

    step = make_batched_step(cfg, mesh)
    states = stack_states([engine_mod.EngineState.create(cfg)
                           for _ in range(b)])

    out_positions = np.zeros((b, t, 3), np.float32)
    for k in range(t):
        xyz = np.zeros((b, sweep_capacity, 3), np.float32)
        mask = np.zeros((b, sweep_capacity), bool)
        for i, seq in enumerate(sequences):
            pts = seq[k][:sweep_capacity]
            xyz[i, :len(pts)] = pts
            mask[i, :len(pts)] = True
        raw = RawSweep(xyz=jnp.asarray(xyz), mask=jnp.asarray(mask))
        states, outs = step(states, raw)
        out_positions[:, k] = np.asarray(outs.fused_pose)[:, 3:]
    return out_positions


def make_batched_chunk(cfg: LoamConfig, donate: bool = True,
                       with_imu: bool = False,
                       static_cadence: bool = True):
    """jit of B sequences x K sweeps per device call: vmap over the
    batch of the on-device lax.scan over sweeps (engine_mod.run_chunk).
    Maximum-throughput single-chip replay: one dispatch per B*K sweeps.
    with_imu=True adds a third argument: an ops.imu.ImuWindow with
    leading (B, K) axes.

    static_cadence defaults to True here: under vmap a ``lax.cond``
    executes BOTH branches, so the dynamic-cadence engine pays the
    mapping stage every sweep and the 5-NN refresh every GN iteration
    (round 1's batch-8 replay ran at 0.55x single-stream). The static
    schedule requires chunks aligned to io_ratio from sweep 0 —
    exactly what offline replay does (BASELINE config #5).
    """

    if with_imu:
        def chunk_one(state, raws, wins):
            return engine_mod.run_chunk(state, raws, cfg, wins,
                                        static_cadence=static_cadence)
    else:
        def chunk_one(state, raws):
            return engine_mod.run_chunk(state, raws, cfg,
                                        static_cadence=static_cadence)

    return jax.jit(jax.vmap(chunk_one),
                   donate_argnums=(0,) if donate else ())


def tiny_config() -> LoamConfig:
    """A miniature config for multi-chip dry runs and CI: same code
    paths, toy shapes."""
    from loam_velodyne_tpu.config import (Capacities, LidarConfig,
                                          MappingConfig, OdometryConfig,
                                          RegistrationConfig)
    lidar = LidarConfig("tiny", -15.0, 15.0, 4, max_points_per_ring=64)
    reg = RegistrationConfig(corner_scan_cap=32, flat_scan_cap=16)
    mapping = MappingConfig(
        grid_width=5, grid_height=3, grid_depth=5,
        center_width=2, center_height=1, center_depth=2,
        recenter_margin=1, neighborhood=1,
        corner_cube_capacity=32, surf_cube_capacity=64,
        corner_stack_capacity=64, surf_stack_capacity=128,
        knn_window=64, knn_group=32,
        archive_capacity=4096, archive_append_budget=256,
        archive_reinstate_budget=256,
        min_surface_map_points=10, min_selected=10)
    odo = OdometryConfig(max_iterations=3, min_surface_points=10)
    return LoamConfig(lidar=lidar, registration=reg, odometry=odo,
                      mapping=mapping)
