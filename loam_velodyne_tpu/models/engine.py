"""The sweep-step engine: full LOAM pipeline as one jitted program.

The reference runs four OS processes wired by ROS pub/sub
(registration -> odometry -> mapping -> maintenance; see
launch/loam_velodyne.launch:6-22), with message-timestamp gating and
multi-rate decoupling (odometry clouds to mapping every ioRatio=2
frames, LaserOdometry.cpp:320). On TPU the idiomatic shape is one pure
function ``state, outputs = step(state, sweep)`` whose stages stay
resident on device and fuse into a single XLA program; the pub/sub
cadences survive as integer counters inside the carried state, and the
mapping stage runs under ``lax.cond`` on its cadence frames.

One deliberate improvement over the reference: because mapping runs
synchronously inside the step, the fused (integrated) pose on mapping
frames has zero correction latency — the reference's maintenance node
always applies a correction at least one frame stale.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from loam_velodyne_tpu.config import LoamConfig
from loam_velodyne_tpu.models import fusion as fusion_mod
from loam_velodyne_tpu.models import mapping as mapping_mod
from loam_velodyne_tpu.models import odometry as odometry_mod
from loam_velodyne_tpu.ops import scan as scan_mod
from loam_velodyne_tpu.ops.features import extract_features
from loam_velodyne_tpu.types import PointSet
from loam_velodyne_tpu.utils import math as lm

Array = jax.Array


class EngineState(NamedTuple):
    odometry: odometry_mod.OdometryState
    mapping: mapping_mod.MappingState
    fusion: fusion_mod.FusionState
    sweep: Array     # () int32 processed-sweep counter

    @staticmethod
    def create(cfg: LoamConfig) -> "EngineState":
        return EngineState(
            odometry=odometry_mod.OdometryState.create(cfg),
            mapping=mapping_mod.MappingState.create(cfg),
            fusion=fusion_mod.FusionState.create(),
            sweep=jnp.zeros((), jnp.int32),
        )


class EngineOutputs(NamedTuple):
    odom_pose: Array      # (6,) 10 Hz odometry (/laser_odom_to_init)
    mapped_pose: Array    # (6,) latest refined pose (/aft_mapped_to_init)
    fused_pose: Array     # (6,) integrated pose (/integrated_to_init)
    mapping_ran: Array    # () bool — whether mapping ran this sweep


def step(state: EngineState, raw: scan_mod.RawSweep, cfg: LoamConfig,
         imu_window=None) -> Tuple[EngineState, EngineOutputs]:
    """Process one sweep through registration, odometry, mapping (on its
    cadence) and fusion. imu_window: optional ops.imu.ImuWindow with
    timestamps relative to this sweep's start."""
    grid, full = scan_mod.ingest_sweep(raw, cfg.lidar, cfg.registration,
                                       imu_window)
    feats = extract_features(grid, cfg.registration, cfg.capacities)

    if imu_window is not None:
        from loam_velodyne_tpu.ops import imu as imu_ops
        imu_state = imu_ops.sweep_state(imu_window,
                                        cfg.registration.scan_period)
        imu_rpy_blend = (imu_ops.interpolate(imu_window,
                                             jnp.zeros((), jnp.float32))[0],
                         imu_ops.has_data(imu_window))
    else:
        imu_state = None
        imu_rpy_blend = None

    ostate, oouts = odometry_mod.step(state.odometry, feats, cfg, imu_state)

    # Mapping cadence: the reference odometry forwards clouds on frames
    # where frameCount % ioRatio == 1 (LaserOdometry.cpp:320), and never
    # on the init frame.
    io_ratio = cfg.odometry.io_ratio
    mapping_due = ((io_ratio < 2)
                   | (jnp.mod(state.sweep, io_ratio) == 1)) & state.odometry.initialized

    def run_mapping(_):
        mstate, mouts = mapping_mod.step(
            state.mapping, oouts.transform_sum, oouts.corner_cloud,
            oouts.surf_cloud, cfg, imu_rpy_blend)
        fstate = fusion_mod.update_mapping(state.fusion, mouts.transform_aft,
                                           mouts.transform_bef)
        return mstate, fstate

    def skip_mapping(_):
        return state.mapping, state.fusion

    mstate, fstate = jax.lax.cond(mapping_due, run_mapping, skip_mapping, None)

    fused = fusion_mod.fuse(fstate, oouts.transform_sum)

    new_state = EngineState(odometry=ostate, mapping=mstate, fusion=fstate,
                            sweep=state.sweep + 1)
    outs = EngineOutputs(odom_pose=oouts.transform_sum,
                         mapped_pose=fstate.transform_aft,
                         fused_pose=fused,
                         mapping_ran=mapping_due)
    return new_state, outs


def run_chunk(state: EngineState, raws: scan_mod.RawSweep, cfg: LoamConfig
              ) -> Tuple[EngineState, EngineOutputs]:
    """Process K sweeps in one device call via lax.scan.

    raws: RawSweep with leading time axis (K, N, 3)/(K, N). Amortizes
    host->device dispatch over K sweeps — the throughput mode for
    offline replay (the per-sweep mode exists for live/latency use).
    Returns stacked outputs with leading axis K.
    """

    def body(carry, raw):
        new_state, outs = step(carry, raw, cfg)
        return new_state, outs

    return jax.lax.scan(body, state, raws)


def registered_cloud(state: EngineState, raw: scan_mod.RawSweep,
                     cfg: LoamConfig) -> PointSet:
    """Full-resolution sweep registered into the map frame
    (/velodyne_cloud_registered): deskewed to the sweep end with the
    odometry motion (reference LaserOdometry.cpp:326) and projected by
    the mapped pose (transformFullResToMap, BasicLaserMapping.cpp:235-240).
    """
    from loam_velodyne_tpu.models.odometry import ImuSweepState
    _, full = scan_mod.ingest_sweep(raw, cfg.lidar, cfg.registration)
    imu0 = ImuSweepState.zero()
    xyz = lm.transform_to_end(full.xyz, full.rel, state.odometry.transform,
                              imu0.start_rpy, imu0.end_rpy,
                              imu0.shift_from_start)
    xyz = lm.pose_transform_points(state.mapping.transform_aft, xyz)
    return PointSet(xyz=xyz, rel=jnp.zeros_like(full.rel), ring=full.ring,
                    mask=full.mask)
