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
    # () int32 — feature bundles forwarded to mapping so far (drives the
    # stackFrameNum gate, reference BasicLaserMapping.cpp:268-276).
    mapping_inputs: Array

    @staticmethod
    def create(cfg: LoamConfig) -> "EngineState":
        return EngineState(
            odometry=odometry_mod.OdometryState.create(cfg),
            mapping=mapping_mod.MappingState.create(cfg),
            fusion=fusion_mod.FusionState.create(),
            sweep=jnp.zeros((), jnp.int32),
            mapping_inputs=jnp.zeros((), jnp.int32),
        )


class Telemetry(NamedTuple):
    """Per-sweep overflow/shed counters (SURVEY §5: the reference never
    drops data; every fixed-capacity boundary here reports its losses)."""

    ingest_dropped: Array    # () int32 — ring-row capacity
    feature_dropped: Array   # () int32 — less-flat pool/voxel capacity
    mapping: mapping_mod.MapTelemetry


class EngineOutputs(NamedTuple):
    odom_pose: Array      # (6,) 10 Hz odometry (/laser_odom_to_init)
    mapped_pose: Array    # (6,) latest refined pose (/aft_mapped_to_init)
    fused_pose: Array     # (6,) integrated pose (/integrated_to_init)
    mapping_ran: Array    # () bool — whether mapping ran this sweep
    surround_due: Array   # () bool — surround-map publish frame
    #   (reference createDownsizedMap every _mapFrameNum=5 mapping
    #    frames, BasicLaserMapping.cpp:242-264; the driver assembles the
    #    actual cloud on demand when this fires)
    telemetry: Telemetry
    # (29,) f32: every scalar/pose output flattened into ONE device
    # array, so the per-sweep host readback is a single transfer — a
    # pytree device_get fetches leaf-by-leaf, and each small leaf pays
    # its own remote-tunnel round trip on the live path (PERF.md env
    # facts). Layout: odom(0:6) mapped(6:12) fused(12:18)
    # [mapping_ran, surround_due](18:20) telemetry counters(20:28) in
    # Telemetry field order, archive pool cursor(28) — the driver's
    # compaction trigger reads the cursor from here instead of paying a
    # blocking device readback on the live path.
    packed: Array

    @staticmethod
    def pack(odom_pose, mapped_pose, fused_pose, mapping_ran,
             surround_due, tel: "Telemetry", archive_cnt) -> Array:
        flags = jnp.stack([mapping_ran.astype(jnp.float32),
                           surround_due.astype(jnp.float32)])
        counters = jnp.stack([
            tel.ingest_dropped, tel.feature_dropped,
            tel.mapping.cube_corner_dropped, tel.mapping.cube_surf_dropped,
            tel.mapping.stack_corner_dropped, tel.mapping.stack_surf_dropped,
            tel.mapping.active_cube_deficit,
            tel.mapping.archive_reinstated]).astype(jnp.float32)
        return jnp.concatenate([odom_pose, mapped_pose, fused_pose,
                                flags, counters,
                                archive_cnt.astype(jnp.float32)[None]])


def step(state: EngineState, raw: scan_mod.RawSweep, cfg: LoamConfig,
         imu_window=None, mapping_mode: str = "auto",
         static_schedule: bool = False
         ) -> Tuple[EngineState, EngineOutputs]:
    """Process one sweep through registration, odometry, mapping (on its
    cadence) and fusion. imu_window: optional ops.imu.ImuWindow with
    timestamps relative to this sweep's start.

    mapping_mode selects how the mapping cadence is expressed:
      - "auto": runtime ``lax.cond`` on the ioRatio/stackFrameNum gate
        (exact; right for per-sweep and single-stream dispatch, where a
        scalar-predicate cond executes one branch).
      - "on"/"off": the caller has scheduled the cadence STATICALLY
        (run_chunk with static_cadence) — no cond, so a vmapped batch
        doesn't execute both branches every sweep. "on" still assumes
        odometry is initialized (guaranteed when replay starts from
        sweep 0 and io_ratio >= 2; see run_chunk).
    static_schedule: use the fixed GN phase schedules (vmap-safe) in
    odometry and mapping instead of dynamic while_loop + refresh conds.
    """
    grid, full = scan_mod.ingest_sweep(raw, cfg.lidar, cfg.registration,
                                       imu_window)
    feats = extract_features(grid, cfg.registration, cfg.capacities)

    if imu_window is not None:
        from loam_velodyne_tpu.ops import imu as imu_ops
        imu_state = imu_ops.sweep_state(imu_window,
                                        cfg.registration.scan_period)
        # Mapping blends roll/pitch from the IMU history interpolated at
        # the sweep END (laserOdometryTime + scanPeriod, reference
        # BasicLaserMapping.cpp:171-195), not the sweep start.
        end_t = jnp.float32(cfg.registration.scan_period)
        imu_rpy_blend = (imu_ops.interpolate(imu_window, end_t)[0],
                         imu_ops.has_data(imu_window))
    else:
        imu_state = None
        imu_rpy_blend = None

    ostate, oouts = odometry_mod.step(state.odometry, feats, cfg, imu_state,
                                      static_schedule=static_schedule)

    # Mapping cadence: the reference odometry forwards clouds on frames
    # where frameCount % ioRatio == 1 (LaserOdometry.cpp:320), never on
    # the init frame; mapping additionally processes only every
    # stackFrameNum-th received bundle (BasicLaserMapping.cpp:268-276,
    # first bundle included — _frameCount starts at stackFrameNum-1).
    io_ratio = cfg.odometry.io_ratio
    mapping_input = ((io_ratio < 2)
                     | (jnp.mod(state.sweep, io_ratio) == 1)) & state.odometry.initialized
    stack_num = cfg.mapping.stack_frame_num
    mapping_due = mapping_input & (
        (stack_num < 2) | (jnp.mod(state.mapping_inputs, stack_num) == 0))

    def run_mapping(_):
        mstate, mouts = mapping_mod.step(
            state.mapping, oouts.transform_sum, oouts.corner_cloud,
            oouts.surf_cloud, cfg, imu_rpy_blend,
            static_schedule=static_schedule)
        fstate = fusion_mod.update_mapping(state.fusion, mouts.transform_aft,
                                           mouts.transform_bef)
        return mstate, fstate, mouts.surround_due, mouts.telemetry

    def skip_mapping(_):
        return (state.mapping, state.fusion, jnp.zeros((), bool),
                mapping_mod.MapTelemetry.zero())

    if mapping_mode == "on":
        mstate, fstate, surround_due, map_tel = run_mapping(None)
        mapping_due = jnp.ones((), bool)
    elif mapping_mode == "off":
        mstate, fstate, surround_due, map_tel = skip_mapping(None)
        mapping_due = jnp.zeros((), bool)
    else:
        mstate, fstate, surround_due, map_tel = jax.lax.cond(
            mapping_due, run_mapping, skip_mapping, None)

    fused = fusion_mod.fuse(fstate, oouts.transform_sum)

    new_state = EngineState(
        odometry=ostate, mapping=mstate, fusion=fstate,
        sweep=state.sweep + 1,
        mapping_inputs=state.mapping_inputs + mapping_input.astype(jnp.int32))
    tel = Telemetry(ingest_dropped=grid.dropped,
                    feature_dropped=feats.dropped,
                    mapping=map_tel)
    outs = EngineOutputs(odom_pose=oouts.transform_sum,
                         mapped_pose=fstate.transform_aft,
                         fused_pose=fused,
                         mapping_ran=mapping_due,
                         surround_due=surround_due,
                         telemetry=tel,
                         packed=EngineOutputs.pack(
                             oouts.transform_sum, fstate.transform_aft,
                             fused, mapping_due, surround_due, tel,
                             mstate.archive_cnt))
    return new_state, outs


def run_chunk(state: EngineState, raws: scan_mod.RawSweep, cfg: LoamConfig,
              imu_windows=None, static_cadence: bool = False
              ) -> Tuple[EngineState, EngineOutputs]:
    """Process K sweeps in one device call via lax.scan.

    raws: RawSweep with leading time axis (K, N, 3)/(K, N). Amortizes
    host->device dispatch over K sweeps — the throughput mode for
    offline replay (the per-sweep mode exists for live/latency use).
    imu_windows: optional ops.imu.ImuWindow with a leading K axis (each
    row's timestamps relative to its sweep's start), so IMU-equipped
    replay keeps the throughput path (hector launch case,
    hector_loam_velodyne.launch:11). Returns stacked outputs (K, ...).

    static_cadence=True expresses the mapping cadence in the PROGRAM
    instead of a runtime cond: the chunk is scanned in groups of
    io_ratio sweeps with mapping compiled in only at the cadence
    position, and the GN loops use their fixed phase schedules. This is
    the vmap-safe form batched replay must use (a vmapped lax.cond
    executes BOTH branches — round 1's batched replay paid mapping
    every sweep). Requirements (asserted): K % io_ratio == 0, replay
    starts at an io_ratio boundary from sweep 0 (so the in-chunk
    position determines the cadence), stack_frame_num == 1, and
    io_ratio >= 2 (so the init sweep never lands on a mapping slot).
    """

    if static_cadence:
        io = cfg.odometry.io_ratio
        k = raws.xyz.shape[0]
        assert io >= 2, "static_cadence requires io_ratio >= 2"
        assert cfg.mapping.stack_frame_num == 1, \
            "static_cadence requires stack_frame_num == 1"
        assert k % io == 0, f"chunk length {k} not a multiple of io_ratio {io}"

        def group(x):
            return jax.tree_util.tree_map(
                lambda a: a.reshape((k // io, io) + a.shape[1:]), x)

        def ungroup(x):
            return jax.tree_util.tree_map(
                lambda a: a.reshape((k,) + a.shape[2:]), x)

        xs = (group(raws),) if imu_windows is None \
            else (group(raws), group(imu_windows))

        def body(carry, grp):
            outs = []
            for j in range(io):
                raw_j = jax.tree_util.tree_map(lambda a: a[j], grp[0])
                win_j = None if imu_windows is None else \
                    jax.tree_util.tree_map(lambda a: a[j], grp[1])
                mode = "on" if j == 1 else "off"
                carry, o = step(carry, raw_j, cfg, win_j,
                                mapping_mode=mode, static_schedule=True)
                outs.append(o)
            stacked = jax.tree_util.tree_map(
                lambda *ys: jnp.stack(ys), *outs)
            return carry, stacked

        state, outs = jax.lax.scan(body, state, xs)
        return state, ungroup(outs)

    if imu_windows is None:
        def body(carry, raw):
            return step(carry, raw, cfg)

        return jax.lax.scan(body, state, raws)

    def body_imu(carry, xs):
        raw, win = xs
        return step(carry, raw, cfg, win)

    return jax.lax.scan(body_imu, state, (raws, imu_windows))


def registered_cloud(state: EngineState, raw: scan_mod.RawSweep,
                     cfg: LoamConfig, imu_window=None) -> PointSet:
    """Full-resolution sweep registered into the map frame
    (/velodyne_cloud_registered): IMU-deskewed on ingest like the main
    path, deskewed to the sweep end with the odometry motion and the
    IMU start/end terms (reference transformToEnd,
    BasicLaserOdometry.cpp:58-87, applied to the full-res cloud at
    :651), and projected by the mapped pose (transformFullResToMap,
    BasicLaserMapping.cpp:235-240). imu_window: the SAME window the
    sweep was processed with (round-2 gap: this path hardcoded a zero
    IMU state, silently diverging from the reference when IMU was on).
    """
    from loam_velodyne_tpu.models.odometry import ImuSweepState
    _, full = scan_mod.ingest_sweep(raw, cfg.lidar, cfg.registration,
                                    imu_window)
    if imu_window is not None:
        from loam_velodyne_tpu.ops import imu as imu_ops
        imu0 = imu_ops.sweep_state(imu_window, cfg.registration.scan_period)
    else:
        imu0 = ImuSweepState.zero()
    xyz = lm.transform_to_end(full.xyz, full.rel, state.odometry.transform,
                              imu0.start_rpy, imu0.end_rpy,
                              imu0.shift_from_start)
    xyz = lm.pose_transform_points(state.mapping.transform_aft, xyz)
    return PointSet(xyz=xyz, rel=jnp.zeros_like(full.rel), ring=full.ring,
                    mask=full.mask)
