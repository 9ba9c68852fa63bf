"""Multi-host (DCN) offline map building.

SURVEY.md §5 maps the reference's communication table onto TPU idioms:
ICI collectives for the single-host batched replay mesh
(parallel/replay.py), **DCN only for multi-host offline map building**.
This module is that DCN story, structured so the design holds on a real
multi-host TPU pod slice and is *provable* on CPUs (two local processes,
`tools/dryrun_dcn.py`):

- **Scale axis = the bag archive.** Replay is pure data parallelism
  over independent sequences (the engine step carries all cross-stage
  state; no collectives inside the step — see parallel/replay.py).
  Multi-host replay therefore shards LANES over the global device set:
  each host feeds only its local lanes
  (``jax.make_array_from_process_local_data``), XLA partitions the
  vmapped engine with zero cross-host traffic in the hot loop, and DCN
  carries exactly two things: (1) the jit executable/compilation
  barrier at startup, and (2) the end-of-run trajectory/map gather.
- **End-of-run merge.** Each lane's trajectory (and optionally its
  surround map) is all-gathered across hosts with
  ``jax.experimental.multihost_utils.process_allgather`` — one DCN
  collective per replay, amortized over the whole bag archive. This is
  the "offline map building" merge: hosts build disjoint map segments
  and the archive-scale artifact is assembled once.

The reference has no distributed story at all (single roscore, 4 OS
processes, TCPROS on localhost — SURVEY §2 "Communication backend");
this module is the rebuild's scale-out path, not a port.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from loam_velodyne_tpu.config import LoamConfig
from loam_velodyne_tpu.models import engine as engine_mod
from loam_velodyne_tpu.ops.scan import RawSweep
from loam_velodyne_tpu.parallel.replay import (make_batched_chunk,
                                               stack_states)


def init(coordinator: str, num_processes: int, process_id: int) -> None:
    """Join the jax.distributed cluster (DCN control plane). For CPU
    dryruns set JAX_PLATFORMS=cpu and
    XLA_FLAGS=--xla_force_host_platform_device_count=K in the process
    environment BEFORE importing jax-touching modules (each process
    then contributes K virtual devices)."""
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def global_lane_mesh(axis: str = "lane") -> Mesh:
    """One mesh over every device of every host, lanes sharded across
    all of them. Device order groups each host's devices contiguously,
    so a lane never straddles hosts and the engine's carried state
    stays host-local (DCN sees no per-sweep traffic)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def replay_global(cfg: LoamConfig, local_sequences: Sequence[Sequence[np.ndarray]],
                  mesh: Optional[Mesh] = None, chunk: int = 8,
                  sweep_capacity: Optional[int] = None) -> np.ndarray:
    """Multi-host batched replay: every process calls this with its OWN
    ``local_sequences`` (lists of per-sweep (N, 3) arrays, equal length
    across all hosts); returns the ALL-GATHERED fused positions
    (B_global, T, 3) on every host.

    The hot loop is the same vmapped static-cadence ``run_chunk`` the
    single-host replay uses; the only cross-host communication is the
    final trajectory all-gather (process_allgather over DCN).
    """
    from jax.experimental import multihost_utils

    mesh = mesh or global_lane_mesh()
    axis = mesh.axis_names[0]
    cap = sweep_capacity or cfg.capacities.full_cloud
    b_local = len(local_sequences)
    t = len(local_sequences[0])
    assert all(len(s) == t for s in local_sequences)
    assert t % chunk == 0, "sequence length must be a multiple of chunk"
    b_global = b_local * jax.process_count()
    assert b_global % mesh.size == 0, (
        f"global lanes {b_global} must divide over {mesh.size} devices")

    shard = NamedSharding(mesh, P(axis))

    def globalize(local_np: np.ndarray) -> jax.Array:
        return jax.make_array_from_process_local_data(shard, local_np)

    # Globally-sharded initial state: build local lane states, stack,
    # then lift each leaf into a global array (this process contributes
    # rows [pid*b_local, (pid+1)*b_local)).
    local_states = stack_states([engine_mod.EngineState.create(cfg)
                                 for _ in range(b_local)])
    states = jax.tree_util.tree_map(
        lambda leaf: globalize(np.asarray(leaf)), local_states)

    step = make_batched_chunk(cfg)

    poses: List[np.ndarray] = []
    for s in range(0, t, chunk):
        xyz = np.zeros((b_local, chunk, cap, 3), np.float32)
        mask = np.zeros((b_local, chunk, cap), bool)
        for i, seq in enumerate(local_sequences):
            for j, pts in enumerate(seq[s:s + chunk]):
                n = min(len(pts), cap)
                xyz[i, j, :n] = pts[:n]
                mask[i, j, :n] = True
        raw = RawSweep(xyz=globalize(xyz), mask=globalize(mask))
        states, outs = step(states, raw)
        poses.append(outs.fused_pose)      # (B_global, chunk, 6) sharded

    # One DCN gather at the end: every host receives the full archive's
    # trajectories. addressable_data rows are this host's lanes.
    fused = jnp.concatenate(poses, axis=1)              # (B, T, 6)
    local_rows = np.concatenate(
        [np.asarray(s.data) for s in fused.addressable_shards], axis=0)
    gathered = multihost_utils.process_allgather(local_rows)
    return gathered.reshape(-1, t, 6)[:, :, 3:]
