"""Headline benchmark: VLP-16 full-pipeline throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference runs in real time on a desktop CPU — 10
sweeps/s at scanPeriod 0.1 s (BASELINE.md). vs_baseline is the speedup
over that rate.

Measured modes:
- headline: batched chunked replay — B independent sequences x K sweeps
  per device dispatch (vmap of the static-cadence on-device lax.scan).
  This is the offline replay mode (BASELINE.md config #5) and the
  number the driver records. No max() against the single-stream rate:
  if batching ever regresses below single-stream again, it shows.
- extras: chunked single-stream rate (latency-oriented live mode, one
  sequence, K sweeps/dispatch), per-sweep step latency, trajectory
  accuracy (aligned ATE vs simulator ground truth), and the engine's
  overflow-telemetry drop counts for the run.

Plain `python bench.py` (what the driver runs) ALSO times BASELINE
configs #2-#4 (odometry-only ablation, HDL-32, HDL-64E) and emits one
JSON line per config after the headline line, so the driver artifact
carries the whole BASELINE matrix (VERDICT round 2, task 6).
`--headline-only` skips them.

The benchmark sequence is deliberately non-trivial: range noise
(noise_std=0.005) and a sustained turning trajectory — a noiseless
straight corridor under-tests rotation estimation (VERDICT round 2,
weak 3).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import dataclasses                                        # noqa: E402

from loam_velodyne_tpu.config import LoamConfig          # noqa: E402
from loam_velodyne_tpu.eval.metrics import ate_rmse      # noqa: E402
from loam_velodyne_tpu.io import synthetic               # noqa: E402
from loam_velodyne_tpu.models import engine as engine_mod  # noqa: E402
from loam_velodyne_tpu.ops.scan import RawSweep          # noqa: E402
from loam_velodyne_tpu.parallel.replay import (          # noqa: E402
    make_batched_chunk, stack_states)

CAP = 32768


def stream_cap(sweeps) -> int:
    """128-aligned input padding covering the stream's densest sweep.

    The raw-input capacity N drives the ingest ring sort, the halfPassed
    unwrap and the ring histogram — all O(N) per sweep whether rows are
    real or padding. Sizing N to the stream (like cfg.sized_for_stream
    does for the ring-grid width) is the apples-to-apples config: the
    reference's dynamic clouds only process real points."""
    return max(128, ((max(len(s) for s in sweeps) + 127) // 128) * 128)


def pad_chunk(sweeps, cap=CAP):
    k = len(sweeps)
    xyz = np.zeros((k, cap, 3), np.float32)
    mask = np.zeros((k, cap), bool)
    for i, pts in enumerate(sweeps):
        n = min(len(pts), cap)
        xyz[i, :n] = pts[:n]
        mask[i, :n] = True
    return xyz, mask


def sum_telemetry(outs):
    tel = outs.telemetry
    return {
        "ingest_dropped": int(np.sum(np.asarray(tel.ingest_dropped))),
        "feature_dropped": int(np.sum(np.asarray(tel.feature_dropped))),
        "cube_dropped": int(np.sum(np.asarray(tel.mapping.cube_corner_dropped))
                            + np.sum(np.asarray(tel.mapping.cube_surf_dropped))),
        "stack_dropped": int(np.sum(np.asarray(tel.mapping.stack_corner_dropped))
                             + np.sum(np.asarray(tel.mapping.stack_surf_dropped))),
        "active_cube_deficit": int(np.sum(np.asarray(
            tel.mapping.active_cube_deficit))),
    }


def bench_single_stream(cfg, sweeps, gt, chunk, cap=CAP):
    """Chunked single-stream replay; returns (rate, ate, telemetry)."""
    n_sweeps = len(sweeps)
    chunks = []
    for s in range(0, n_sweeps, chunk):
        cx, cm = pad_chunk(sweeps[s:s + chunk], cap)
        chunks.append(RawSweep(jnp.asarray(cx), jnp.asarray(cm)))

    stream_step = jax.jit(
        lambda s, r: engine_mod.run_chunk(s, r, cfg), donate_argnums=(0,))
    state = engine_mod.EngineState.create(cfg)
    state, outs = stream_step(state, chunks[0])          # warmup/compile
    fused = [np.asarray(outs.fused_pose)]
    tel = sum_telemetry(outs)
    # Dispatch the whole stream asynchronously and block once at the
    # end: a per-chunk readback pays one remote-tunnel round trip per
    # chunk, which dominates (and wildly jitters) the measurement.
    t0 = time.perf_counter()
    for ch in chunks[1:]:
        state, outs = stream_step(state, ch)
        fused.append(outs.fused_pose)
    jax.block_until_ready(fused[-1])
    stream_dt = time.perf_counter() - t0
    fused = [np.asarray(f) for f in fused]
    for k in (t2 := sum_telemetry(outs)):
        tel[k] += t2[k]
    rate = (n_sweeps - chunk) / stream_dt
    est = np.concatenate(fused)[:, 3:]
    ate = ate_rmse(est, gt[:len(est)], align=True)
    return rate, ate, tel


def bench_batched(cfg, sweeps, batch, chunk, cap=CAP):
    """Batched static-cadence replay; returns sweeps/s."""
    n_sweeps = len(sweeps)
    bstep = make_batched_chunk(cfg)
    states = stack_states([engine_mod.EngineState.create(cfg)
                           for _ in range(batch)])
    bchunks = []
    for s in range(0, n_sweeps, chunk):
        cx, cm = pad_chunk(sweeps[s:s + chunk], cap)
        bchunks.append(RawSweep(
            xyz=jnp.asarray(np.repeat(cx[None], batch, 0)),
            mask=jnp.asarray(np.repeat(cm[None], batch, 0))))
    states, outs = bstep(states, bchunks[0])             # warmup/compile
    np.asarray(outs.fused_pose)
    t0 = time.perf_counter()
    for ch in bchunks[1:]:
        states, outs = bstep(states, ch)
    np.asarray(outs.fused_pose)
    thr_dt = time.perf_counter() - t0
    return batch * (n_sweeps - chunk) / thr_dt


def bench_batched_distinct(cfg, n_sweeps, batch, chunk, cap=CAP):
    """Batched replay over B DISTINCT trajectories: per-lane turning
    rates/phases and noise seeds differ, so per-lane cube-map occupancy
    diverges — the realistic fleet-replay case. Identical lanes (the
    headline repeat) keep all B map states congruent and under-measure
    HBM pressure (VERDICT r3, weak #5). Same jitted program as
    bench_batched (same shapes), so no extra compile."""
    lane_sweeps = []
    for b in range(batch):
        traj = synthetic.turning_trajectory(
            speed=1.0,
            yaw_rate=0.05 * (1.0 + 0.4 * b / batch) * (1 if b % 2 else -1),
            sway_freq=0.15 + 0.02 * b)
        sweeps_b, _, _ = synthetic.generate_sequence(
            n_sweeps, n_azimuth=900, speed=1.0, noise_std=0.005, traj=traj)
        lane_sweeps.append(sweeps_b)

    bstep = make_batched_chunk(cfg)
    states = stack_states([engine_mod.EngineState.create(cfg)
                           for _ in range(batch)])
    bchunks = []
    for s in range(0, n_sweeps, chunk):
        per_lane = [pad_chunk(sw[s:s + chunk], cap) for sw in lane_sweeps]
        bchunks.append(RawSweep(
            xyz=jnp.asarray(np.stack([x for x, _ in per_lane])),
            mask=jnp.asarray(np.stack([m for _, m in per_lane]))))
    states, outs = bstep(states, bchunks[0])             # warmup
    np.asarray(outs.fused_pose)
    t0 = time.perf_counter()
    for ch in bchunks[1:]:
        states, outs = bstep(states, ch)
    np.asarray(outs.fused_pose)
    return batch * (n_sweeps - chunk) / (time.perf_counter() - t0)


def bench_live_latency(cfg, sweeps, n=None, cap=CAP):
    """Per-sweep live-mode latency through the driver's double-buffered
    loop (LoamDriver.run_live: sweep N+1's host pad + transfer overlap
    step N's device execution; only the pose readback is on the
    per-sweep critical path): returns (p50_ms, max_ms, attribution).

    attribution decomposes the MAX sweep into the driver's named
    segments (dispatch / stage / consume) and cadence events (surround
    dispatch, archive compaction) so a tail outlier is a named cost,
    not a mystery number (VERDICT r4 task 4)."""
    from loam_velodyne_tpu.io.driver import LoamDriver

    n = len(sweeps) if n is None else n
    drv = LoamDriver(cfg, sweep_capacity=cap, system_delay=0)
    drv.process_sweep(sweeps[0])                        # warmup/compile
    drv._build_surround()       # warm the surround-map program too —
    # run_live honors the surround cadence, and its first invocation
    # mid-loop would otherwise charge a program load to one sweep's
    # latency (seen as a ~1 s max outlier).
    raw = [1e3 * t for t in drv.run_live(sweeps[1:n])]
    lat = sorted(raw)
    i_max = int(np.argmax(raw))
    ev = drv.live_events[i_max]
    attribution = {
        "max_sweep_index": i_max,
        "max_dispatch_ms": round(ev["dispatch_ms"], 1),
        "max_stage_ms": round(ev["stage_ms"], 1),
        "max_consume_ms": round(ev["consume_ms"], 1),
        "max_had_surround": bool(ev["surround"]),
        "max_had_compaction": bool(ev["compact"]),
        "surround_dispatches": drv.metrics.counters["surround_maps"],
        "archive_compactions": drv.metrics.counters["archive_compactions"],
    }
    return lat[len(lat) // 2], lat[-1], attribution


def _finalize_artifact(lines):
    """Write BENCH_LATEST.json and regenerate the doc blocks (README /
    PERF / BASELINE between the BENCH_SYNC markers). Runs only on full
    `python bench.py` invocations — exactly what the driver runs every
    round — so the docs can never silently go stale again
    (tests/test_doc_sync.py enforces the sync; VERDICT r4 task 7)."""
    import glob
    import os
    import re
    repo = os.path.dirname(os.path.abspath(__file__))
    # Highest driver round artifact present when this bench ran: the
    # staleness gate (tests/test_doc_sync.py) compares strictly only
    # when a NEWER driver capture exists — an in-round improvement is
    # allowed to drift from the previous round's numbers.
    seen = [int(m.group(1)) for p in glob.glob(os.path.join(repo, "BENCH_r*.json"))
            if (m := re.search(r"BENCH_r(\d+)\.json$", p))]
    art = {"ts": time.time(), "rounds_seen": max(seen, default=0),
           "lines": lines}
    with open(os.path.join(repo, "BENCH_LATEST.json"), "w") as f:
        json.dump(art, f, indent=1)
    try:
        sys.path.insert(0, os.path.join(repo, "tools"))
        import update_docs
        update_docs.apply(art)
    except Exception as e:                        # doc sync must never
        print(f"doc sync skipped: {e}", file=sys.stderr)   # fail the bench


def main():
    full = "--headline-only" not in sys.argv
    # --set mapping.surf_cube_capacity=1024 ... : dotted config overrides
    # for perf A/B sessions (same syntax as the CLI).
    overrides = []
    argv = sys.argv[1:]
    i = 0
    args = []
    while i < len(argv):
        if argv[i] == "--set":
            overrides.append(argv[i + 1])
            i += 2
        elif argv[i].startswith("--"):
            i += 1
        else:
            args.append(argv[i])
            i += 1
    n_sweeps = int(args[0]) if len(args) > 0 else 48
    batch = int(args[1]) if len(args) > 1 else 8
    chunk = 8
    assert n_sweeps % chunk == 0, "n_sweeps must be a multiple of 8"
    cfg = LoamConfig.preset("VLP-16")
    if overrides:
        from loam_velodyne_tpu.cli import _apply_overrides
        cfg = _apply_overrides(cfg, overrides)

    traj = synthetic.turning_trajectory(speed=1.0)
    sweeps, gt, _ = synthetic.generate_sequence(n_sweeps, n_azimuth=900,
                                                speed=1.0, noise_std=0.005,
                                                traj=traj)

    # Static shapes sized to the stream, not the datasheet maximum
    # (cfg.sized_for_stream docstring): the reference only ever
    # processes real points, so capacity padding is overhead it never
    # pays. Zero-drop telemetry in the emitted extras proves the sized
    # capacities lose nothing on this stream.
    cap = stream_cap(sweeps)
    cfg = cfg.sized_for_stream(cap)

    stream_rate, ate, tel = bench_single_stream(cfg, sweeps, gt, chunk,
                                                cap=cap)
    throughput = bench_batched(cfg, sweeps, batch, chunk, cap=cap)
    distinct = bench_batched_distinct(cfg, n_sweeps, batch, chunk, cap=cap)
    live_p50, live_p99, live_attr = bench_live_latency(cfg, sweeps, cap=cap)

    emitted = []

    def emit(line):
        print(json.dumps(line))
        emitted.append(line)

    # Headline = DISTINCT-lane batched throughput (8 independent
    # trajectories): identical lanes keep the 8 per-lane cube maps
    # congruent and under-measure HBM pressure by ~8% (VERDICT r4
    # weak #7 / task 9) — the fleet-replay number is the honest one.
    emit({
        "metric": "vlp16_full_pipeline_throughput",
        "value": round(distinct, 2),
        "unit": "sweeps/s",
        "vs_baseline": round(distinct / 10.0, 3),
        "extra": {
            "single_stream_sweeps_per_sec": round(stream_rate, 2),
            "single_stream_ms_per_sweep": round(1e3 / max(stream_rate, 1e-9), 1),
            "batched_sweeps_per_sec": round(throughput, 2),
            "batched_distinct_sweeps_per_sec": round(distinct, 2),
            "batch": batch,
            "chunk": chunk,
            "ate_aligned_m": round(ate, 4),
            "live_step_ms_p50": round(live_p50, 1),
            "live_step_ms_max": round(live_p99, 1),
            "live_max_attribution": live_attr,
            "n_sweeps": n_sweeps - chunk,
            "telemetry": tel,
            "device": str(jax.devices()[0]),
        },
    })

    if not full:
        return

    # BASELINE configs #2-#4 (odometry-only, HDL-32, HDL-64E).
    odo_cfg = dataclasses.replace(
        cfg, odometry=dataclasses.replace(cfg.odometry, io_ratio=10 ** 6))
    rate, ate2, _ = bench_single_stream(odo_cfg, sweeps, gt, chunk, cap=cap)
    emit({"metric": "vlp16_odometry_only", "value": round(rate, 2),
          "unit": "sweeps/s", "vs_baseline": round(rate / 10, 3),
          "extra": {"ate_aligned_m": round(ate2, 4)}})

    for name in ("HDL-32", "HDL-64E"):
        lcfg = LoamConfig.preset(name)
        lsweeps, lgt, _ = synthetic.generate_sequence(
            n_sweeps, lidar=lcfg.lidar, n_azimuth=900, speed=1.0,
            noise_std=0.005, traj=traj)
        lcap = stream_cap(lsweeps)
        lcfg = lcfg.sized_for_stream(lcap)
        rate, late, ltel = bench_single_stream(lcfg, lsweeps, lgt, chunk,
                                               cap=lcap)
        key = name.lower().replace("-", "")
        emit({"metric": f"{key}_full_pipeline", "value": round(rate, 2),
              "unit": "sweeps/s", "vs_baseline": round(rate / 10, 3),
              "extra": {"ate_aligned_m": round(late, 4),
                        "telemetry": ltel}})

    _finalize_artifact(emitted)


if __name__ == "__main__":
    main()
