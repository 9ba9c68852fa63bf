"""Headline benchmark: VLP-16 full-pipeline throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference runs in real time on a desktop CPU — 10
sweeps/s at scanPeriod 0.1 s (BASELINE.md). vs_baseline is the speedup
over that rate.

Two modes are measured:
- throughput: B independent sequences replayed as one vmapped engine on
  the chip (the offline replay mode, parallel/replay.py) — this is the
  headline number;
- latency: single-stream per-sweep step time (the live mode), reported
  in extras together with trajectory accuracy (aligned ATE) vs the
  simulator's ground truth.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from loam_velodyne_tpu.config import LoamConfig          # noqa: E402
from loam_velodyne_tpu.eval.metrics import ate_rmse      # noqa: E402
from loam_velodyne_tpu.io import synthetic               # noqa: E402
from loam_velodyne_tpu.io.driver import LoamDriver       # noqa: E402
from loam_velodyne_tpu.models import engine as engine_mod  # noqa: E402
from loam_velodyne_tpu.ops.scan import RawSweep          # noqa: E402
from loam_velodyne_tpu.parallel.replay import (          # noqa: E402
    make_batched_step, stack_states)


def pad_batch(sweep_lists, k, cap):
    b = len(sweep_lists)
    xyz = np.zeros((b, cap, 3), np.float32)
    mask = np.zeros((b, cap), bool)
    for i, seq in enumerate(sweep_lists):
        pts = seq[k][:cap]
        xyz[i, :len(pts)] = pts
        mask[i, :len(pts)] = True
    return RawSweep(xyz=jnp.asarray(xyz), mask=jnp.asarray(mask))


def main():
    n_sweeps = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    warmup = 2
    cap = 32768
    cfg = LoamConfig.preset("VLP-16")

    sweeps, gt, _ = synthetic.generate_sequence(n_sweeps, n_azimuth=900,
                                                speed=1.0)

    # --- single-stream latency + accuracy ---
    drv = LoamDriver(cfg, system_delay=0, sweep_capacity=cap)
    for pts in sweeps[:warmup]:
        drv.process_sweep(pts)
    t0 = time.perf_counter()
    for pts in sweeps[warmup:]:
        drv.process_sweep(pts)
    lat_dt = time.perf_counter() - t0
    stream_rate = (n_sweeps - warmup) / lat_dt
    ate = ate_rmse(drv.positions(), gt, align=True)

    # --- batched throughput (offline replay mode) ---
    seqs = [sweeps] * batch
    step = make_batched_step(cfg)
    states = stack_states([engine_mod.EngineState.create(cfg)
                           for _ in range(batch)])
    raw0 = pad_batch(seqs, 0, cap)
    for k in range(warmup):
        states, outs = step(states, pad_batch(seqs, k, cap))
    np.asarray(outs.fused_pose)   # force sync
    t0 = time.perf_counter()
    for k in range(warmup, n_sweeps):
        states, outs = step(states, pad_batch(seqs, k, cap))
    np.asarray(outs.fused_pose)
    thr_dt = time.perf_counter() - t0
    throughput = batch * (n_sweeps - warmup) / thr_dt

    print(json.dumps({
        "metric": "vlp16_full_pipeline_throughput",
        "value": round(throughput, 2),
        "unit": "sweeps/s",
        "vs_baseline": round(throughput / 10.0, 3),
        "extra": {
            "single_stream_sweeps_per_sec": round(stream_rate, 2),
            "batch": batch,
            "ate_aligned_m": round(ate, 4),
            "n_sweeps": n_sweeps - warmup,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
