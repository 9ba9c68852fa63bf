"""Headline benchmark: VLP-16 full-pipeline throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference runs in real time on a desktop CPU, i.e.
10 sweeps/s at scanPeriod 0.1 s (BASELINE.md). vs_baseline is the
speedup over that real-time rate.
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


def main():
    n_sweeps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    warmup = 3
    cfg = LoamConfig.preset("VLP-16")
    sweeps, gt, _ = synthetic.generate_sequence(n_sweeps, n_azimuth=900,
                                                speed=1.0)

    drv = LoamDriver(cfg, system_delay=0)
    # Warmup: compile + first steps.
    for pts in sweeps[:warmup]:
        drv.process_sweep(pts)
    jax.block_until_ready(drv.state)

    t0 = time.perf_counter()
    for pts in sweeps[warmup:]:
        drv.process_sweep(pts)
    jax.block_until_ready(drv.state)
    dt = time.perf_counter() - t0

    timed = n_sweeps - warmup
    sweeps_per_sec = timed / dt
    ate = ate_rmse(drv.positions(), gt, align=True)

    print(json.dumps({
        "metric": "vlp16_full_pipeline_throughput",
        "value": round(sweeps_per_sec, 2),
        "unit": "sweeps/s",
        "vs_baseline": round(sweeps_per_sec / 10.0, 3),
        "extra": {
            "ate_aligned_m": round(ate, 4),
            "n_sweeps": timed,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
