"""Single-config bench: `python tools/bench_one.py HDL-64E [n_sweeps]`.

Times bench.py's bench_single_stream for ONE lidar preset (plus optional
--set overrides) so perf iterations don't pay the whole BASELINE matrix.
Prints the same JSON shape as the per-config lines of `python bench.py`.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (sets the compilation cache)
from loam_velodyne_tpu.config import LoamConfig  # noqa: E402
from loam_velodyne_tpu.io import synthetic  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    overrides = []
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--set":
            overrides.append(argv[i + 1])
    name = args[0] if args else "HDL-64E"
    n_sweeps = int(args[1]) if len(args) > 1 else 48
    cfg = LoamConfig.preset(name)
    if overrides:
        from loam_velodyne_tpu.cli import _apply_overrides
        cfg = _apply_overrides(cfg, overrides)
    traj = synthetic.turning_trajectory(speed=1.0)
    sweeps, gt, _ = synthetic.generate_sequence(
        n_sweeps, lidar=cfg.lidar, n_azimuth=900, speed=1.0,
        noise_std=0.005, traj=traj)
    if "--datasheet-cap" in sys.argv:       # pre-round-5 fixed capacities
        cap = cfg.capacities.full_cloud
    else:
        cap = bench.stream_cap(sweeps)
        cfg = cfg.sized_for_stream(cap)
    rate, ate, tel = bench.bench_single_stream(
        cfg, sweeps, gt, chunk=8, cap=cap)
    key = name.lower().replace("-", "")
    print(json.dumps({"metric": f"{key}_full_pipeline",
                      "value": round(rate, 2), "unit": "sweeps/s",
                      "vs_baseline": round(rate / 10, 3),
                      "extra": {"ate_aligned_m": round(ate, 4),
                                "ms_per_sweep": round(1e3 / max(rate, 1e-9), 2),
                                "telemetry": tel}}))


if __name__ == "__main__":
    main()
