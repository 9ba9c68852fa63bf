"""Batched-replay-only A/B runner:

    python tools/bench_batched_ab.py [preset] [n_sweeps] [batch] [--set k=v ...]

Times bench.py's bench_batched + bench_batched_distinct for one config
(the two throughput modes that regressed in round 4) without paying the
single-stream + live modes of the full bench.
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
    name = args[0] if args else "VLP-16"
    n_sweeps = int(args[1]) if len(args) > 1 else 48
    batch = int(args[2]) if len(args) > 2 else 8
    cfg = LoamConfig.preset(name)
    if overrides:
        from loam_velodyne_tpu.cli import _apply_overrides
        cfg = _apply_overrides(cfg, overrides)
    traj = synthetic.turning_trajectory(speed=1.0)
    sweeps, _, _ = synthetic.generate_sequence(
        n_sweeps, lidar=cfg.lidar, n_azimuth=900, speed=1.0,
        noise_std=0.005, traj=traj)
    cap = cfg.capacities.full_cloud
    batched = bench.bench_batched(cfg, sweeps, batch, chunk=8, cap=cap)
    distinct = bench.bench_batched_distinct(cfg, n_sweeps, batch, chunk=8,
                                            cap=cap)
    print(json.dumps({"metric": "batched_ab", "preset": name,
                      "batched": round(batched, 2),
                      "distinct": round(distinct, 2),
                      "overrides": overrides}))


if __name__ == "__main__":
    main()
