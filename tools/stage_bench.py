"""Per-stage device timing for one HDL-64E sweep: ingest, features,
odometry, mapping. Ground-truth split when trace line-attribution is
fused beyond recognition.

    python tools/stage_bench.py [preset]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402  (compile cache)
from loam_velodyne_tpu.config import LoamConfig  # noqa: E402
from loam_velodyne_tpu.io import synthetic  # noqa: E402
from loam_velodyne_tpu.ops import features as feats_mod  # noqa: E402
from loam_velodyne_tpu.ops import scan as scan_mod  # noqa: E402
from loam_velodyne_tpu.ops.scan import RawSweep  # noqa: E402


def timeit(fn, *args, n=30, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:34s} {dt * 1e3:8.3f} ms")
    return out


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "HDL-64E"
    cfg = LoamConfig.preset(preset)
    cap = cfg.capacities.full_cloud
    sweeps, _, _ = synthetic.generate_sequence(
        2, lidar=cfg.lidar, n_azimuth=900, speed=1.0, noise_std=0.005,
        traj=synthetic.turning_trajectory(speed=1.0))
    cx, cm = bench.pad_chunk(sweeps[:1], cap)
    raw = RawSweep(jnp.asarray(cx[0]), jnp.asarray(cm[0]))

    ingest = jax.jit(lambda rw: scan_mod.ingest_sweep(rw, cfg.lidar,
                                                      cfg.registration))
    grid, full = timeit(ingest, raw, label="ingest_sweep")

    extract = jax.jit(lambda g: feats_mod.extract_features(
        g, cfg.registration, cfg.capacities))
    sf = timeit(extract, grid, label="extract_features")

    both = jax.jit(lambda rw: feats_mod.extract_features(
        scan_mod.ingest_sweep(rw, cfg.lidar, cfg.registration)[0],
        cfg.registration, cfg.capacities))
    timeit(both, raw, label="ingest+features (fused)")

    # odometry step on persisted clouds
    from loam_velodyne_tpu.models import odometry as odo_mod
    ostate = odo_mod.OdometryState.create(cfg)
    ostate = ostate._replace(last_corner=sf.less_sharp, last_surf=sf.less_flat,
                             initialized=jnp.ones((), bool))
    ostep = jax.jit(lambda st, f: odo_mod.step(st, f, cfg))
    timeit(ostep, ostate, sf, label="odometry step")


if __name__ == "__main__":
    main()
