"""Per-stage device timing of the REAL pipeline step: ingest+features,
odometry, mapping. Ground-truth split when trace line-attribution is
unavailable (the remote-tunnel device profiler crashes the TPU worker —
round-5 finding; host-side traces carry no device ops).

Method: time the full jitted engine step with mapping compiled ON vs
OFF over a cycle of DISTINCT consecutive sweeps (a warmed, populated
engine state so the GN loops do real work — feeding a step its own
last cloud converges in one iteration and under-reports odometry ~75x),
plus the fused ingest+features program alone. Then
    odometry  = step_off - ingest_features
    mapping   = step_on  - step_off      (per mapping frame)

    python tools/stage_bench.py [preset] [--sized] [--set k=v ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402  (compile cache)
from loam_velodyne_tpu.config import LoamConfig  # noqa: E402
from loam_velodyne_tpu.io import synthetic  # noqa: E402
from loam_velodyne_tpu.models import engine as engine_mod  # noqa: E402
from loam_velodyne_tpu.ops import features as feats_mod  # noqa: E402
from loam_velodyne_tpu.ops import scan as scan_mod  # noqa: E402
from loam_velodyne_tpu.ops.scan import RawSweep  # noqa: E402


def timeit(fn, inputs, n=30, label="", block=lambda o: o):
    """Time n dispatches, ending with a VALUE fetch: on the axon remote
    tunnel jax.block_until_ready can return before execution completes
    (round-5 finding — identical loops measured 0.04 ms 'blocked' vs
    7.2 ms fetched); only np.asarray reliably fences. The single final
    fetch RTT is amortized over n calls."""
    import numpy as np
    out = fn(*inputs[0])
    np.asarray(block(out))
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*inputs[i % len(inputs)])
    np.asarray(block(out))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:34s} {dt * 1e3:8.3f} ms")
    return dt


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    preset = args[0] if args else "HDL-64E"
    cfg = LoamConfig.preset(preset)
    overrides = []
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--set":
            overrides.append(argv[i + 1])
    if overrides:
        from loam_velodyne_tpu.cli import _apply_overrides
        cfg = _apply_overrides(cfg, overrides)
    n = 8
    sweeps, _, _ = synthetic.generate_sequence(
        n, lidar=cfg.lidar, n_azimuth=900, speed=1.0, noise_std=0.005,
        traj=synthetic.turning_trajectory(speed=1.0))
    if "--sized" in sys.argv:
        cap = bench.stream_cap(sweeps)
        cfg = cfg.sized_for_stream(cap)
    else:
        cap = cfg.capacities.full_cloud
    print(f"{preset}: input N={cap}, ring P={cfg.lidar.max_points_per_ring}")
    raws = []
    for s in sweeps:
        cx, cm = bench.pad_chunk([s], cap)
        raws.append(RawSweep(jnp.asarray(cx[0]), jnp.asarray(cm[0])))

    feat = jax.jit(lambda rw: feats_mod.extract_features(
        scan_mod.ingest_sweep(rw, cfg.lidar, cfg.registration)[0],
        cfg.registration, cfg.capacities))
    t_feat = timeit(feat, [(r,) for r in raws], label="ingest+features",
                    block=lambda o: o.dropped)

    step_on = jax.jit(lambda s, r: engine_mod.step(
        s, r, cfg, mapping_mode="on", static_schedule=True))
    step_off = jax.jit(lambda s, r: engine_mod.step(
        s, r, cfg, mapping_mode="off", static_schedule=True))

    # Warm a real engine state: mapping on the io_ratio cadence.
    state = engine_mod.EngineState.create(cfg)
    for k in range(2 * n):
        f = step_on if k % cfg.odometry.io_ratio == 1 else step_off
        state, _ = f(state, raws[k % n])
    import numpy as np
    np.asarray(state.mapping.transform_aft)

    # Time with a FROZEN state (same state each call, distinct sweeps):
    # letting the state evolve drifts odometry into different iteration
    # counts between the on/off runs.
    t_off = timeit(lambda r: step_off(state, r), [(r,) for r in raws],
                   label="step (mapping off)",
                   block=lambda o: o[1].packed)
    t_on = timeit(lambda r: step_on(state, r), [(r,) for r in raws],
                  label="step (mapping on)",
                  block=lambda o: o[1].packed)
    print(f"{'-> odometry (off - feat)':34s} {1e3 * (t_off - t_feat):8.3f} ms")
    print(f"{'-> mapping increment':34s} {1e3 * (t_on - t_off):8.3f} ms")
    io = cfg.odometry.io_ratio
    print(f"{'-> amortized/sweep @io_ratio':34s} "
          f"{1e3 * (t_off + (t_on - t_off) / io):8.3f} ms")


if __name__ == "__main__":
    main()
