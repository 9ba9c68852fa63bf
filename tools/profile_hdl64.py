"""Profile the HDL-64E single-stream chunk step on TPU.

Captures a jax.profiler trace of a few warmed run_chunk dispatches and
prints exclusive device time aggregated by source line, the same cost
map used to drive the round-4 perf work.

    python tools/profile_hdl64.py [outdir] [preset]
"""

import glob
import gzip
import json
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402
from loam_velodyne_tpu.config import LoamConfig  # noqa: E402
from loam_velodyne_tpu.io import synthetic  # noqa: E402
from loam_velodyne_tpu.models import engine as engine_mod  # noqa: E402
from loam_velodyne_tpu.ops.scan import RawSweep  # noqa: E402


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace_hdl64"
    preset = sys.argv[2] if len(sys.argv) > 2 else "HDL-64E"
    cfg = LoamConfig.preset(preset)
    cap = cfg.capacities.full_cloud
    chunk = 8
    n = 24
    traj = synthetic.turning_trajectory(speed=1.0)
    sweeps, gt, _ = synthetic.generate_sequence(
        n, lidar=cfg.lidar, n_azimuth=900, speed=1.0, noise_std=0.005,
        traj=traj)
    chunks = []
    for s in range(0, n, chunk):
        cx, cm = bench.pad_chunk(sweeps[s:s + chunk], cap)
        chunks.append(RawSweep(jnp.asarray(cx), jnp.asarray(cm)))
    step = jax.jit(lambda s, r: engine_mod.run_chunk(s, r, cfg),
                   donate_argnums=(0,))
    state = engine_mod.EngineState.create(cfg)
    state, outs = step(state, chunks[0])
    jax.block_until_ready(outs.fused_pose)

    with jax.profiler.trace(outdir):
        for ch in chunks[1:]:
            state, outs = step(state, ch)
        jax.block_until_ready(outs.fused_pose)

    # parse newest trace
    paths = sorted(glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True))
    assert paths, f"no trace under {outdir}"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # pick the busiest device track (TensorCore ops)
    by_pid = defaultdict(list)
    pid_name = {}
    for e in trace["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    for e in events:
        by_pid[e["pid"]].append(e)
    dev_pid = max(by_pid, key=lambda p: sum(ev["dur"] for ev in by_pid[p])
                  if "TPU" in pid_name.get(p, "") or "/device" in
                  pid_name.get(p, "") else 0)
    evs = by_pid[dev_pid]
    # exclusive time: subtract nested intervals per thread
    per_line = defaultdict(float)
    per_op = defaultdict(float)
    by_tid = defaultdict(list)
    for e in evs:
        by_tid[e["tid"]].append(e)
    total = 0.0
    for tid, lst in by_tid.items():
        lst.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack = []  # (event, child_time)
        def flush(ev, child):
            nonlocal total
            excl = max(ev["dur"] - child, 0.0)
            args = ev.get("args", {})
            src = args.get("source_info") or args.get("source") or ""
            name = ev["name"].split(".")[0].split("(")[0]
            per_op[name] += excl
            per_line[src or name] += excl
            total += excl
        for e in lst:
            while stack and e["ts"] >= stack[-1][0]["ts"] + stack[-1][0]["dur"]:
                ev, child = stack.pop()
                flush(ev, child)
                if stack:
                    stack[-1][1] += ev["dur"]
            stack.append([e, 0.0])
        while stack:
            ev, child = stack.pop()
            flush(ev, child)
            if stack:
                stack[-1][1] += ev["dur"]
    n_sweeps = n - chunk
    print(f"device total {total / 1e3:.1f} ms over {n_sweeps} sweeps = "
          f"{total / 1e3 / n_sweeps:.2f} ms/sweep")
    print("\n== top ops ==")
    for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{v / 1e3 / n_sweeps:8.3f} ms/sweep  {k}")
    print("\n== top source lines ==")
    for k, v in sorted(per_line.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{v / 1e3 / n_sweeps:8.3f} ms/sweep  {k[:110]}")


if __name__ == "__main__":
    main()
