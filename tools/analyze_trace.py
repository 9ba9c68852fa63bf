"""Aggregate a JAX/XLA device trace into a per-op cost table.

Usage: python tools/analyze_trace.py <trace_dir> [top_n]

Reads the Chrome-trace JSON (.trace.json.gz) that jax.profiler writes
under <dir>/plugins/profile/<run>/ and prints the top ops by total
device time, grouped by a normalized op name (fusion indices and
unique suffixes stripped) so repeated micro-kernels aggregate.
"""

import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(trace_dir: str) -> str:
    pats = [os.path.join(trace_dir, "**", "*.trace.json.gz"),
            os.path.join(trace_dir, "*.trace.json.gz")]
    for p in pats:
        hits = sorted(glob.glob(p, recursive=True))
        if hits:
            return hits[-1]
    raise FileNotFoundError(f"no .trace.json.gz under {trace_dir}")


_STRIP = re.compile(r"[.\d]+$")


def normalize(name: str) -> str:
    # fusion.123 -> fusion ; dynamic-slice.5 -> dynamic-slice
    return _STRIP.sub("", name)


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    path = find_trace(trace_dir)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # device lanes: pid whose name mentions TPU/device XLA op streams
    pid_names = {e["pid"]: e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    dev_pids = {pid for pid, name in pid_names.items()
                if any(k in name for k in ("TPU", "/device", "Device",
                                           "XLA Op"))}

    tot = collections.defaultdict(float)
    cnt = collections.defaultdict(int)
    long_names = {}
    wall = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        key = normalize(name)
        tot[key] += e["dur"]
        cnt[key] += 1
        long_names.setdefault(key, name)
        wall += e["dur"]

    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:top_n]
    print(f"{'op':40s} {'total_ms':>10s} {'count':>8s} {'mean_us':>9s} "
          f"{'%':>6s}")
    for key, us in rows:
        print(f"{key[:40]:40s} {us / 1e3:10.2f} {cnt[key]:8d} "
              f"{us / max(cnt[key], 1):9.1f} {100 * us / max(wall, 1):6.1f}")
    print(f"\ntotal device-op time: {wall / 1e3:.1f} ms across "
          f"{sum(cnt.values())} events  ({path})")


if __name__ == "__main__":
    main()
