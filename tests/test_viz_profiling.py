"""Visualization + metrics module tests."""

import json
import os

import numpy as np

from loam_velodyne_tpu.eval.viz import plot_map, plot_trajectory
from loam_velodyne_tpu.utils.profiling import Metrics


def test_plot_trajectory(tmp_path, rng):
    pos = np.cumsum(rng.normal(size=(40, 3)) * 0.1, axis=0)
    out = str(tmp_path / "traj.png")
    plot_trajectory(pos, out, gt=pos + 0.05)
    assert os.path.getsize(out) > 5000


def test_plot_map(tmp_path, rng):
    pts = rng.uniform(-20, 20, (5000, 3))
    out = str(tmp_path / "map.png")
    plot_map(pts, out, trajectory=np.zeros((5, 3)))
    assert os.path.getsize(out) > 5000


def test_metrics_summary(tmp_path):
    m = Metrics()
    m.count("sweeps", 5)
    with m.timer("step"):
        pass
    m.record("step", 0.01)
    s = m.summary()
    assert s["counters"]["sweeps"] == 5
    assert s["timings"]["step"]["n"] == 2
    p = str(tmp_path / "metrics.json")
    m.dump(p)
    assert json.load(open(p))["counters"]["sweeps"] == 5
