"""CLI end-to-end tests (subprocess, CPU-pinned)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, timeout=900):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""       # skip remote-TPU registration
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    return subprocess.run(
        [sys.executable, "-m", "loam_velodyne_tpu.cli"] + args,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout)


def test_cli_info():
    r = _run_cli(["info"])
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout)
    assert "VLP-16" in out["lidar_presets"]
    assert out["backend"] == "cpu"


def test_cli_bad_override():
    r = _run_cli(["run", "--set", "odometry.nonexistent=1", "--sweeps", "1"])
    assert r.returncode != 0
    assert "unknown config field" in r.stderr


def test_cli_missing_value():
    r = _run_cli(["run", "--set", "odometry.max_iterations", "--sweeps", "1"])
    assert r.returncode != 0
    assert "expects key=value" in r.stderr


@pytest.mark.slow
def test_cli_run_synthetic_with_exports(tmp_path):
    traj = str(tmp_path / "t.tum")
    pcd = str(tmp_path / "m.pcd")
    ckpt = str(tmp_path / "s.npz")
    r = _run_cli(["run", "--source", "synthetic", "--sweeps", "4",
                  "--azimuth", "600", "--set", "odometry.max_iterations=8",
                  "--set", "mapping.max_iterations=4",
                  "--out-traj", traj, "--out-map", pcd,
                  "--checkpoint", ckpt])
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(r.stdout.strip().splitlines()[-1])
    assert report["sweeps"] == 4
    assert report["ate_m"] < 0.5
    assert os.path.exists(traj) and os.path.exists(ckpt)
    from loam_velodyne_tpu.io.pcd import read_pcd
    xyz, _ = read_pcd(pcd)
    assert len(xyz) > 100
