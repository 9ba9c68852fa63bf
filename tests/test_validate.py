"""One-command real-data validation gate (loam-tpu validate): the
TPU-native twin of the reference's golden-bag rostest
(reference tests/bag_test:42-47; data pinned in CMakeLists.txt:52-70).

Two layers: command-level tests against a synthetic bag fixture (always
run, so the command itself is regression-tested), and a real-capture
gate that activates when a capture is mounted via LOAM_TEST_BAG /
LOAM_PCAP / LOAM_KITTI_SEQ — see README "Real-data validation" for what
to mount.
"""

import json
import os

import numpy as np
import pytest

from loam_velodyne_tpu.cli import main as cli_main
from loam_velodyne_tpu.io import synthetic
from loam_velodyne_tpu.io.rosbag import BagWriter


def _write_bag(path, n=4):
    sweeps, _, _ = synthetic.generate_sequence(n, n_azimuth=600)
    with BagWriter(str(path)) as w:
        for k, pts in enumerate(sweeps):
            w.write_cloud("/velodyne_points", 1000.0 + 0.1 * k, pts)


def _last_report(capsys):
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


@pytest.mark.slow
def test_validate_records_then_gates(tmp_path, capsys):
    bag = tmp_path / "seq.bag"
    _write_bag(bag)

    # first run records the golden
    cli_main(["validate", "--path", str(bag)])
    rep = _last_report(capsys)
    assert rep["recorded"] and rep["ok"]
    golden = rep["golden"]
    assert os.path.exists(golden)

    # second run gates against it — CPU replay is deterministic
    cli_main(["validate", "--path", str(bag)])
    rep = _last_report(capsys)
    assert rep["ok"]
    assert rep["ate_vs_golden_m"] <= 1e-4

    # a drifted trajectory fails the gate loudly
    with np.load(golden) as g:
        pos, traj = g["positions"], g["trajectory"]
    np.savez_compressed(golden, positions=pos + 0.5, trajectory=traj)
    with pytest.raises(SystemExit, match="drifted"):
        cli_main(["validate", "--path", str(bag)])


@pytest.mark.slow
def test_validate_no_data_exits_with_mount_instructions(tmp_path, capsys,
                                                        monkeypatch):
    for var in ("LOAM_TEST_BAG", "LOAM_PCAP", "LOAM_KITTI_SEQ"):
        monkeypatch.delenv(var, raising=False)
    with pytest.raises(SystemExit, match="LOAM_TEST_BAG"):
        cli_main(["validate", "--cache-dir", str(tmp_path / "nocache")])


@pytest.mark.slow
@pytest.mark.skipif(not (os.environ.get("LOAM_TEST_BAG")
                         or os.environ.get("LOAM_PCAP")
                         or os.environ.get("LOAM_KITTI_SEQ")),
                    reason="mount a real capture via LOAM_TEST_BAG / "
                           "LOAM_PCAP / LOAM_KITTI_SEQ to run the "
                           "real-data gate")
def test_validate_real_capture(capsys):
    """Replays the mounted real capture end-to-end; records a golden on
    first contact, gates against it afterwards."""
    cli_main(["validate"])
    rep = _last_report(capsys)
    assert rep["ok"]
    assert rep["sweeps"] > 0
