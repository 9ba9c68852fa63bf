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


def _tools():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import make_validation_pcap
    return make_validation_pcap


def test_wire_format_packets_match_raycast():
    """The wire-format generator is spec-exact: encoding a noiseless
    sweep into real VLP-16 payloads (interleaved laser order, 2 firings
    per block, half-azimuth interpolation) and decoding it back through
    io/pcap.py reproduces the simulator's point set to the 2 mm range
    quantization of the wire format."""
    mk = _tools()
    from loam_velodyne_tpu.io import pcap as pcap_io
    rects = synthetic.corridor_world()
    traj = synthetic.turning_trajectory(speed=1.0)
    # the REAL azimuth density (0.2 deg/firing): block spacing is then
    # exactly the decoder's 0.4 deg last-block extrapolation, and the
    # 0.01-deg wire azimuth encoding is lossless for these angles
    img, az_deg = mk.range_image(rects, traj, 0.0, n_az=1800,
                                 noise_std=0.0, dropout=0.0)
    pkts = mk.packets_for_sweep(img, az_deg)
    decoded = [pcap_io._decode_payload(p, "VLP-16")[0] for p in pkts]
    dec = np.concatenate(decoded).astype(np.float32)
    ref = synthetic.raycast_sweep(rects, traj, 0.0, n_azimuth=1800)
    assert abs(len(dec) - len(ref)) < 0.01 * len(ref)
    # nearest-neighbor residual bounded by the 2 mm range quantization
    sub = dec[:: max(1, len(dec) // 256)]
    d = np.linalg.norm(sub[:, None, :] - ref[None, :, :], axis=-1).min(1)
    assert d.max() < 4e-3, d.max()


@pytest.mark.slow
def test_validate_wire_format_pcap(tmp_path, capsys):
    """The documented no-egress fallback (VERDICT r4 task 3): this
    sandbox cannot fetch the reference's MD5-pinned bag, so the validate
    gate runs on a spec-exact Velodyne wire-format capture instead —
    real packet framing, interleaved firing order, azimuth
    interpolation, range noise, 2% dropouts and motion distortion flow
    through pcap decode -> sweep split -> the full pipeline -> the
    golden gate, and the trajectory matches the simulator ground truth."""
    mk = _tools()
    from loam_velodyne_tpu.eval.metrics import ate_rmse
    from loam_velodyne_tpu.io import pcap as pcap_io
    n = 6
    rects = synthetic.corridor_world()
    traj = synthetic.turning_trajectory(speed=1.0)
    pkts = []
    for k in range(n):
        img, az_deg = mk.range_image(rects, traj, 0.1 * k, n_az=1800,
                                     seed=k)
        pkts.extend(mk.packets_for_sweep(img, az_deg))
    path = tmp_path / "wire_vlp16.pcap"
    pcap_io.write_pcap(str(path), pkts)

    cli_main(["validate", "--path", str(path)])
    rep = _last_report(capsys)
    assert rep["recorded"] and rep["ok"] and rep["sweeps"] == n

    # gate run: deterministic decode + replay
    cli_main(["validate", "--path", str(path)])
    rep = _last_report(capsys)
    assert rep["ok"] and rep["ate_vs_golden_m"] <= 1e-4

    # the wire-format trajectory tracks ground truth
    with np.load(rep["golden"]) as g:
        est = g["positions"]
    end_times = 0.1 * (np.arange(n) + 1)
    gt = synthetic.loam_frame_positions(
        traj, np.concatenate([[0.0], end_times]))[1:]
    assert ate_rmse(est, gt[:len(est)], align=True) < 0.05


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
