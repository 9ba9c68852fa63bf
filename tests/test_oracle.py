"""Reference-oracle parity gates (VERDICT round 1, task 4).

The repo engine is compared against tests/reference_oracle.py — a
sequential NumPy transliteration of the reference C++ pipeline — on
noisy, turning synthetic sequences. This replaces the unavailable
golden-bag comparison (reference tests/bag_test:42-47) as the honest
"ATE vs CPU reference" measurement (BASELINE.json north star).
"""

import numpy as np
import pytest

from loam_velodyne_tpu.config import LoamConfig
from loam_velodyne_tpu.eval.metrics import ate_rmse
from loam_velodyne_tpu.io import synthetic
from loam_velodyne_tpu.io.driver import LoamDriver
from loam_velodyne_tpu.utils import math as lm

import jax.numpy as jnp

from reference_oracle import (OracleImu, OracleParams, OraclePipeline,
                              accumulate_rotation, plugin_imu_rotation,
                              transform_associate_to_map, voxel_grid)


def test_oracle_accumulate_rotation_matches_reference_trig(rng):
    """The oracle's matrix form == the reference's expanded trig
    (BasicLaserOdometry.cpp:155-179), transliterated inline."""
    for _ in range(20):
        cx, cy, cz, lx, ly, lz = rng.uniform(-1.2, 1.2, 6)
        srx = (np.cos(lx) * np.cos(cx) * np.sin(ly) * np.sin(cz)
               - np.cos(cx) * np.cos(cz) * np.sin(lx)
               - np.cos(lx) * np.cos(ly) * np.sin(cx))
        ox = -np.arcsin(srx)
        srycrx = (np.sin(lx) * (np.cos(cy) * np.sin(cz)
                                - np.cos(cz) * np.sin(cx) * np.sin(cy))
                  + np.cos(lx) * np.sin(ly) * (np.cos(cy) * np.cos(cz)
                                               + np.sin(cx) * np.sin(cy) * np.sin(cz))
                  + np.cos(lx) * np.cos(ly) * np.cos(cx) * np.sin(cy))
        crycrx = (np.cos(lx) * np.cos(ly) * np.cos(cx) * np.cos(cy)
                  - np.cos(lx) * np.sin(ly) * (np.cos(cz) * np.sin(cy)
                                               - np.cos(cy) * np.sin(cx) * np.sin(cz))
                  - np.sin(lx) * (np.sin(cy) * np.sin(cz)
                                  + np.cos(cy) * np.cos(cz) * np.sin(cx)))
        oy = np.arctan2(srycrx / np.cos(ox), crycrx / np.cos(ox))
        got = accumulate_rotation((cx, cy, cz), (lx, ly, lz))
        np.testing.assert_allclose(got[0], ox, atol=1e-9)
        np.testing.assert_allclose(got[1], oy, atol=1e-9)


def test_oracle_geometry_matches_repo_math(rng):
    """Cross-check oracle compositions against the repo's utils/math
    (itself verified against reference trig in test_geometry.py)."""
    for _ in range(10):
        bc, bl, al = rng.uniform(-1, 1, (3, 3))
        got = plugin_imu_rotation(bc, bl, al)
        want = np.asarray(lm.plugin_imu_rotation(
            jnp.asarray(bc, jnp.float32), jnp.asarray(bl, jnp.float32),
            jnp.asarray(al, jnp.float32)))
        np.testing.assert_allclose(got, want, atol=1e-5)

        s, b, a = rng.uniform(-1, 1, (3, 6))
        got = transform_associate_to_map(s, b, a)
        want = np.asarray(lm.transform_associate_to_map(
            jnp.asarray(s, jnp.float32), jnp.asarray(b, jnp.float32),
            jnp.asarray(a, jnp.float32)))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_oracle_voxel_grid_centroids():
    pts = np.array([[0.05, 0.05, 0.05, 1.0],
                    [0.15, 0.15, 0.15, 2.0],
                    [1.05, 0.0, 0.0, 3.0]])
    out = voxel_grid(pts, 0.5)
    assert len(out) == 2
    np.testing.assert_allclose(out[0][:3], [0.1, 0.1, 0.1])
    np.testing.assert_allclose(out[1][:3], [1.05, 0.0, 0.0])


def _turning_traj(speed=1.0):
    """Forward motion with a sustained yaw turn — more adversarial than
    the straight bench corridor. Uses the canonical simulator turning
    trajectory (sensor at z=1.6 m). An earlier local copy held the
    sensor at z=0.0 — ON the floor plane — whose grazing returns are
    unphysical and sent the NumPy oracle into a spurious pitch ramp
    (−4 m of vertical drift by sweep 30) that the engine absorbed;
    parity must be measured on data the reference could actually see."""
    return synthetic.turning_trajectory(speed=speed)


@pytest.mark.slow
def test_engine_matches_oracle_noisy_turns():
    """End-to-end repo-vs-oracle trajectory parity on a noisy, turning
    sequence: ATE between the two fused trajectories must be within the
    5 cm gate (BASELINE.json) — the two implementations must agree with
    each other at least as tightly as the accuracy budget."""
    n = 10
    sweeps, gt, _ = synthetic.generate_sequence(
        n, n_azimuth=900, speed=1.0, noise_std=0.005,
        traj=_turning_traj())

    oracle = OraclePipeline()
    oracle_fused = oracle.run(sweeps)[:, 3:]

    drv = LoamDriver(LoamConfig.preset("VLP-16"), system_delay=0)
    est = drv.run(sweeps)

    # engine vs oracle: the headline parity number
    ate_cross = ate_rmse(est, oracle_fused, align=True)
    # both vs ground truth: sanity that neither diverged
    ate_repo = ate_rmse(est, gt, align=True)
    ate_oracle = ate_rmse(oracle_fused, gt, align=True)
    print(f"repo-vs-oracle ATE {ate_cross:.4f} m | repo-vs-gt "
          f"{ate_repo:.4f} m | oracle-vs-gt {ate_oracle:.4f} m")
    assert ate_cross < 0.05, ate_cross
    assert ate_repo < 0.15 and ate_oracle < 0.15


@pytest.mark.slow
def test_engine_matches_oracle_noisy_turns_30_sweeps():
    """Length-robustness of the parity gate (VERDICT round 2, task 2).

    Cross-ATE between two drifting odometry pipelines GROWS with
    sequence length no matter how faithful the rebuild is — the
    tools/oracle_ab.py 30-sweep A/B shows the cross error (4.0 cm) is
    dominated by the ORACLE's own drift vs ground truth (4.2 cm; the
    engine sits at 1.8 cm), and the deliberate divergences cost almost
    nothing (corresp_refresh_every=2 vs 1: 0.06 cm; active-cube budget
    64 vs 125: 0.000 cm). So the length-robust contract is three-fold:
    (1) cross-ATE stays inside the absolute 5 cm budget at 30 sweeps
    (measured 3.97 cm, vs 3.60 cm at 10 sweeps — near-flat in length),
    (2) per-sweep RELATIVE agreement (RPE, length-stable) stays inside
    the same budget — it cannot be millimetric by construction, because
    the engine applies each mapping correction zero-latency while the
    oracle (like the reference wrapper) applies it one frame later, so
    at mapping frames the 1-frame deltas differ by the correction size
    (measured 3.1 cm) — and (3) the engine is at least as close to
    ground truth as the reference transliteration itself — the rebuild
    may not be the larger error source."""
    from loam_velodyne_tpu.eval.metrics import rpe_rmse

    n = 30
    sweeps, gt, _ = synthetic.generate_sequence(
        n, n_azimuth=900, speed=1.0, noise_std=0.005,
        traj=_turning_traj())

    oracle = OraclePipeline()
    oracle_fused = oracle.run(sweeps)[:, 3:]

    drv = LoamDriver(LoamConfig.preset("VLP-16"), system_delay=0)
    est = drv.run(sweeps)

    ate_cross = ate_rmse(est, oracle_fused, align=True)
    rpe_cross = rpe_rmse(est, oracle_fused)
    ate_repo = ate_rmse(est, gt, align=True)
    ate_oracle = ate_rmse(oracle_fused, gt, align=True)
    print(f"30-sweep repo-vs-oracle ATE {ate_cross:.4f} m RPE "
          f"{rpe_cross:.4f} m | repo-vs-gt {ate_repo:.4f} m | "
          f"oracle-vs-gt {ate_oracle:.4f} m")
    assert ate_cross < 0.05, ate_cross
    assert rpe_cross < 0.05, rpe_cross
    assert ate_repo < ate_oracle * 1.2, (ate_repo, ate_oracle)
    assert ate_repo < 0.15 and ate_oracle < 0.15


@pytest.mark.slow
def test_engine_matches_oracle_hdl32_geometry():
    """Parity on a second ring geometry (VERDICT round 2, task 2): the
    HDL-32's asymmetric vertical field (-30.67..+10.67 deg, 32 rings,
    MultiScanRegistration.h:85) exercises ring binning, region bounds
    and the doubled feature budget on a layout the VLP-16 gates never
    see. Oracle params are overridden to the same preset."""
    from loam_velodyne_tpu.config import HDL32

    class Hdl32Params(OracleParams):
        n_rings = HDL32.n_rings
        lower_bound = HDL32.lower_bound_deg
        upper_bound = HDL32.upper_bound_deg

    n = 10
    sweeps, gt, _ = synthetic.generate_sequence(
        n, lidar=HDL32, n_azimuth=900, speed=1.0, noise_std=0.005,
        traj=_turning_traj())

    oracle = OraclePipeline(params=Hdl32Params())
    oracle_fused = oracle.run(sweeps)[:, 3:]

    cfg = LoamConfig.preset("HDL-32")
    drv = LoamDriver(cfg, sweep_capacity=cfg.capacities.full_cloud,
                     system_delay=0)
    est = drv.run(sweeps)

    ate_cross = ate_rmse(est, oracle_fused, align=True)
    ate_repo = ate_rmse(est, gt, align=True)
    ate_oracle = ate_rmse(oracle_fused, gt, align=True)
    print(f"HDL-32 repo-vs-oracle ATE {ate_cross:.4f} m | repo-vs-gt "
          f"{ate_repo:.4f} m | oracle-vs-gt {ate_oracle:.4f} m")
    assert ate_cross < 0.05, ate_cross
    assert ate_repo < 0.15 and ate_oracle < 0.15


def _imu_stream(n_sweeps, rate_hz=100.0, t0=-0.2, gain=1.0):
    """Synthetic rocking-attitude IMU samples: (stamp, (roll, pitch,
    yaw), swapped gravity-free acceleration). At gain=1, gentle angles
    and small accelerations — corrections of the size a ground
    vehicle's IMU produces; higher gains sharpen the dynamics (~3 deg
    attitude rock at gain=3). Identical input for the engine tracker
    and the oracle."""
    stamps = np.arange(t0, n_sweeps * 0.1 + 0.2, 1.0 / rate_hz)
    out = []
    for t in stamps:
        roll = gain * 0.02 * np.sin(7.0 * t)
        pitch = gain * 0.015 * np.cos(5.0 * t)
        yaw = 0.0
        acc = (gain * 0.05 * np.sin(3.0 * t),
               gain * 0.02 * np.cos(4.0 * t), 0.0)
        out.append((float(t), (roll, pitch, yaw), acc))
    return out


@pytest.mark.slow
def test_engine_matches_oracle_with_imu():
    """End-to-end parity with the IMU pipeline ACTIVE (the hector
    launch configuration, launch/hector_loam_velodyne.launch:11):
    per-point deskew, imuTrans consumption in odometry, and the mapping
    attitude blend all live in both implementations, fed identical
    samples (VERDICT round 2, task 4)."""
    from loam_velodyne_tpu.io.imu import ImuTracker

    n = 10
    sweeps, gt, _ = synthetic.generate_sequence(
        n, n_azimuth=900, speed=1.0, noise_std=0.003,
        traj=_turning_traj())
    stamps = [0.1 * k for k in range(n)]
    samples = _imu_stream(n)

    oracle = OraclePipeline()
    for t, rpy, acc in samples:
        oracle.push_imu(t, rpy, acc)
    oracle_fused = oracle.run(sweeps, stamps)[:, 3:]

    drv = LoamDriver(LoamConfig.preset("VLP-16"), system_delay=0)
    drv.imu_tracker = ImuTracker()
    for t, rpy, acc in samples:
        drv.imu_tracker.push_state(t, rpy, acc)
    for pts, t in zip(sweeps, stamps):
        drv.process_sweep(pts, t)
    est = drv.positions()

    ate_cross = ate_rmse(est, oracle_fused, align=True)
    ate_repo = ate_rmse(est, gt, align=True)
    ate_oracle = ate_rmse(oracle_fused, gt, align=True)
    print(f"IMU repo-vs-oracle ATE {ate_cross:.4f} m | repo-vs-gt "
          f"{ate_repo:.4f} m | oracle-vs-gt {ate_oracle:.4f} m")
    assert ate_cross < 0.05, ate_cross
    assert ate_repo < 0.15 and ate_oracle < 0.15


@pytest.mark.slow
def test_engine_matches_oracle_hdl64_geometry():
    """Parity on the 64-ring geometry (VERDICT round 3, task 6): the
    HDL-64E's narrow downward field (-24.9..+2.0 deg, 64 rings,
    MultiScanRegistration.h:87) exercises the widest ingest fan-out,
    the doubled less-flat budget and the scaled candidate pool — the
    perf-critical path that previously had no oracle coverage."""
    from loam_velodyne_tpu.config import HDL64E

    class Hdl64Params(OracleParams):
        n_rings = HDL64E.n_rings
        lower_bound = HDL64E.lower_bound_deg
        upper_bound = HDL64E.upper_bound_deg

    # 30 sweeps (round-5 task 6: the 64-ring path needs the same parity
    # horizon as the flagship — the 10-sweep gate never tested length
    # robustness on this geometry).
    n = 30
    sweeps, gt, _ = synthetic.generate_sequence(
        n, lidar=HDL64E, n_azimuth=900, speed=1.0, noise_std=0.005,
        traj=_turning_traj())

    oracle = OraclePipeline(params=Hdl64Params())
    oracle_fused = oracle.run(sweeps)[:, 3:]

    cfg = LoamConfig.preset("HDL-64E")
    drv = LoamDriver(cfg, sweep_capacity=cfg.capacities.full_cloud,
                     system_delay=0)
    est = drv.run(sweeps)

    ate_cross = ate_rmse(est, oracle_fused, align=True)
    ate_repo = ate_rmse(est, gt, align=True)
    ate_oracle = ate_rmse(oracle_fused, gt, align=True)
    print(f"HDL-64E repo-vs-oracle ATE {ate_cross:.4f} m | repo-vs-gt "
          f"{ate_repo:.4f} m | oracle-vs-gt {ate_oracle:.4f} m")
    assert ate_cross < 0.05, ate_cross
    assert ate_repo < 0.15 and ate_oracle < 0.15


@pytest.mark.slow
def test_engine_matches_oracle_imu_30_sweeps_dynamic():
    """IMU parity horizon (VERDICT round 3, task 6): 30 sweeps of
    3x-sharper attitude rock and acceleration than the 10-sweep gate —
    the deskew, imuTrans hand-off and mapping attitude blend must track
    the oracle through sustained dynamic motion, with the same
    length-robust contract as the 30-sweep geometric gate (cross-ATE
    inside the absolute budget; engine at least as close to ground
    truth as the transliteration)."""
    from loam_velodyne_tpu.io.imu import ImuTracker

    n = 30
    sweeps, gt, _ = synthetic.generate_sequence(
        n, n_azimuth=900, speed=1.0, noise_std=0.003,
        traj=_turning_traj())
    stamps = [0.1 * k for k in range(n)]
    samples = _imu_stream(n, gain=3.0)

    oracle = OraclePipeline()
    for t, rpy, acc in samples:
        oracle.push_imu(t, rpy, acc)
    oracle_fused = oracle.run(sweeps, stamps)[:, 3:]

    drv = LoamDriver(LoamConfig.preset("VLP-16"), system_delay=0)
    drv.imu_tracker = ImuTracker()
    for t, rpy, acc in samples:
        drv.imu_tracker.push_state(t, rpy, acc)
    for pts, t in zip(sweeps, stamps):
        drv.process_sweep(pts, t)
    est = drv.positions()

    ate_cross = ate_rmse(est, oracle_fused, align=True)
    ate_repo = ate_rmse(est, gt, align=True)
    ate_oracle = ate_rmse(oracle_fused, gt, align=True)
    print(f"IMU-30 repo-vs-oracle ATE {ate_cross:.4f} m | repo-vs-gt "
          f"{ate_repo:.4f} m | oracle-vs-gt {ate_oracle:.4f} m")
    assert ate_cross < 0.05, ate_cross
    assert ate_repo < ate_oracle * 1.2, (ate_repo, ate_oracle)
    assert ate_repo < 0.15 and ate_oracle < 0.15


@pytest.mark.slow
def test_engine_matches_oracle_dropout():
    """Parity holds through a sweep with heavy point dropout (every 3rd
    azimuth column removed) — stresses the region/feature logic."""
    n = 6
    sweeps, _, _ = synthetic.generate_sequence(n, n_azimuth=900, speed=1.0,
                                               noise_std=0.003)
    rng = np.random.default_rng(7)
    sweeps = [s[rng.random(len(s)) > 0.3] for s in sweeps]

    oracle = OraclePipeline()
    oracle_fused = oracle.run(sweeps)[:, 3:]
    drv = LoamDriver(LoamConfig.preset("VLP-16"), system_delay=0)
    est = drv.run(sweeps)
    ate_cross = ate_rmse(est, oracle_fused, align=True)
    print(f"dropout repo-vs-oracle ATE {ate_cross:.4f} m")
    assert ate_cross < 0.05, ate_cross
