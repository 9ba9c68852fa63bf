"""Two-process jax.distributed CPU dryrun of the DCN multi-host replay
(parallel/multihost.py) — SURVEY §5's "DCN for multi-host offline map
building" clause, proven executable without a pod (VERDICT r4 task 8).

Spawns TWO OS processes, each with 2 virtual CPU devices (a 4-device
global mesh across "hosts"), joins them via jax.distributed, replays
distinct tiny lanes per host through the SAME vmapped static-cadence
chunk program the single-host replay uses, and all-gathers the
trajectories over the DCN control plane. Asserts:

- the global mesh spans both processes (4 devices, 2 addressable each)
- every host receives all 4 lanes' trajectories
- lanes fed identical input on different hosts produce identical poses
  (cross-host determinism)

    python tools/dryrun_dcn.py           # orchestrates both processes
    python tools/dryrun_dcn.py --worker <pid> <port>   # internal
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROC = 2
DEV_PER_PROC = 2
LANES_PER_PROC = 2
N_SWEEPS = 8


def worker(process_id: int, port: int) -> None:
    # CPU-pin BEFORE jax backend init: the sandbox registers a remote
    # TPU platform ("axon") from sitecustomize and pins jax_platforms
    # via the config API, so the env var alone is not enough — update
    # the config right after import too (and clear the axon pool so the
    # plugin doesn't try to dial out from both workers at once).
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEV_PER_PROC} "
        + os.environ.get("XLA_FLAGS", ""))
    sys.path.insert(0, REPO)
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    from loam_velodyne_tpu.io import synthetic
    from loam_velodyne_tpu.parallel import multihost
    from loam_velodyne_tpu.parallel.replay import tiny_config

    multihost.init(f"localhost:{port}", N_PROC, process_id)
    assert jax.process_count() == N_PROC
    assert len(jax.devices()) == N_PROC * DEV_PER_PROC, jax.devices()
    assert len(jax.local_devices()) == DEV_PER_PROC

    # tiny_config with 512-point rings: LOAM's parallel-beam rejection
    # (BasicScanRegistration.cpp:321-363) discards any ring whose
    # azimuth step exceeds ~0.81 deg REGARDLESS of range, so coarser
    # dryrun sweeps produce zero features and a frozen pose — the
    # narrow-tunnel world below at 512 steps (0.70 deg) is the smallest
    # scene where the full odometry+mapping path actually engages.
    import dataclasses
    from loam_velodyne_tpu.config import LidarConfig
    cfg = dataclasses.replace(
        tiny_config(),
        lidar=LidarConfig("tiny", -15.0, 15.0, 4, max_points_per_ring=512),
        capacities=None)
    world = (synthetic.corridor_world(length=40, width=2.5, height=2.5)
             + synthetic.box(6, 6.5, -0.8, -0.4, 0, 2.5)
             + synthetic.box(12, 12.5, 0.4, 0.8, 0, 2.5))

    def make_traj(sway):
        def traj(t):
            return (np.array([t, sway * np.sin(0.6 * t), 1.2], np.float64),
                    0.04 * np.sin(0.5 * t))
        return traj

    # Lane 0 of EVERY host replays the same deterministic sequence (the
    # cross-host determinism probe); lane 1 differs per host.
    sweeps_same, _, _ = synthetic.generate_sequence(
        N_SWEEPS, lidar=cfg.lidar, n_azimuth=512, noise_std=0.0,
        world=world, traj=make_traj(0.15))
    sweeps_own, _, _ = synthetic.generate_sequence(
        N_SWEEPS, lidar=cfg.lidar, n_azimuth=512, noise_std=0.0,
        world=world, traj=make_traj(0.1 + 0.1 * process_id))
    local = [sweeps_same, sweeps_own]
    assert len(local) == LANES_PER_PROC

    positions = multihost.replay_global(cfg, local, chunk=4,
                                        sweep_capacity=2048)
    b_global = N_PROC * LANES_PER_PROC
    assert positions.shape == (b_global, N_SWEEPS, 3), positions.shape
    assert np.all(np.isfinite(positions))
    assert np.abs(positions).max() > 0.05, (
        "engine never moved — the dryrun sweeps are too sparse to "
        "exercise odometry")
    # lanes 0 and 2 (= lane 0 of host 0 and host 1) saw identical input
    # on different hosts: DCN replay must be deterministic across hosts
    np.testing.assert_allclose(positions[0], positions[LANES_PER_PROC],
                               atol=1e-5)
    if process_id == 0:
        print(json.dumps({
            "ok": True,
            "processes": N_PROC,
            "global_devices": N_PROC * DEV_PER_PROC,
            "lanes": b_global,
            "sweeps": N_SWEEPS,
            "max_abs_pos": float(np.abs(positions).max()),
        }))


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
        return 0
    import socket
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", str(pid),
         str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(N_PROC)]
    rc = 0
    for pid, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            rc = p.returncode
            sys.stderr.write(f"--- worker {pid} rc={p.returncode}\n{err}\n")
        if out.strip():
            print(out.strip())
    return rc


if __name__ == "__main__":
    sys.exit(main())
