"""Golden-trace regression: the TPU-native twin of the reference's
golden-bag comparison test (tests/bag_test:42-47).

The reference replays a recorded bag and asserts exact equality of the
output messages against a golden recording. Here the input is the
deterministic synthetic sequence and the golden is a committed
trajectory trace (tests/golden_trajectory.npz) recorded from a vetted
build; CPU replay is deterministic, so the tolerance is tight. If an
intentional algorithm change shifts the trajectory, regenerate with
`python tests/test_golden.py regen` and commit the diff consciously.
"""

import os
import sys

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_trajectory.npz")
N_SWEEPS = 6


def _replay():
    import jax  # noqa: F401  (platform forced by conftest)
    from loam_velodyne_tpu.config import LoamConfig
    from loam_velodyne_tpu.io import synthetic
    from loam_velodyne_tpu.io.driver import LoamDriver

    cfg = LoamConfig.preset("VLP-16")
    sweeps, gt, _ = synthetic.generate_sequence(N_SWEEPS, n_azimuth=900,
                                                speed=1.0)
    drv = LoamDriver(cfg, system_delay=0)
    for pts in sweeps:
        drv.process_sweep(pts)
    return np.stack(drv.trajectory), np.asarray(gt)


@pytest.mark.slow
def test_golden_trajectory_regression():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden trace not recorded yet")
    traj, _ = _replay()
    with np.load(GOLDEN) as g:
        golden = g["trajectory"]
    assert traj.shape == golden.shape
    np.testing.assert_allclose(traj, golden, atol=2e-3,
                               err_msg="trajectory drifted from the golden "
                                       "trace; regenerate deliberately if "
                                       "this is an intended change")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        # force CPU determinism like conftest does
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        traj, gt = _replay()
        np.savez_compressed(GOLDEN, trajectory=traj, gt=gt)
        print(f"wrote {GOLDEN}: {traj.shape}")
