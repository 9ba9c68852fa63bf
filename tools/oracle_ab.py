"""A/B the repo's deliberate divergences against the reference oracle.

VERDICT round 2, task 2: the parity gate's margin must come from
understanding, not luck. This script runs a 30-sweep noisy turning
sequence through the NumPy reference oracle ONCE (cached to
/tmp/oracle_ab_<n>.npz — the oracle is sequential Python and slow),
then replays the same sequence through the engine on CPU under each
divergence toggle, printing the cross-ATE per variant:

    python tools/oracle_ab.py [n_sweeps]

Variants:
- default            : shipped config
- refresh1           : mapping corresp_refresh_every=1 (reference exact)
- budget125          : active-cube budget off (all 125 neighborhood cubes)
- refresh1+budget125 : both

(The Pallas-vs-XLA kNN A/B needs the TPU; see bench.py with
LOAM_DISABLE_PALLAS_KNN=1.)
"""

import dataclasses
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from loam_velodyne_tpu.config import LoamConfig  # noqa: E402
from loam_velodyne_tpu.eval.metrics import ate_rmse  # noqa: E402
from loam_velodyne_tpu.io import synthetic  # noqa: E402
from loam_velodyne_tpu.io.driver import LoamDriver  # noqa: E402


def turning(n):
    return synthetic.generate_sequence(
        n, n_azimuth=900, speed=1.0, noise_std=0.005,
        traj=synthetic.turning_trajectory(speed=1.0))


def oracle_fused(sweeps, cache):
    if os.path.exists(cache):
        return np.load(cache)["fused"]
    from reference_oracle import OraclePipeline
    fused = OraclePipeline().run(sweeps)
    np.savez(cache, fused=fused)
    return fused


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    sweeps, gt, _ = turning(n)
    fused = oracle_fused(sweeps, f"/tmp/oracle_ab_{n}.npz")[:, 3:]
    print(f"oracle-vs-gt ATE {ate_rmse(fused, gt, align=True):.4f} m")

    base = LoamConfig.preset("VLP-16")
    variants = {
        "default": base,
        "refresh1": dataclasses.replace(
            base, mapping=dataclasses.replace(base.mapping,
                                              corresp_refresh_every=1)),
        "budget125": dataclasses.replace(
            base, mapping=dataclasses.replace(base.mapping,
                                              max_active_cubes=125,
                                              thin_active_cubes=125)),
        "refresh1+budget125": dataclasses.replace(
            base, mapping=dataclasses.replace(base.mapping,
                                              corresp_refresh_every=1,
                                              max_active_cubes=125,
                                              thin_active_cubes=125)),
    }
    for name, cfg in variants.items():
        drv = LoamDriver(cfg, system_delay=0)
        est = drv.run(sweeps)
        cross = ate_rmse(est, fused, align=True)
        vs_gt = ate_rmse(est, gt, align=True)
        print(f"{name:22s} repo-vs-oracle {cross:.4f} m | repo-vs-gt "
              f"{vs_gt:.4f} m")


if __name__ == "__main__":
    main()
