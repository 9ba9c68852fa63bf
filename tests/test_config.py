"""Config validation tests (reference setup() parameter checks,
ScanRegistration.cpp:43-141, LaserOdometry.cpp:64-138)."""

import dataclasses

import pytest

from loam_velodyne_tpu.config import (LoamConfig, MappingConfig,
                                      RegistrationConfig)


def test_defaults_valid():
    for name in ("VLP-16", "HDL-32", "HDL-64E"):
        cfg = LoamConfig.preset(name)
        assert cfg.capacities.sharp > 0


@pytest.mark.parametrize("field,value", [
    ("scan_period", 0.0),
    ("n_feature_regions", 0),
    ("curvature_region", 0),
    ("max_corner_sharp", 0),
    ("less_flat_filter_size", -0.1),
    ("corner_scan_cap", 5),
])
def test_registration_validation(field, value):
    with pytest.raises(ValueError, match="invalid configuration"):
        dataclasses.replace(RegistrationConfig(), **{field: value})


@pytest.mark.parametrize("field,value", [
    ("max_iterations", 0),
    ("cube_size", 0.0),
    ("grid_width", 4),        # < 2*neighborhood+1
    ("grid_height", 6),       # <= 2*recenter_margin
    ("corner_leaf", 0.0),
    ("knn_window", 4),
])
def test_mapping_validation(field, value):
    with pytest.raises(ValueError, match="invalid configuration"):
        dataclasses.replace(MappingConfig(), **{field: value})


def test_derived_quantities():
    m = MappingConfig()
    assert m.n_cubes == 21 * 11 * 21
    assert m.n_neighborhood_cubes == 125
    r = RegistrationConfig()
    assert r.max_corner_less_sharp == 20


def test_no_dead_config_fields():
    """Every config field must be READ somewhere outside config.py.

    This bug class has shipped twice (round 1: dead ``map_frame_num``;
    round 2: dead ``line_eigen_ratio`` — fit.line_fit hardcoded the 3.0
    ratio, so overrides silently did nothing). A field that no module
    references is either dead or read through an indirection this audit
    can't see; both deserve a failing test until explained.
    """
    import pathlib

    from loam_velodyne_tpu.config import (Capacities, LidarConfig,
                                          OdometryConfig)

    pkg = pathlib.Path(__file__).resolve().parent.parent / "loam_velodyne_tpu"
    sources = [p.read_text() for p in pkg.rglob("*.py")
               if p.name != "config.py"]
    blob = "\n".join(sources)

    dead = []
    for cls in (LidarConfig, RegistrationConfig, OdometryConfig,
                MappingConfig, Capacities):
        for f in dataclasses.fields(cls):
            # attribute read (``.name``) anywhere in the package
            if f".{f.name}" not in blob:
                dead.append(f"{cls.__name__}.{f.name}")
    assert not dead, f"config fields never read outside config.py: {dead}"


def test_sized_for_stream_buckets_ring_capacity():
    """sized_for_stream picks the 128-aligned ring bucket covering the
    observed density (with margin), caps at the datasheet preset, and
    recomputes derived capacities (PERF.md: capacity padding is O(R*P)
    work the reference's dynamic clouds never pay)."""
    from loam_velodyne_tpu.config import LoamConfig

    cfg = LoamConfig.preset("HDL-64E")
    # 900-azimuth scene: 57600 points over 64 rings = 900/ring;
    # * 1.25 margin = 1125 -> bucket 1152.
    sized = cfg.sized_for_stream(57600)
    assert sized.lidar.max_points_per_ring == 1152
    assert sized.capacities.full_cloud == 64 * 1152
    # quota-driven feature capacities are untouched
    assert sized.capacities.sharp == cfg.capacities.sharp
    assert sized.capacities.less_sharp == cfg.capacities.less_sharp
    # a stream denser than the datasheet rate stays capped at the preset
    assert (cfg.sized_for_stream(10_000_000).lidar.max_points_per_ring
            == cfg.lidar.max_points_per_ring)
    # tiny streams keep at least one lane tile
    assert cfg.sized_for_stream(1).lidar.max_points_per_ring == 128
