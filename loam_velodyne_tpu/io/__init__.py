from loam_velodyne_tpu.io.driver import LoamDriver  # noqa: F401
