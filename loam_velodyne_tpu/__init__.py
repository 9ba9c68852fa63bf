"""TPU-native LOAM: LiDAR Odometry and Mapping as JAX/XLA programs.

A ground-up re-design of the LOAM pipeline (Zhang & Singh, RSS 2014; CPU/ROS
reference implementation: laboshinl/loam_velodyne) for TPU hardware:

- every pipeline stage (scan registration, scan-to-scan odometry, scan-to-map
  refinement, pose fusion) is a pure fixed-shape jit-compiled function;
- KD-trees are replaced by masked brute-force / tiled distance kernels on the
  MXU over padded point sets;
- the rolling 21x11x21 cube world map is a set of fixed-capacity device slabs
  addressed through a circular index offset;
- the multi-process ROS pub/sub topology becomes a single on-device carry
  state threaded through per-sweep steps, with host I/O only at ingest/export.
"""

from loam_velodyne_tpu.config import (  # noqa: F401
    Capacities,
    LidarConfig,
    LoamConfig,
    MappingConfig,
    OdometryConfig,
    RegistrationConfig,
    HDL32,
    HDL64E,
    VLP16,
)

__version__ = "0.1.0"
