from loam_velodyne_tpu.ops.features import SweepFeatures, extract_features  # noqa: F401
from loam_velodyne_tpu.ops.scan import RawSweep, ingest_sweep  # noqa: F401
from loam_velodyne_tpu.ops.voxel import voxel_downsample  # noqa: F401
from loam_velodyne_tpu.ops.neighbors import (  # noqa: F401
    corner_correspondences,
    knn_sq_dist,
    sort_cloud,
    surf_correspondences,
    tiled_windowed_knn,
    windowed_knn,
)
from loam_velodyne_tpu.ops.imu import ImuWindow, project_to_sweep_start  # noqa: F401
