from loam_velodyne_tpu.models.engine import (  # noqa: F401
    EngineOutputs,
    EngineState,
    registered_cloud,
    run_chunk,
    step,
)
from loam_velodyne_tpu.models.fusion import FusionState, fuse  # noqa: F401
from loam_velodyne_tpu.models.mapping import (  # noqa: F401
    MappingOutputs,
    MappingState,
    full_map,
    surround_map,
)
from loam_velodyne_tpu.models.odometry import (  # noqa: F401
    ImuSweepState,
    OdometryOutputs,
    OdometryState,
)
