from loam_velodyne_tpu.parallel.replay import (  # noqa: F401
    make_batched_chunk,
    make_batched_step,
    replay_sequences,
    stack_states,
    tiny_config,
)
