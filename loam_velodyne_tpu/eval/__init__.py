from loam_velodyne_tpu.eval.metrics import ate_rmse, rpe_rmse, umeyama_align  # noqa: F401
