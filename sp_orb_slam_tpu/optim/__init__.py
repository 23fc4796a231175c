from sp_orb_slam_tpu.optim import lm, pose, ba  # noqa: F401
