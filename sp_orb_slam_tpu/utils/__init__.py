from sp_orb_slam_tpu.utils import timing  # noqa: F401
