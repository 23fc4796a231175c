"""sp_orb_slam_tpu — a TPU-native learned visual-odometry / SLAM framework.

A ground-up rebuild of the capabilities of sp_orb_slam (ICRA 2020 "RDVO":
ORB-SLAM2 with a SuperPoint-style learned frontend), designed TPU-first:

- the learned frontend (shared VGG encoder, 65-channel dustbin detector head,
  256-d descriptor head, grid NMS, repeatability covariance, bilinear
  descriptor sampling) runs as batched, jit-compiled JAX/XLA programs with
  Pallas kernels on the hot paths;
- descriptor matching is batched matmul + top-k;
- pose-only optimization, direct dustbin alignment, and local bundle
  adjustment are fixed-iteration Levenberg-Marquardt / Gauss-Newton solves
  under `jax.lax` loops with static shapes;
- the sequential tracking / keyframe / mapping / loop-closing state machine
  is host-side Python orchestrating the compiled TPU programs;
- multi-stream scale-out is data-parallel over a `jax.sharding.Mesh`.

Reference behavior is documented per-module with `file:line` citations into
the upstream tree (HyHuang1995/sp_orb_slam).
"""

__version__ = "0.1.0"

from sp_orb_slam_tpu.config import Config, load_config  # noqa: F401
