"""Per-frame data container.

Equivalent of the reference `Frame` (type/frame.h, src/type/frame.cpp) minus
the pointer soup: fixed-capacity arrays with validity masks.  Device arrays
(descriptors, dust map, occupancy grid) stay HBM-resident for the jitted
tracking programs; small host mirrors (keypoint coords, covariance, counts)
come back in one packed transfer because device->host readbacks over the
TPU tunnel carry ~25 ms fixed latency each.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from sp_orb_slam_tpu.extractor import Features


def orthonormalized_pose(Tcw: np.ndarray) -> np.ndarray:
    """Project the rotation block of an SE3 onto SO(3) (nearest rotation by
    polar decomposition, R <- U V^T) and return a clean float32 4x4.

    The equivalent of g2o's quaternion-backed SE3 storage: without it, f32
    exp-map/product chains accumulate shear in R, and every transpose-based
    inverse downstream amplifies it (see the note in FrameData)."""
    T = np.asarray(Tcw, np.float64)
    U, _, Vt = np.linalg.svd(T[:3, :3])
    R = U @ Vt
    if np.linalg.det(R) < 0:  # keep a proper rotation
        R = (U * np.array([1.0, 1.0, -1.0])) @ Vt
    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = R.astype(np.float32)
    out[:3, 3] = T[:3, 3].astype(np.float32)
    return out


@dataclass
class FrameData:
    """One frame's features + pose + map bindings (capacity K)."""

    frame_id: int
    timestamp: float
    # host mirrors
    uv: np.ndarray            # (K, 2) float32
    score: np.ndarray         # (K,)
    response: np.ndarray      # (K,)
    valid: np.ndarray         # (K,) bool
    cov2_inv: np.ndarray      # (K, 2)
    occ_grid: np.ndarray      # (hc, wc) int32
    count: int
    # device residents (jax arrays)
    desc_dev: object          # (K, 256)
    dust_dev: object          # (hc, wc)
    occ_grid_dev: object      # (hc, wc)
    heat_dev: object = None   # (H, W), optional (heat-alignment variant)
    # pose & bindings
    Tcw: Optional[np.ndarray] = None          # (4, 4) float32, None until set
    mp_ids: np.ndarray = None                 # (K,) int64, -1 = unbound
    outlier: np.ndarray = None                # (K,) bool
    ref_kf: int = -1
    # place-recognition global descriptor (reference: loaded from disk by
    # the Export dataloaders, data_loader.cc:87-109)
    global_desc: Optional[np.ndarray] = None

    def __post_init__(self):
        K = self.uv.shape[0]
        if self.mp_ids is None:
            self.mp_ids = np.full(K, -1, np.int64)
        if self.outlier is None:
            self.outlier = np.zeros(K, bool)

    # lazily-fetched host descriptor copy (one ~80 ms d2h, paid only when
    # the frame is promoted to a keyframe)
    _desc_host: Optional[np.ndarray] = None

    # NOTE on pose storage: every stored SE3 is re-orthonormalized (see
    # orthonormalized_pose below).  g2o gets this for free (SE3Quat stores
    # a unit quaternion); a raw 4x4 chain does not: f32 rotation blocks
    # pick up ~1e-4 shear from exp-map products, and the motion model's
    # transpose-inverse (valid only for orthonormal R) then DOUBLES the
    # defect every frame — measured on the seed-2 rail as ortho error
    # 1e-4 -> 0.39 in 10 frames, an ~80 px constant prediction bias that
    # silently disabled the dust tracker and degraded every downstream
    # stage (round-3 NOTES).

    @property
    def desc_host(self) -> np.ndarray:
        if self._desc_host is None:
            self._desc_host = np.asarray(self.desc_dev)
        return self._desc_host

    @property
    def K(self) -> int:
        return self.uv.shape[0]

    def set_pose(self, Tcw: np.ndarray) -> None:
        self.Tcw = orthonormalized_pose(Tcw)

    @property
    def Rcw(self) -> np.ndarray:
        return self.Tcw[:3, :3]

    @property
    def tcw(self) -> np.ndarray:
        return self.Tcw[:3, 3]

    @property
    def Ow(self) -> np.ndarray:
        return -self.Rcw.T @ self.tcw

    def clone_bindings(self) -> "FrameData":
        """Shallow copy with independent binding arrays (mLastFrame copy)."""
        import copy

        f = copy.copy(self)
        f.mp_ids = self.mp_ids.copy()
        f.outlier = self.outlier.copy()
        if self.Tcw is not None:
            f.Tcw = self.Tcw.copy()
        return f


def frame_from_features(feats: Features, b: int, frame_id: int,
                        timestamp: float, host: dict) -> FrameData:
    """Build a FrameData from stream `b` of a batched Features.

    `host` is the pre-fetched packed host copy (see Tracking._fetch_host) to
    avoid per-field readbacks.
    """
    return FrameData(
        frame_id=frame_id,
        timestamp=timestamp,
        uv=host["uv"],
        score=host["score"],
        response=host["response"],
        valid=host["valid"],
        cov2_inv=host["cov2_inv"],
        occ_grid=host["occ_grid"],
        count=int(host["count"]),
        desc_dev=feats.desc[b],
        dust_dev=feats.dense_dust[b],
        occ_grid_dev=feats.occ_grid[b],
        heat_dev=feats.heat[b] if feats.heat is not None else None,
    )
