"""Procedurally rendered image sequences (the image-path dress rehearsal).

The injected-feature SyntheticDataset bypasses the learned frontend
entirely; this module renders actual IMAGES of a textured 3D box room by
exact per-pixel ray casting, so the full production pipeline — extractor
(conv stack, NMS, covariance, descriptor sampling), on-device tracking,
mapping, loop closing with COMPUTED place-recognition descriptors — runs
end to end on photographs of a known scene with exact ground truth.  It is
the maximum-realism rail this environment allows: the reference's real
inputs (EuRoC/Tsukuba PNGs + superpoint.pt weights) are stripped from the
snapshot (/root/reference/.MISSING_LARGE_BLOBS), so realism comes from
geometry + texture rather than photographs, and the extractor runs with
whatever weights the caller supplies (random weights produce repeatable,
viewpoint-stable responses — verified by tests/test_image_e2e.py).

Scene: an axis-aligned box room, each face carrying an independent
multi-octave value-noise texture (piecewise-smooth with strong local
contrast — dense corner structure for any corner-ish detector).  The
default trajectory is a closed loop (full-yaw circle) so the sequence
exercises loop closure; a forward arc variant exercises pure VO.

Reference parity: plays the role of the Export loaders' offline data
(data_loader.cc:87-179) and the evaluation protocol's sequence set
(evaluate_euroc_vo.sh), as the environment's stand-in for EuRoC.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from sp_orb_slam_tpu.config import Config
from sp_orb_slam_tpu.io.dataset import (RawFrame, _loop_trajectory,
                                        _smooth_trajectory)


def _rendered_loop_trajectory(n: int, lead: int = 45) -> np.ndarray:
    """The image-rail loop trajectory: a lateral out-and-back strafe
    lead-in, then the closed circle of _loop_trajectory.

    The bare circle (camera yawing along the tangent) is rotation-dominant:
    image flow from rotation cancels the translation flow near the center,
    so a monocular init can never accumulate triangulation parallax
    (measured: median 1.2 deg after 23 frames — under the 2 deg poison
    gate).  Real MAV benchmark sequences begin with exactly this kind of
    translation wiggle so mono systems can bootstrap (EuRoC's hover
    segments); the injected-feature rail doesn't need it because its
    matches survive unlimited view rotation, letting baseline accumulate
    forever.  The strafe ends where the circle starts, so the sequence
    still closes its loop (end-of-circle frames re-observe the start)."""
    lead = min(lead, n // 4)
    if lead == 0:  # tiny sequences (training pools render single frames)
        return _loop_trajectory(n)
    poses = []
    for i in range(lead):
        t = i / max(lead, 1)
        T = np.eye(4, dtype=np.float32)
        # pure lateral strafe facing the far wall: clean init parallax
        T[:3, 3] = [-0.35 * np.sin(np.pi * t), 0.02 * np.sin(2 * np.pi * t),
                    0.0]
        poses.append(T)
    return np.concatenate([np.stack(poses), _loop_trajectory(n - lead)])


def _make_noise_grids(rng: np.random.Generator, octaves: int = 6,
                      base: int = 10):
    """Random value-noise lattices, one per octave.

    Spectral shaping matters for the learned frontend: the finest octave
    must project to ~2-5 px at typical viewing distance, or the image is
    smooth at the 8x8-cell scale and a random-weight detector head
    degenerates — with near-constant features across a cell, the 64-way
    in-cell softmax argmax pins keypoints to the CELL LATTICE instead of
    the content (measured: 97% of keypoints at identical pixels across an
    8 px inter-frame shift).  And the detail must span the full viewing-
    distance range: with 5 octaves (finest lattice 5.6 cm = 8 px at the
    loop trajectory's 2.5 m closest wall approach) the detector collapses
    to 10-15 keypoints exactly when the camera faces a near wall head-on
    (measured round 4: frames 105/240 of the loop, vs 801 at 4.5-6.5 m) —
    the single-level extractor only learns corners at the scale it was
    shown.  octaves=6 adds a 2.8 cm lattice: 4 px at 2.5 m, ~1.5 px
    (mildly aliased, like any real fine texture) at 6.5 m."""
    return [rng.standard_normal((base * 2 ** o + 1, base * 2 ** o + 1))
            .astype(np.float32) for o in range(octaves)]


def _eval_noise(grids, s: np.ndarray, t: np.ndarray,
                persistence: float = 0.8) -> np.ndarray:
    """Multi-octave bilinear value noise at (s, t) in [0, 1]^2.

    persistence 0.8 keeps substantial high-frequency energy (corner-rich
    texture); see _make_noise_grids on why the frontend needs it."""
    v = np.zeros_like(s, dtype=np.float32)
    amp = 1.0
    for g in grids:
        n = g.shape[0] - 1
        x = np.clip(s, 0.0, 1.0) * n
        y = np.clip(t, 0.0, 1.0) * n
        x0 = np.minimum(x.astype(np.int32), n - 1)
        y0 = np.minimum(y.astype(np.int32), n - 1)
        fx = (x - x0).astype(np.float32)
        fy = (y - y0).astype(np.float32)
        v += amp * ((1 - fy) * ((1 - fx) * g[y0, x0] + fx * g[y0, x0 + 1])
                    + fy * ((1 - fx) * g[y0 + 1, x0] + fx * g[y0 + 1, x0 + 1]))
        amp *= persistence
    return v


class RenderedDataset:
    """Ray-cast renders of a textured box room along a known trajectory.

    Parameters
    ----------
    seed : texture seed (the "sequence" identity — different seeds are
        different rooms).
    noise_seed : per-run sensor-noise seed (None disables noise); the
        5-run protocol varies this, mirroring how the reference's threaded
        nondeterminism varies its re-runs (evaluate_euroc_vo.sh:3).
    trajectory : "loop" (closed full-yaw circle — exercises loop closure)
        or "smooth" (forward arc, pure VO).
    """

    # room bounds (the loop trajectory is a radius-2 circle with centers
    # (x, z) = (0, 2); keep every wall 2-4 m from the camera)
    XMIN, XMAX = -4.5, 4.5
    YMIN, YMAX = -2.5, 2.5
    ZMIN, ZMAX = -2.5, 6.5

    def __init__(self, cfg: Config, n_frames: int = 300, seed: int = 0,
                 noise_seed: Optional[int] = None, trajectory: str = "loop",
                 sensor_noise: float = 2.0):
        self.cfg = cfg
        self.n_frames = n_frames
        self.sensor_noise = sensor_noise
        self.noise_seed = noise_seed
        cam = cfg.camera
        self.K = np.array([cam.fx, cam.fy, cam.cx, cam.cy], np.float32)
        self.H, self.W = cam.height, cam.width
        if trajectory == "loop":
            self.poses = _rendered_loop_trajectory(n_frames)
        else:
            self.poses = _smooth_trajectory(n_frames)
        rng = np.random.default_rng(seed)
        # 6 faces: (axis, bound, su-axis, sv-axis); each gets its own texture
        self.faces = []
        for axis, bound in ((0, self.XMIN), (0, self.XMAX),
                            (1, self.YMIN), (1, self.YMAX),
                            (2, self.ZMIN), (2, self.ZMAX)):
            s_axis, t_axis = [a for a in range(3) if a != axis]
            self.faces.append(dict(
                axis=axis, bound=bound, s_axis=s_axis, t_axis=t_axis,
                grids=_make_noise_grids(rng)))
        self._lims = np.array([[self.XMIN, self.XMAX],
                               [self.YMIN, self.YMAX],
                               [self.ZMIN, self.ZMAX]], np.float32)
        # cached pinhole ray lattice (camera frame)
        uu, vv = np.meshgrid(np.arange(self.W, dtype=np.float32),
                             np.arange(self.H, dtype=np.float32))
        self._rays = np.stack([(uu - self.K[2]) / self.K[0],
                               (vv - self.K[3]) / self.K[1],
                               np.ones_like(uu)], -1)

    # ------------------------------------------------------------- rendering

    def _trace(self, o: np.ndarray, d: np.ndarray):
        """Intersect world rays (origin o (3,), dirs d (..., 3)) with the
        room -> (hit distance t, texture value) arrays of d's lead shape."""
        lead = d.shape[:-1]
        best_t = np.full(lead, np.inf, np.float32)
        val = np.zeros(lead, np.float32)
        for f in self.faces:
            a, b = f["axis"], f["bound"]
            da = d[..., a]
            safe = np.where(np.abs(da) < 1e-9, 1e-9, da)
            t = (b - o[a]) / safe
            X = o[(None,) * len(lead) + (slice(None),)] + t[..., None] * d
            sa, ta = f["s_axis"], f["t_axis"]
            (s0, s1), (t0, t1) = self._lims[sa], self._lims[ta]
            hit = ((t > 1e-3) & (t < best_t)
                   & (X[..., sa] >= s0 - 1e-3) & (X[..., sa] <= s1 + 1e-3)
                   & (X[..., ta] >= t0 - 1e-3) & (X[..., ta] <= t1 + 1e-3))
            if not hit.any():
                continue
            s = (X[..., sa][hit] - s0) / (s1 - s0)
            tt = (X[..., ta][hit] - t0) / (t1 - t0)
            val[hit] = _eval_noise(f["grids"], s, tt)
            best_t[hit] = t[hit]
        return best_t, val

    def render(self, Twc: np.ndarray) -> np.ndarray:
        """Exact ray-cast of the room from pose Twc -> (H, W) uint8."""
        Rwc = Twc[:3, :3].astype(np.float32)
        o = Twc[:3, 3].astype(np.float32)
        d = self._rays @ Rwc.T                      # (H, W, 3) world rays
        best_t, val = self._trace(o, d)
        # normalize to a fixed global range (value noise with these octave
        # weights is ~N(0, 1.5)); mild distance shading for realism
        img = 0.5 + 0.28 * val
        img = img * (1.0 / (1.0 + 0.03 * np.minimum(best_t, 20.0)))
        return np.clip(img * 255.0, 0, 255).astype(np.uint8)

    def raycast(self, Twc: np.ndarray, uv: np.ndarray):
        """World hit points of pixel rays (exact dense ground truth — the
        training correspondence source).  uv (N, 2) -> (X (N, 3), hit (N,))."""
        Rwc = Twc[:3, :3].astype(np.float32)
        o = Twc[:3, 3].astype(np.float32)
        rays = np.stack([(uv[:, 0] - self.K[2]) / self.K[0],
                         (uv[:, 1] - self.K[3]) / self.K[1],
                         np.ones(len(uv), np.float32)], -1)
        d = rays @ Rwc.T
        t, _ = self._trace(o, d)
        hit = np.isfinite(t)
        X = o[None, :] + np.where(hit, t, 0.0)[:, None] * d
        return X.astype(np.float32), hit

    def random_pose(self, rng: np.random.Generator,
                    margin: float = 1.3) -> np.ndarray:
        """Uniform random camera pose in the room interior (training-pair
        base poses): position keeps `margin` from every wall, free yaw,
        mild pitch/roll."""
        pos = np.array([
            rng.uniform(self.XMIN + margin, self.XMAX - margin),
            rng.uniform(self.YMIN + margin, self.YMAX - margin),
            rng.uniform(self.ZMIN + margin, self.ZMAX - margin)])
        yaw = rng.uniform(0, 2 * np.pi)
        pitch = rng.uniform(-0.15, 0.15)
        roll = rng.uniform(-0.1, 0.1)
        cy, sy = np.cos(yaw), np.sin(yaw)
        cp, sp = np.cos(pitch), np.sin(pitch)
        cr, sr = np.cos(roll), np.sin(roll)
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        Rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
        Rz = np.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]])
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = (Ry @ Rx @ Rz).astype(np.float32)
        T[:3, 3] = pos
        return T

    # --------------------------------------------------------------- dataset

    def frame(self, i: int) -> RawFrame:
        img = self.render(self.poses[i])
        if self.sensor_noise > 0 and self.noise_seed is not None:
            rng = np.random.default_rng(
                (int(self.noise_seed) + 1) * 100003 + i)
            img = np.clip(img.astype(np.float32)
                          + rng.normal(0, self.sensor_noise, img.shape),
                          0, 255).astype(np.uint8)
        return RawFrame(timestamp=i / self.cfg.camera.fps, image=img,
                        gt_pose=self.poses[i])

    def __len__(self):
        return self.n_frames

    def __iter__(self) -> Iterator[RawFrame]:
        for i in range(self.n_frames):
            yield self.frame(i)

    def gt_trajectory(self):
        ts = np.arange(self.n_frames) / self.cfg.camera.fps
        return ts, self.poses
