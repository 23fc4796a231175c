"""Train the SuperPoint frontend on procedurally rendered rooms.

The reference ships trained weights (`superpoint.pt`, loaded at
sp_extractor.cpp:354-357) that are stripped from this environment
(/root/reference/.MISSING_LARGE_BLOBS) — so instead of running the image
pipeline on random weights forever, we TRAIN the same architecture on the
ray-cast rendered rooms (io/render.py):

- **Detector head**: per-cell 65-way cross-entropy against Harris-corner
  labels (strongest corner pixel per 8x8 cell, dustbin when the cell has
  no corner).  This is MagicPoint-style bootstrap supervision — the
  original SuperPoint's first stage trains on synthetic corners exactly
  this way.
- **Descriptor head**: InfoNCE over ground-truth cell correspondences.
  The renderer's exact ray-cast geometry gives dense GT: cast the cell
  center of view A into the room, project the hit point into view B —
  no homographic-adaptation approximation needed.
- **Dustbin**: trained jointly by the detector CE (cells without corners
  -> class 64), which makes `dense_dust` a real "no feature here"
  probability — the semantics the dust coarse tracker
  (tracker_dust.cpp:22-228) aligns against.

Why it matters downstream: every matcher/tracker threshold in the
reference (TH_LOW=0.3 / TH_HIGH=0.7, dust association 0.75,
sp_matcher.cpp:18-19) is calibrated for trained-SuperPoint descriptor
statistics (matched pairs ~0.2-0.5 L2, random pairs ~1.4).  Random-weight
descriptors collapse to a ~0.2-diameter cluster, putting every gate in
its always-pass regime; training restores the calibrated regime.

Run (TPU-preferred; CPU works for smoke tests):
    python -m sp_orb_slam_tpu.train.superpoint_train \
        --steps 3000 --out out/sp_rendered.npz
"""

from __future__ import annotations

import argparse
import time
from typing import Dict, List

import numpy as np

from sp_orb_slam_tpu.config import Config, _merge_dataclass


# ---------------------------------------------------------------------------
# labels + correspondences (host-side numpy, cached per rendered image)
# ---------------------------------------------------------------------------


def harris_response(img: np.ndarray, sigma: float = 1.5,
                    k: float = 0.06) -> np.ndarray:
    """Harris corner response on a [0, 255] grayscale image."""
    from scipy.ndimage import gaussian_filter

    I = img.astype(np.float32) / 255.0
    Iy, Ix = np.gradient(I)
    Sxx = gaussian_filter(Ix * Ix, sigma)
    Syy = gaussian_filter(Iy * Iy, sigma)
    Sxy = gaussian_filter(Ix * Iy, sigma)
    return Sxx * Syy - Sxy ** 2 - k * (Sxx + Syy) ** 2


def harris_cell_labels(img: np.ndarray, cell: int = 8,
                       thresh: float = 1e-5) -> np.ndarray:
    """Per-8x8-cell 65-way labels: index of the strongest corner pixel
    (row-major dy*8+dx), or 64 (dustbin) when the cell's best response is
    below `thresh` (1e-5 = the ~p50 of cell-max responses on the rendered
    texture -> ~50% corner cells, measured round 4).  Border cells are dustbin (image-gradient edge
    artifacts; matches the extractor's border-drop semantics)."""
    H, W = img.shape
    hc, wc = H // cell, W // cell
    R = harris_response(img)[:hc * cell, :wc * cell]
    cells = R.reshape(hc, cell, wc, cell).transpose(0, 2, 1, 3).reshape(
        hc, wc, cell * cell)
    amax = cells.argmax(-1).astype(np.int32)
    vmax = cells.max(-1)
    labels = np.where(vmax > thresh, amax, 64).astype(np.int32)
    labels[0, :] = 64
    labels[-1, :] = 64
    labels[:, 0] = 64
    labels[:, -1] = 64
    return labels


def cell_centers(H: int, W: int, cell: int = 8) -> np.ndarray:
    hc, wc = H // cell, W // cell
    u = cell / 2.0 - 0.5 + cell * np.arange(wc, dtype=np.float32)
    v = cell / 2.0 - 0.5 + cell * np.arange(hc, dtype=np.float32)
    uu, vv = np.meshgrid(u, v)
    return np.stack([uu.ravel(), vv.ravel()], -1)  # (hc*wc, 2)


def cell_correspondence(ds, Ta: np.ndarray, Tb: np.ndarray,
                        cell: int = 8) -> np.ndarray:
    """GT target cell in view B for each cell of view A (-1 = none).

    Exact: ray-cast A's cell centers into the room (the room is convex, so
    every wall point is visible from any interior pose — no occlusion
    handling needed), project into B, keep hits whose projection lands
    within one cell diagonal of the target cell center."""
    H, W = ds.H, ds.W
    hc, wc = H // cell, W // cell
    centers = cell_centers(H, W, cell)
    X, hit = ds.raycast(Ta, centers)
    Tcw_b = np.linalg.inv(Tb.astype(np.float64))
    pc = X @ Tcw_b[:3, :3].T + Tcw_b[:3, 3]
    z = pc[:, 2]
    ok = hit & (z > 0.1)
    u = ds.K[0] * pc[:, 0] / np.where(ok, z, 1.0) + ds.K[2]
    v = ds.K[1] * pc[:, 1] / np.where(ok, z, 1.0) + ds.K[3]
    cu = np.clip(np.round((u - (cell / 2.0 - 0.5)) / cell), 0, wc - 1)
    cv = np.clip(np.round((v - (cell / 2.0 - 0.5)) / cell), 0, hc - 1)
    du = u - (cell / 2.0 - 0.5 + cell * cu)
    dv = v - (cell / 2.0 - 0.5 + cell * cv)
    ok &= (u >= 0) & (u < W) & (v >= 0) & (v < H)
    ok &= np.hypot(du, dv) <= cell  # within one cell of the target center
    tgt = np.where(ok, (cv * wc + cu).astype(np.int64), -1)
    return tgt.astype(np.int32)  # (hc*wc,)


# ---------------------------------------------------------------------------
# training pool
# ---------------------------------------------------------------------------


def _perturbed_pose(rng: np.random.Generator, Ta: np.ndarray,
                    rot_deg: float = 8.0, trans: float = 0.3) -> np.ndarray:
    ang = np.radians(rng.normal(0, rot_deg, 3))

    def rot(a, axis):
        c, s = np.cos(a), np.sin(a)
        m = np.eye(3)
        i, j = [(1, 2), (0, 2), (0, 1)][axis]
        m[i, i] = c
        m[j, j] = c
        m[i, j] = -s if axis != 1 else s
        m[j, i] = s if axis != 1 else -s
        return m

    dR = rot(ang[0], 0) @ rot(ang[1], 1) @ rot(ang[2], 2)
    dT = np.eye(4)
    dT[:3, :3] = dR
    dT[:3, 3] = rng.normal(0, trans, 3)
    return (Ta @ dT).astype(np.float32)


def build_pool(cfg: Config, n_scenes: int = 4, pairs_per_scene: int = 100,
               seed: int = 0, verbose: bool = True) -> Dict[str, np.ndarray]:
    """Pre-render the training set: image pairs + labels + correspondences."""
    from sp_orb_slam_tpu.io.render import RenderedDataset

    img_a, img_b, lab_a, lab_b, corr = [], [], [], [], []
    t0 = time.time()
    for s in range(n_scenes):
        ds = RenderedDataset(cfg, n_frames=1, seed=seed * 131 + s)
        rng = np.random.default_rng(seed * 997 + s)
        for _ in range(pairs_per_scene):
            Ta = ds.random_pose(rng)
            Tb = _perturbed_pose(rng, Ta)
            ia, ib = ds.render(Ta), ds.render(Tb)
            img_a.append(ia)
            img_b.append(ib)
            lab_a.append(harris_cell_labels(ia))
            lab_b.append(harris_cell_labels(ib))
            corr.append(cell_correspondence(ds, Ta, Tb))
        if verbose:
            print(f"[pool] scene {s + 1}/{n_scenes} "
                  f"({time.time() - t0:.1f}s)", flush=True)
    pool = dict(
        img_a=np.stack(img_a), img_b=np.stack(img_b),
        lab_a=np.stack(lab_a), lab_b=np.stack(lab_b),
        corr=np.stack(corr))
    if verbose:
        n_corner = (pool["lab_a"] != 64).mean()
        n_corr = (pool["corr"] >= 0).mean()
        print(f"[pool] {len(img_a)} pairs; corner cells {n_corner:.0%}, "
              f"corresponding cells {n_corr:.0%}", flush=True)
    return pool


# ---------------------------------------------------------------------------
# model forward + losses (jax)
# ---------------------------------------------------------------------------


def train_forward(params, images):
    """(B, H, W) [0,1] float32 -> (semi logits (B,hc,wc,65),
    L2-normalized coarse desc (B,hc,wc,256)).  Mirrors
    models/superpoint.forward without the inference-only post-processing."""
    import jax.numpy as jnp

    from sp_orb_slam_tpu.models import superpoint as sp

    x = images[..., None]
    for na, nb in (("conv1a", "conv1b"), ("conv2a", "conv2b"),
                   ("conv3a", "conv3b")):
        x = sp._maxpool2(sp._conv(sp._conv(x, params[na]), params[nb]))
    x = sp._conv(x, params["conv4a"])
    x = sp._conv(x, params["conv4b"])
    semi = sp._conv(sp._conv(x, params["convPa"]), params["convPb"],
                    relu=False)
    coarse = sp._conv(sp._conv(x, params["convDa"]), params["convDb"],
                      relu=False)
    coarse = coarse / jnp.maximum(
        jnp.linalg.norm(coarse, axis=-1, keepdims=True), 1e-8)
    return semi, coarse


def make_loss_fn(tau: float = 0.1, w_desc: float = 1.0):
    import jax.numpy as jnp
    import optax

    def loss_fn(params, img_a, img_b, lab_a, lab_b, corr):
        B, H, W = img_a.shape
        semi, desc = train_forward(params, jnp.concatenate([img_a, img_b]))
        hc, wc = semi.shape[1], semi.shape[2]
        labels = jnp.concatenate([lab_a, lab_b]).reshape(2 * B, hc, wc)
        det = optax.softmax_cross_entropy_with_integer_labels(
            semi, labels).mean()
        N = hc * wc
        da = desc[:B].reshape(B, N, 256)
        db = desc[B:].reshape(B, N, 256)
        logits = jnp.einsum("bnc,bmc->bnm", da, db) / tau
        valid = corr >= 0
        tgt = jnp.clip(corr, 0, None)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, tgt)
        dl = jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1)
        return det + w_desc * dl, (det, dl)

    return loss_fn


def train(cfg: Config, pool: Dict[str, np.ndarray], steps: int = 3000,
          batch: int = 8, lr: float = 1e-3, seed: int = 0,
          params=None, log_every: int = 50, noise: float = 2.0,
          verbose: bool = True):
    """Adam training loop; returns the trained params pytree."""
    import jax
    import jax.numpy as jnp
    import optax

    from sp_orb_slam_tpu.models import superpoint as sp

    if params is None:
        params = sp.init_params(jax.random.PRNGKey(seed))
    sched = optax.cosine_decay_schedule(lr, steps, alpha=0.05)
    opt = optax.adam(sched)
    opt_state = opt.init(params)
    loss_fn = make_loss_fn()

    @jax.jit
    def step_fn(params, opt_state, img_a, img_b, lab_a, lab_b, corr):
        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, img_a, img_b, lab_a, lab_b, corr)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    rng = np.random.default_rng(seed + 17)
    n_pool = len(pool["img_a"])
    t0 = time.time()
    history: List[tuple] = []
    for it in range(steps):
        idx = rng.integers(0, n_pool, batch)

        def prep(imgs):
            x = imgs[idx].astype(np.float32)
            # photometric augmentation: sensor noise + gain/offset (the
            # dress-rehearsal renders carry distance shading + noise)
            x = x + rng.normal(0, noise, x.shape)
            gain = rng.uniform(0.8, 1.2, (batch, 1, 1))
            off = rng.uniform(-20, 20, (batch, 1, 1))
            return jnp.asarray(np.clip(x * gain + off, 0, 255) / 255.0,
                               jnp.float32)

        params, opt_state, loss, (det, dl) = step_fn(
            params, opt_state, prep(pool["img_a"]), prep(pool["img_b"]),
            jnp.asarray(pool["lab_a"][idx]), jnp.asarray(pool["lab_b"][idx]),
            jnp.asarray(pool["corr"][idx]))
        if verbose and (it % log_every == 0 or it == steps - 1):
            print(f"[train] step {it}: loss {float(loss):.4f} "
                  f"(det {float(det):.4f} desc {float(dl):.4f}) "
                  f"{time.time() - t0:.1f}s", flush=True)
            history.append((it, float(loss), float(det), float(dl)))
    return params, history


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--pairs", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--fx", type=float, default=260.0)
    ap.add_argument("--out", default="out/sp_rendered.npz")
    args = ap.parse_args()

    cfg = _merge_dataclass(Config(), {
        "camera": {"width": args.width, "height": args.height,
                   "fx": args.fx, "fy": args.fx,
                   "cx": args.width / 2.0, "cy": args.height / 2.0,
                   "fps": 20.0}})
    pool = build_pool(cfg, n_scenes=args.scenes, pairs_per_scene=args.pairs,
                      seed=args.seed)
    params, _ = train(cfg, pool, steps=args.steps, batch=args.batch,
                      lr=args.lr, seed=args.seed)

    import os

    from sp_orb_slam_tpu.models import weights

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    weights.save_npz(params, args.out)
    print(f"[train] saved {args.out}", flush=True)


if __name__ == "__main__":
    main()
