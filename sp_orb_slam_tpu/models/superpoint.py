"""SuperPoint-style frontend as pure, batched JAX (NHWC, MXU-friendly).

Capability parity with the reference SPFrontend (a libtorch module built in
C++; src/cv/sp_extractor.cpp:23-158):

- shared VGG encoder: 4 conv pairs (64, 64, 128, 128 ch), ReLU, 2x2 maxpool
  after pairs 1-3 (sp_extractor.cpp:81-94);
- detector head convPa(256, 3x3) + convPb(65, 1x1); 65 = 8x8 cell pixels + a
  "dustbin" channel (:96-97);
- descriptor head convDa(256, 3x3) + convDb(256, 1x1), L2-normalized over
  channels (:99-103);
- per-pixel softmax over the 65 channels; `semi_dust` = dustbin *logit* map,
  `dense_dust` = dustbin *probability* map, `nodust` = 64 cell-pixel
  probabilities (:105-108);
- per-cell max -> candidate score + in-cell argmax -> pixel coords
  (:112-119);
- full-resolution log-probability "heat" map = pixel_shuffle(log(clamp(
  nodust, 1e-3)), 8) (:128-131), then the host wrapper's [0,1] normalization
  heat/heat_inv (:466-478);
- bilinear descriptor sampling at keypoint coords with torch
  grid_sampler_2d(align_corners=True) semantics + renormalize (:134-148).

TPU-native design differences (behavior-preserving):
- everything is batched over a leading stream dimension from day one;
- candidates stay as dense per-cell grids (hc x wc) instead of
  masked_select'ed ragged lists — static shapes for XLA; the confidence
  mask (score >= conf_thresh, hardcoded 0.007 at :122) becomes a validity
  mask consumed by the NMS stage;
- descriptor sampling happens *after* NMS for the surviving keypoints only
  (the sampled values are identical — sampling depends only on coords).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# encoder/head channel plan (sp_extractor.cpp:16-21)
C1, C2, C3, C4, C5, D1 = 64, 64, 128, 128, 256, 256

LAYERS = (
    # name, in_ch, out_ch, ksize
    ("conv1a", 1, C1, 3),
    ("conv1b", C1, C1, 3),
    ("conv2a", C1, C2, 3),
    ("conv2b", C2, C2, 3),
    ("conv3a", C2, C3, 3),
    ("conv3b", C3, C3, 3),
    ("conv4a", C3, C4, 3),
    ("conv4b", C4, C4, 3),
    ("convPa", C4, C5, 3),
    ("convPb", C5, 65, 1),
    ("convDa", C4, C5, 3),
    ("convDb", C5, D1, 1),
)


class FrontendOut(NamedTuple):
    """Dense frontend outputs for a batch of B images (H, W)."""

    semi_dust: jnp.ndarray    # (B, hc, wc)  dustbin logits
    dense_dust: jnp.ndarray   # (B, hc, wc)  dustbin probability
    score: jnp.ndarray        # (B, hc, wc)  per-cell max probability
    cand_uv: jnp.ndarray      # (B, hc, wc, 2) in-cell argmax pixel coords (u, v)
    cand_valid: jnp.ndarray   # (B, hc, wc)  score >= conf_thresh
    coarse_desc: jnp.ndarray  # (B, hc, wc, 256) L2-normalized coarse descriptors
    heat: jnp.ndarray         # (B, H, W)  normalized "coldness" in [0, 1]
    heat_inv: jnp.ndarray     # (B, H, W)  1 - heat (peaks at keypoints)


def init_params(key: jax.Array, dtype=jnp.float32) -> Dict[str, Any]:
    """Kaiming-uniform initialized parameters (torch Conv2d default init), as
    a {name: {w: (kh, kw, cin, cout), b: (cout,)}} pytree."""
    params = {}
    for name, cin, cout, k in LAYERS:
        key, k1, k2 = jax.random.split(key, 3)
        fan_in = cin * k * k
        bound_w = float(np.sqrt(6.0 / fan_in))  # kaiming_uniform(a=sqrt(5))
        bound_b = float(1.0 / np.sqrt(fan_in))
        params[name] = {
            "w": jax.random.uniform(k1, (k, k, cin, cout), dtype, -bound_w, bound_w),
            "b": jax.random.uniform(k2, (cout,), dtype, -bound_b, bound_b),
        }
    return params


def _conv(x, p, *, relu=True):
    w = p["w"].astype(x.dtype)
    pad = (w.shape[0] - 1) // 2
    # In float32 mode force full-precision MXU passes (the TPU default
    # truncates operands to bf16); in bfloat16 mode the operands already are.
    precision = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    # f32 conv outputs + fused bias/relu/cast: measured FASTER than
    # bf16-direct conv outputs on v5e (45.4 vs 48.5 ms/batch at B=32,
    # scripts/profile_r3.py round 3) — the bf16-output lowering loses more
    # in the conv custom call than it saves in inter-layer traffic.
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    y = y + p["b"].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _pack_conv(w: np.ndarray, b: np.ndarray):
    """Exact 2x2 space-to-depth repacking of one 3x3 `same`-padded conv:
    (3, 3, Cin, Cout) -> (3, 3, 4*Cin, 4*Cout) operating on the packed
    (H/2, W/2, 4*Cin) layout.

      out(2i+a, 2j+b, k) = sum_{dy,dx} w[dy,dx] x(2i+a+dy, 2j+b+dx)

    maps tap (dy, dx) of output sub-position (a, b) onto packed offset
    (floor((a+dy)/2), floor((b+dx)/2)) and packed input sub-position
    ((a+dy)%2, (b+dx)%2); the packed zero-padding ring reproduces the
    full-resolution padding exactly (taps never reach row/col -2).
    """
    _, _, Cin, Cout = w.shape
    wp = np.zeros((3, 3, 4 * Cin, 4 * Cout), w.dtype)
    bp = np.zeros(4 * Cout, b.dtype)
    for a in (0, 1):
        for c in (0, 1):
            s_out = 2 * a + c
            bp[s_out * Cout:(s_out + 1) * Cout] = b
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    pm = (a + dy) // 2
                    pn = (c + dx) // 2
                    s_in = 2 * ((a + dy) % 2) + ((c + dx) % 2)
                    wp[pm + 1, pn + 1, s_in * Cin:(s_in + 1) * Cin,
                       s_out * Cout:(s_out + 1) * Cout] += w[dy + 1, dx + 1]
    return wp, bp


def _pack_pair(params: Dict[str, Any], name_a: str, name_b: str):
    """Pack a conv-conv-maxpool pair for the 2x2 space-to-depth layout.

    The 1/64-channel early layers under-fill the MXU (contraction
    1*3*3 = 9 of 128 for conv1a, 64 output lanes of 128 elsewhere); on
    the packed layout the SAME math becomes convs with 4x the channels at
    1/4 the spatial positions (full lanes, identical FLOPs).  The 2x2
    maxpool that follows the pair collapses the 4 sub-position channel
    groups (they ARE the pooling window), after which the stack continues
    unchanged.

    MEASURED (v5e, scripts/profile_r3.py, full fused program at B=32):
    a NET LOSS at every depth — none 45.0 ms/batch, s2d 54.6, s2d2 62.1,
    s2d3 68.4.  XLA's own conv lowering handles the 64-channel layers
    better than this reformulation (the packed path adds space-to-depth
    relayouts and 4x-larger weight matrices, and breaks XLA's
    conv+bias+relu+cast epilogue fusion with the reshape/max unpack).
    Kept as an exact, golden-tested option because the trade-off is
    hardware/compiler-version dependent.
    """
    wa, ba = _pack_conv(np.asarray(params[name_a]["w"]),
                        np.asarray(params[name_a]["b"]))
    wb, bb = _pack_conv(np.asarray(params[name_b]["w"]),
                        np.asarray(params[name_b]["b"]))
    return ({"w": jnp.asarray(wa), "b": jnp.asarray(ba)},
            {"w": jnp.asarray(wb), "b": jnp.asarray(bb)})


def _space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); sub-position s = 2*dy + dx is the
    leading factor of the packed channel index."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        B, H // 2, W // 2, 4 * C)


def forward(params: Dict[str, Any], images: jnp.ndarray, *,
            conf_thresh: float = 0.007, cell: int = 8,
            conv_packing: str = "none",
            with_heat: bool = True,
            with_heat_inv: bool = True,
            heat_shuffle: str = "slices",
            compute_dtype=jnp.float32) -> FrontendOut:
    """Run the frontend on images (B, H, W) float32 in [0, 1].

    Heavy conv stack runs in `compute_dtype` (bfloat16 keeps the MXU fed);
    heads and probabilities are accumulated/finished in float32.
    """
    B, H, W = images.shape
    hc, wc = H // cell, W // cell
    x = images[..., None].astype(compute_dtype)

    # "s2d" packs pair 1, "s2d2" pairs 1-2, "s2d3" pairs 1-3 (see
    # _pack_pair): full-lane MXU convs at 1/4 the positions; the trailing
    # max over sub-position groups IS the pair's 2x2 maxpool, so each
    # packed pair hands the stock layout to the next stage.  "pair1" /
    # "pair1t" run the first pair as a fused Pallas kernel
    # (ops/pallas_pair1.py im2col-transpose layout / ops/pallas_pair1t.py
    # transposed layout, bfloat16 path only) — conv + bias + relu + pool
    # in one pass with no full-resolution HBM round trips.
    depth = {"none": 0, "s2d": 1, "s2d2": 2, "s2d3": 3,
             "pair1": 0, "pair1t": 0}[conv_packing]
    start = 0
    if conv_packing in ("pair1", "pair1t"):
        assert compute_dtype == jnp.bfloat16, \
            "pair1 fused kernels are the bfloat16 path"
        interp = jax.default_backend() != "tpu"
        if conv_packing == "pair1":
            from sp_orb_slam_tpu.ops import pallas_pair1

            x = pallas_pair1.fused_pair1(images, params, interpret=interp)
        else:
            from sp_orb_slam_tpu.ops import pallas_pair1t

            x = pallas_pair1t.fused_pair1t(images, params, interpret=interp)
        start = 1
    for i, (na, nb) in enumerate(
            (("conv1a", "conv1b"), ("conv2a", "conv2b"),
             ("conv3a", "conv3b"))):
        if i < start:
            continue
        if i < depth:
            pa, pb = _pack_pair(params, na, nb)
            xp = _conv(_conv(_space_to_depth(x), pa), pb)
            Bq, Hq, Wq, Cq = xp.shape
            x = jnp.max(xp.reshape(Bq, Hq, Wq, 4, Cq // 4), axis=3)
        else:
            x = _maxpool2(_conv(_conv(x, params[na]), params[nb]))
    x = _conv(x, params["conv4a"])
    x = _conv(x, params["conv4b"])

    cPa = _conv(x, params["convPa"])
    semi = _conv(cPa, params["convPb"], relu=False).astype(jnp.float32)  # (B, hc, wc, 65)

    cDa = _conv(x, params["convDa"])
    coarse = _conv(cDa, params["convDb"], relu=False).astype(jnp.float32)  # (B, hc, wc, 256)
    coarse = coarse / jnp.linalg.norm(coarse, axis=-1, keepdims=True)

    # log-sum-exp formulation of the softmax head (round-4 tail work): the
    # old path materialized the full (B, hc, wc, 65) softmax — lane-padded
    # 65 -> 128, so every pass over it cost double — only to take the max /
    # dustbin / log of it.  softmax is monotone in the logits, so
    #   argmax(softmax)       == argmax(semi[..., :64])
    #   max(softmax)          == exp(cellmax - lse)
    #   softmax[..., 64]      == exp(semi_dust - lse)
    #   log(clip(softmax, p)) == max(semi - lse, log p)
    # and the big tensor never exists.  Values differ from the exp-then-
    # log/max route only at the ~1 ulp level (the subtraction form is the
    # numerically better one); all golden tolerances are >= 1e-6.
    lse = jax.scipy.special.logsumexp(semi, axis=-1)       # (B, hc, wc)
    semi_nodust = semi[..., :64]  # channel c <-> in-cell (dy=c//8, dx=c%8)
    semi_dust = semi[..., 64]
    dense_dust = jnp.exp(semi_dust - lse)

    cellmax = jnp.max(semi_nodust, axis=-1)
    score = jnp.exp(cellmax - lse)
    idx = jnp.argmax(semi_nodust, axis=-1).astype(jnp.int32)
    dy, dx = idx // cell, idx % cell
    cell_v = jax.lax.broadcasted_iota(jnp.int32, (B, hc, wc), 1) * cell
    cell_u = jax.lax.broadcasted_iota(jnp.int32, (B, hc, wc), 2) * cell
    cand_uv = jnp.stack([cell_u + dx, cell_v + dy], axis=-1)
    cand_valid = score >= conf_thresh

    if with_heat or with_heat_inv:
        # full-res log-prob heat + the host wrapper's normalization
        # (sp_extractor.cpp:128-131, 466-478): img = -log(clamp(p, 1e-3));
        # heat = (img - min) / (max - min), heat_inv = 1 - heat.
        # The per-image min/max come from CELL-level reductions (min/max
        # over pixels of clip(semi - lse) = clip(cellmax/cellmin - lse),
        # since clip is monotone) — no full-resolution reduction pass.
        # `heat` — used only by the heat-alignment tracker variant — is
        # materialized only on request (a (B, H, W) f32 output is ~46 MB
        # per 32-image batch), and heat_inv itself is skippable when the
        # caller only consumes it inside the graph (extractor cov stage).
        log_eps = jnp.log(jnp.float32(1e-3))
        heat_log = jnp.maximum(semi_nodust - lse[..., None], log_eps)
        mn = -jnp.max(jnp.maximum(cellmax - lse, log_eps),
                      axis=(1, 2)).reshape(B, 1, 1)
        mx = -jnp.min(jnp.maximum(jnp.min(semi_nodust, axis=-1) - lse,
                                  log_eps), axis=(1, 2)).reshape(B, 1, 1)
        # pixel_shuffle(x, 8): out[v*8+dy, u*8+dx] = in[dy*8+dx] @ cell (v, u)
        if heat_shuffle == "slices":
            # channel-slice formulation: for a fixed dy, output rows
            # dy, 8+dy, ... are exactly heat_log[..., dy*8:(dy+1)*8]
            # flattened row-major over (wc, 8) — a contiguous reshape with
            # W=752 on the minor axis instead of the 5D transpose whose
            # minor axis is the 8-wide dx (quarter-lane relayout).
            # Bit-identical relayout; the DEFAULT since the r5b chip A/B
            # (full fused program, B=32: 34.79 vs 35.08 ms/batch)
            rows = [heat_log[..., dy * cell:(dy + 1) * cell].reshape(B, hc, W)
                    for dy in range(cell)]
            heat_full = jnp.stack(rows, axis=2).reshape(B, H, W)
        else:
            heat_full = heat_log.reshape(B, hc, wc, cell, cell)
            heat_full = jnp.transpose(heat_full,
                                      (0, 1, 3, 2, 4)).reshape(B, H, W)
        heat_inv = (mx + heat_full) / (mx - mn)  # == 1 - (-hf - mn)/(mx - mn)
        heat = (1.0 - heat_inv) if with_heat else None
    else:
        heat = heat_inv = None

    return FrontendOut(semi_dust, dense_dust, score, cand_uv, cand_valid,
                       coarse, heat, heat_inv)


def sample_descriptors_dense(coarse: jnp.ndarray, cand_uv: jnp.ndarray,
                             image_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear descriptor sampling for every cell's candidate keypoint,
    with NO gather — the TPU-friendly reformulation of
    :func:`sample_descriptors`.

    Key fact: the sampling location of a candidate in cell (i, j) is
    x_c = u (wc-1)/W with u in [8j, 8j+7], which lies in (j-1, j+1) — so
    all four bilinear corners fall in the 3x3 cell neighborhood.  The
    gather therefore becomes a 9-tap stencil: per cell, fold the four
    corner weights onto the (dy, dx) shifts they land on (scalar (hc, wc)
    math), then accumulate w_s * shift_s(coarse) densely.  XLA fuses the
    9 taps into one elementwise pass; there is no serialized per-keypoint
    dynamic-slice chain (measured ~20x off bandwidth ideal on v5e,
    NOTES r2).  Emission then picks each surviving keypoint's OWN cell row
    — the same cheap row gather the uv/score emission already pays.

    coarse: (hc, wc, D); cand_uv: (hc, wc, 2) candidate pixel coords.
    Returns (hc, wc, D) unit-norm descriptors (exact match to
    sample_descriptors at each cell's candidate).
    """
    H, W = image_hw
    hc, wc, D = coarse.shape
    gx = cand_uv[..., 0].astype(jnp.float32) * (wc - 1) / W
    gy = cand_uv[..., 1].astype(jnp.float32) * (hc - 1) / H
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, wc - 1)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, hc - 1)
    x1 = jnp.minimum(x0 + 1, wc - 1)
    y1 = jnp.minimum(y0 + 1, hc - 1)
    du = gx - x0.astype(jnp.float32)
    dv = gy - y0.astype(jnp.float32)

    ci = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 1)
    # corner -> (dy, dx) shift relative to the cell, in {-1, 0, 1}
    corners = ((y0, x0, (1 - du) * (1 - dv)), (y0, x1, du * (1 - dv)),
               (y1, x0, (1 - du) * dv), (y1, x1, du * dv))
    w = {(dy, dx): jnp.zeros((hc, wc), jnp.float32)
         for dy in (-1, 0, 1) for dx in (-1, 0, 1)}
    for yy, xx, wt in corners:
        sy = yy - ci
        sx = xx - cj
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                hit = ((sy == dy) & (sx == dx)).astype(jnp.float32)
                w[(dy, dx)] = w[(dy, dx)] + hit * wt

    def shifted(dy, dx):
        # edge-clamped shift: out[i, j] = coarse[i+dy, j+dx]
        pad_y = (max(-dy, 0), max(dy, 0))
        pad_x = (max(-dx, 0), max(dx, 0))
        p = jnp.pad(coarse, (pad_y, pad_x, (0, 0)), mode="edge")
        return jax.lax.dynamic_slice(
            p, (pad_y[0] + dy, pad_x[0] + dx, 0), (hc, wc, D))

    desc = jnp.zeros((hc, wc, D), jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            desc = desc + w[(dy, dx)][..., None] * shifted(dy, dx)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    return desc / jnp.maximum(norm, 1e-12)


def sample_descriptors(coarse: jnp.ndarray, uv: jnp.ndarray,
                       image_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinearly sample L2-renormalized descriptors at pixel coords.

    Reproduces torch.grid_sampler_2d(coarse, grid, bilinear, zeros,
    align_corners=True) with grid = uv/(size/2) - 1 (sp_extractor.cpp:134-148):
    the sampling location in the coarse (hc, wc) map is
        x_c = u * (wc - 1) / W,   y_c = v * (hc - 1) / H.

    coarse: (hc, wc, D) for a single image; uv: (K, 2) float pixel coords.
    Returns (K, D) unit-norm descriptors.
    """
    H, W = image_hw
    hc, wc, D = coarse.shape
    gx = uv[:, 0] * (wc - 1) / W
    gy = uv[:, 1] * (hc - 1) / H
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, wc - 1)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, hc - 1)
    x1 = jnp.minimum(x0 + 1, wc - 1)
    y1 = jnp.minimum(y0 + 1, hc - 1)
    du = (gx - x0.astype(gx.dtype))[:, None]
    dv = (gy - y0.astype(gy.dtype))[:, None]
    d00 = coarse[y0, x0]
    d01 = coarse[y0, x1]
    d10 = coarse[y1, x0]
    d11 = coarse[y1, x1]
    desc = ((1 - du) * (1 - dv) * d00 + du * (1 - dv) * d01
            + (1 - du) * dv * d10 + du * dv * d11)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    return desc / jnp.maximum(norm, 1e-12)
