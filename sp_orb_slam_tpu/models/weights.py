"""Checkpoint loading for the SuperPoint frontend.

The reference loads `superpoint.pt` with torch::load into its C++ module
(src/cv/sp_extractor.cpp:354-357).  That blob is stripped from our snapshot
(/root/reference/.MISSING_LARGE_BLOBS), so this converter accepts any
SuperPoint-format checkpoint whose state_dict uses the canonical layer names
conv1a..convDb (the magicleap SuperPointNet layout and the reference's
register_module names, sp_extractor.cpp:46-63), in either:

- a torch .pth/.pt state_dict (torch is CPU-only in this image and used
  strictly as a file reader here — no torch compute anywhere), or
- a numpy .npz with keys "<layer>.weight" / "<layer>.bias".

Torch conv weights are OIHW; ours are HWIO.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from sp_orb_slam_tpu.models.superpoint import LAYERS


def _convert_state_dict(state: Dict[str, Any]) -> Dict[str, Any]:
    params = {}
    for name, cin, cout, k in LAYERS:
        w = None
        b = None
        for prefix in (name, f"module.{name}", f"model.{name}"):
            if f"{prefix}.weight" in state:
                w = np.asarray(state[f"{prefix}.weight"], dtype=np.float32)
                b = np.asarray(state[f"{prefix}.bias"], dtype=np.float32)
                break
        if w is None:
            raise KeyError(f"checkpoint missing layer {name!r}")
        if w.shape != (cout, cin, k, k):
            raise ValueError(f"{name}: expected {(cout, cin, k, k)}, got {w.shape}")
        params[name] = {"w": np.transpose(w, (2, 3, 1, 0)), "b": b}
    return params


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load and convert a SuperPoint checkpoint (.pt/.pth/.npz).

    Handles all three flavors in the wild: a plain pickled state_dict (the
    magicleap superpoint_v1.pth), a pickled nn.Module, and a torchscript
    archive (what the reference's C++ `torch::save`/`torch::load` pair
    produces for superpoint.pt, sp_extractor.cpp:354-357 — torch.load
    cannot read those; torch.jit.load can)."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            state = {k: z[k] for k in z.files}
        return _convert_state_dict(state)
    import torch  # file reader only

    try:
        blob = torch.load(path, map_location="cpu", weights_only=False)
    except RuntimeError:  # torchscript archive ("please use torch.jit.load")
        blob = torch.jit.load(path, map_location="cpu")
    if hasattr(blob, "state_dict"):
        blob = blob.state_dict()
    state = {k: v.detach().numpy() for k, v in blob.items()}
    return _convert_state_dict(state)


def save_npz(params: Dict[str, Any], path: str) -> None:
    """Save our params pytree as the portable .npz interchange format."""
    flat = {}
    for name, p in params.items():
        flat[f"{name}.weight"] = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
        flat[f"{name}.bias"] = np.asarray(p["b"])
    np.savez(path, **flat)
