"""Native C++ data loader (native/dataio.cpp via ctypes).

Exactness against PIL, in-order prefetch delivery, and the PIL fallback.
Reference counterpart: src/io/data_loader.cc (cv::imread on the tracking
thread); ours decodes ahead on a worker pool.
"""

import os

import numpy as np
import pytest
from PIL import Image

from sp_orb_slam_tpu.io import native_loader as nl

pytestmark = pytest.mark.skipif(not nl.available(),
                                reason="native dataio not buildable here")


def _write_pngs(tmp_path, n=12, w=96, h=64, mode="L"):
    rng = np.random.default_rng(7)
    paths = []
    for i in range(n):
        arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
        if mode == "RGB":
            arr = np.stack([arr, arr // 2, arr // 3], -1)
        p = os.path.join(tmp_path, f"f{i:04d}.png")
        Image.fromarray(arr, mode=mode).save(p)
        paths.append(p)
    return paths


def test_png_gray_matches_pil(tmp_path):
    paths = _write_pngs(str(tmp_path), n=3)
    for p in paths:
        ours = nl.png_gray(p)
        ref = np.asarray(Image.open(p).convert("L"))
        np.testing.assert_array_equal(ours, ref)


def test_png_gray_rgb_input(tmp_path):
    """Color PNGs are converted to gray in-library (like imread GRAYSCALE);
    coefficients differ slightly from PIL's — allow small tolerance."""
    paths = _write_pngs(str(tmp_path), n=2, mode="RGB")
    for p in paths:
        ours = nl.png_gray(p).astype(np.int32)
        ref = np.asarray(Image.open(p).convert("L")).astype(np.int32)
        assert np.abs(ours - ref).max() <= 3


def test_prefetcher_in_order_and_exact(tmp_path):
    paths = _write_pngs(str(tmp_path), n=12)
    refs = [np.asarray(Image.open(p).convert("L")) for p in paths]
    got = list(nl.PngPrefetcher(paths, ring=3, threads=4))
    assert len(got) == len(refs)
    for g, r in zip(got, refs):
        np.testing.assert_array_equal(g, r)


def test_prefetcher_early_close(tmp_path):
    paths = _write_pngs(str(tmp_path), n=12)
    pf = nl.PngPrefetcher(paths, ring=2, threads=2)
    next(pf)
    next(pf)
    pf.close()  # must join workers without deadlock


def test_iter_gray_images_fallback(tmp_path, monkeypatch):
    paths = _write_pngs(str(tmp_path), n=3)
    refs = [np.asarray(Image.open(p).convert("L")) for p in paths]
    monkeypatch.setattr(nl, "available", lambda: False)
    got = list(nl.iter_gray_images(paths))
    for g, r in zip(got, refs):
        np.testing.assert_array_equal(g, r)


def test_missing_file_errors(tmp_path):
    with pytest.raises(IOError):
        nl.png_gray(os.path.join(str(tmp_path), "nope.png"))
