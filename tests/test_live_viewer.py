"""LiveViewer: HTTP endpoints, lazy renders, and the menu-toggle controls
(the reference Pangolin viewer's interactive surface, viz/viewer.cpp)."""

import json
import urllib.error
import urllib.request

from sp_orb_slam_tpu.config import Config, _merge_dataclass


def _get(url):
    try:
        with urllib.request.urlopen(url, timeout=10) as r:
            return r.status, r.headers.get("Content-Type"), r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


def _post(url):
    req = urllib.request.Request(url, method="POST", data=b"")
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_live_viewer_endpoints_and_controls():
    from sp_orb_slam_tpu.io.dataset import SyntheticDataset
    from sp_orb_slam_tpu.slam.system import System
    from sp_orb_slam_tpu.viz.live import LiveViewer

    cfg = _merge_dataclass(Config(), {"dataset": "synthetic"})
    system = System(cfg)
    viewer = LiveViewer(system)
    try:
        base = viewer.url.rstrip("/")

        # before any frame: page + placeholder render + state all serve
        st, ct, body = _get(base + "/")
        assert st == 200 and "text/html" in ct and b"sp_orb_slam_tpu" in body
        st, ct, body = _get(base + "/frame.png")
        assert st == 200 and ct == "image/png" and body[:4] == b"\x89PNG"
        st, _, body = _get(base + "/state")
        assert st == 200 and json.loads(body)["state"] == "INIT"

        # drive some frames so real overlays/map renders exist
        ds = SyntheticDataset(cfg, n_frames=12)
        for raw in ds:
            system.process(raw)
        assert system.viewer is viewer  # publish path wired

        st, ct, body = _get(base + "/frame.png")
        assert st == 200 and body[:4] == b"\x89PNG" and len(body) > 1000
        st, ct, body = _get(base + "/map.png")
        assert st == 200 and ct == "image/png" and body[:4] == b"\x89PNG"
        st, _, body = _get(base + "/state")
        rep = json.loads(body)
        assert rep["state"] == "OK" and rep["n_keyframes"] >= 1, rep

        # menu toggles drive the System atomics
        st, out = _post(base + "/control?cmd=pause")
        assert st == 200 and out["ok"] and system.paused
        _post(base + "/control?cmd=step")
        assert system.step_once
        _post(base + "/control?cmd=resume")
        assert not system.paused
        _post(base + "/control?cmd=loc_on")
        assert system._local_on
        st, out = _post(base + "/control?cmd=bogus")
        assert st == 400 and not out["ok"]
        st, _, _ = _get(base + "/nope")
        assert st == 404
    finally:
        viewer.close()
    assert system.viewer is None
