"""Checkpoint-loading readiness (VERDICT r2 #9): verify load_checkpoint
against genuine torch fixtures in every flavor the wild carries —
a pickled state_dict (magicleap superpoint_v1.pth layout), a pickled
nn.Module, a torchscript archive (the reference's C++ torch::save format,
sp_extractor.cpp:354-357), and the .npz interchange — all converted to
identical HWIO params."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sp_orb_slam_tpu.models.superpoint import LAYERS
from sp_orb_slam_tpu.models.weights import load_checkpoint, save_npz


class _SuperPointNet(torch.nn.Module):
    """The magicleap SuperPointNet attribute layout (conv1a..convDb), which
    is also the reference's register_module naming (sp_extractor.cpp:46-63)."""

    def __init__(self):
        super().__init__()
        for name, cin, cout, k in LAYERS:
            setattr(self, name,
                    torch.nn.Conv2d(cin, cout, k, padding=(k - 1) // 2))

    def forward(self, x):  # minimal graph so torch.jit.script accepts it
        return self.conv1a(x)


def _assert_params_match(params, net):
    for name, cin, cout, k in LAYERS:
        w_t = getattr(net, name).weight.detach().numpy()  # OIHW
        b_t = getattr(net, name).bias.detach().numpy()
        assert params[name]["w"].shape == (k, k, cin, cout)
        np.testing.assert_array_equal(
            params[name]["w"], np.transpose(w_t, (2, 3, 1, 0)))
        np.testing.assert_array_equal(params[name]["b"], b_t)


@pytest.fixture(scope="module")
def net():
    torch.manual_seed(7)
    return _SuperPointNet().eval()


def test_load_state_dict_pt(net, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("w") / "superpoint_v1.pth")
    torch.save(net.state_dict(), p)
    _assert_params_match(load_checkpoint(p), net)


def test_load_pickled_module_pt(net, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("w") / "module.pt")
    torch.save(net, p)
    _assert_params_match(load_checkpoint(p), net)


def test_load_torchscript_archive(net, tmp_path_factory):
    """The reference's superpoint.pt flavor: C++ torch::save writes a
    torchscript archive, unreadable by torch.load."""
    p = str(tmp_path_factory.mktemp("w") / "superpoint.pt")
    torch.jit.script(net).save(p)
    _assert_params_match(load_checkpoint(p), net)


def test_npz_roundtrip(net, tmp_path_factory):
    d = tmp_path_factory.mktemp("w")
    pt = str(d / "sd.pt")
    torch.save(net.state_dict(), pt)
    params = load_checkpoint(pt)
    npz = str(d / "sp.npz")
    save_npz(params, npz)
    again = load_checkpoint(npz)
    for name, *_ in LAYERS:
        np.testing.assert_array_equal(params[name]["w"], again[name]["w"])
        np.testing.assert_array_equal(params[name]["b"], again[name]["b"])
