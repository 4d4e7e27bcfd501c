"""NVScoreVariants reference-architecture compatibility tests: the JAX forward
must reproduce the PyTorch GATK_CNN_1D/GATK_CNN_2D (scorevariants/models/) on a
converted state_dict, proving the shipped .pt weights
(resources/large/nvscorevariants/) load directly."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from gatk_tpu.calling import nvscore_models as nv  # noqa: E402


class TorchCNN1D(nn.Module):
    """Verbatim GATK_CNN_1D architecture (scorevariants/models/gatk_1d.py)."""

    def __init__(self):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv1d(4, 256, 12), nn.ReLU(),
            nn.Conv1d(256, 256, 12), nn.ReLU(), nn.Dropout(0.1),
            nn.Conv1d(256, 128, 12), nn.ReLU(), nn.Dropout(0.1))
        self.normalize = nn.BatchNorm1d(7, eps=0.001, momentum=0.99)
        self.dense_1 = nn.Sequential(nn.Linear(7, 40), nn.ReLU())
        self.dense_2 = nn.Sequential(nn.Linear(12200, 40), nn.ReLU(), nn.Dropout(0.2))
        self.dense_3 = nn.Linear(47, 4)

    def forward(self, batch):
        conv = self.conv(torch.transpose(batch["reference"], 1, 2))
        conv = torch.flatten(torch.transpose(conv, 1, 2), 1)
        norm = self.normalize(batch["best_practices"])
        d1 = self.dense_1(norm)
        d2 = self.dense_2(torch.cat((conv, d1), -1))
        return self.dense_3(torch.cat((d2, norm), -1))


class TorchCNN2D(nn.Module):
    """Verbatim GATK_CNN_2D architecture (scorevariants/models/gatk_2d.py)."""

    def __init__(self):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(15, 64, (25, 1)), nn.ReLU(), nn.Dropout(0.1),
            nn.Conv2d(64, 48, (1, 25)), nn.ReLU(), nn.Dropout2d(0.1),
            nn.Conv2d(48, 32, (25, 1)), nn.ReLU(), nn.Dropout2d(0.1),
            nn.MaxPool2d((3, 1), (3, 1)),
            nn.Conv2d(32, 24, (1, 25)), nn.ReLU(), nn.Dropout2d(0.1),
            nn.MaxPool2d((3, 1), (3, 1)))
        self.dense_1 = nn.Sequential(nn.BatchNorm1d(7, eps=0.001, momentum=0.99),
                                     nn.Linear(7, 64), nn.ReLU())
        self.dense_2 = nn.Sequential(nn.Linear(15424, 24), nn.ReLU(),
                                     nn.Dropout(0.3), nn.Linear(24, 4))

    def forward(self, batch):
        conv = self.conv(batch["read_tensor"].permute((0, 3, 1, 2)))
        conv = torch.flatten(conv.permute((0, 2, 3, 1)), 1)
        d1 = self.dense_1(batch["best_practices"])
        return self.dense_2(torch.cat((conv, d1), -1))


def _randomize_bn(m):
    # non-trivial running stats so the eval-mode normalization is exercised
    for mod in m.modules():
        if isinstance(mod, nn.BatchNorm1d):
            mod.running_mean.data = torch.randn_like(mod.running_mean) * 10
            mod.running_var.data = torch.rand_like(mod.running_var) * 5 + 0.1
            mod.weight.data = torch.randn_like(mod.weight)
            mod.bias.data = torch.randn_like(mod.bias)


def test_1d_jax_matches_torch(tmp_path):
    torch.manual_seed(0)
    model = TorchCNN1D().eval()
    _randomize_bn(model)
    pt = str(tmp_path / "weights_1d.pt")
    torch.save(model.state_dict(), pt)

    params = nv.load_torch_1d(pt)
    rng = np.random.default_rng(0)
    B = 3
    ref = np.zeros((B, 128, 4), np.float32)
    idx = rng.integers(0, 4, (B, 128))
    for b in range(B):
        ref[b, np.arange(128), idx[b]] = 1.0
    ann = rng.normal(30, 10, (B, 7)).astype(np.float32)
    with torch.no_grad():
        want = model({"reference": torch.from_numpy(ref),
                      "best_practices": torch.from_numpy(ann)}).numpy()
    got = np.asarray(nv.forward_1d(params, ref, ann))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_1d_loader_accepts_checkpoint_wrappers(tmp_path):
    torch.manual_seed(1)
    model = TorchCNN1D().eval()
    pt = str(tmp_path / "ckpt.pt")
    torch.save({"state_dict": {f"model.{k}": v for k, v in
                               model.state_dict().items()}}, pt)
    params = nv.load_torch_1d(pt)
    assert params["conv0_w"].shape == (256, 4, 12)
    assert params["d2_w"].shape == (40, 12200)


def test_2d_jax_matches_torch(tmp_path):
    torch.manual_seed(2)
    model = TorchCNN2D().eval()
    _randomize_bn(model)
    pt = str(tmp_path / "weights_2d.pt")
    torch.save(model.state_dict(), pt)

    params = nv.load_torch_2d(pt)
    rng = np.random.default_rng(2)
    B = 2
    reads = rng.random((B, 128, 128, 15)).astype(np.float32)
    ann = rng.normal(30, 10, (B, 7)).astype(np.float32)
    with torch.no_grad():
        want = model({"read_tensor": torch.from_numpy(reads),
                      "best_practices": torch.from_numpy(ann)}).numpy()
    got = np.asarray(nv.forward_2d(params, reads, ann))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_reference_encoding():
    enc = nv.encode_reference_window("ACGTN" + "A" * 123)
    assert enc.shape == (128, 4)
    assert enc[0].tolist() == [1, 0, 0, 0]
    assert enc[3].tolist() == [0, 0, 0, 1]
    assert enc[4].sum() == 0  # N row all-zero
    ann = nv.encode_best_practices({"MQ": "60.0", "DP": 100, "QD": "12.5"})
    assert ann.tolist()[:2] == [60.0, 100.0]
    assert ann[4] == 12.5 and ann[2] == 0.0
