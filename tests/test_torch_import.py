"""Torch .pth checkpoint import (utils/torch_import.py).

Roundtrip: a freshly-written torch BuildNet-equivalent (the public
bearpaw-style CIFAR ResNet architecture the reference uses,
networks/resnet.py + networks/BuildNet.py) is saved as the reference's
``{'model': state_dict, 'epoch': N}`` .pth payload, imported, and the flax
forward is asserted allclose against the torch forward — weights, BN
running stats, heads and aux classifier all land in the right leaves.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from graphlearninglayer_tpu.models import BuildNet
from graphlearninglayer_tpu.train.trainer import create_train_state
from graphlearninglayer_tpu.utils.checkpoint import restore_checkpoint
from graphlearninglayer_tpu.utils.torch_import import convert_torch_state_dict


class TBasicBlock(tnn.Module):
    def __init__(self, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_planes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.shortcut = tnn.Sequential()
        if stride != 1 or in_planes != planes:
            self.shortcut = tnn.Sequential(
                tnn.Conv2d(in_planes, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + self.shortcut(x))


class TResNet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 3, 1, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        planes, in_p = (64, 128, 256, 512), 64
        for li, p in enumerate(planes, start=1):
            blocks = []
            for b in range(2):
                stride = 2 if (li > 1 and b == 0) else 1
                blocks.append(TBasicBlock(in_p, p, stride))
                in_p = p
            setattr(self, f"layer{li}", tnn.Sequential(*blocks))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        for li in range(1, 5):
            out = getattr(self, f"layer{li}")(out)
        return torch.flatten(F.adaptive_avg_pool2d(out, 1), 1)


class TBuildNet(tnn.Module):
    def __init__(self, head="mlp", feat_dim=128, num_classes=10):
        super().__init__()
        self.encoder = TResNet18()
        if head == "mlp":
            self.head = tnn.Sequential(tnn.Linear(512, 512), tnn.ReLU(),
                                       tnn.Linear(512, feat_dim))
        else:
            self.head = tnn.Linear(512, feat_dim)
        self.linear = tnn.Sequential(tnn.Linear(feat_dim, 32), tnn.ReLU(),
                                     tnn.Linear(32, num_classes))

    def forward(self, x):
        feat = self.head(self.encoder(x))
        return F.softmax(self.linear(feat), dim=1), F.normalize(feat, dim=1)


def _randomize_bn_stats(model, gen):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=gen) * 0.3)
            m.running_var.copy_(torch.rand(m.running_var.shape,
                                           generator=gen) + 0.5)


@pytest.mark.parametrize("head", ["mlp", "linear"])
def test_pth_roundtrip_resnet18(tmp_path, head):
    gen = torch.Generator().manual_seed(0)
    tmodel = TBuildNet(head=head)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        _randomize_bn_stats(tmodel, gen)
    tmodel.eval()

    x = np.random.default_rng(0).normal(size=(4, 32, 32, 3)).astype(
        np.float32)
    with torch.no_grad():
        tpred, tfeat = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)))

    path = os.path.join(tmp_path, "ckpt.pth")
    torch.save({"model": tmodel.state_dict(), "epoch": 7}, path)

    model = BuildNet(name="resnet18", head=head, feat_dim=128,
                     num_classes=10)
    import optax
    state = create_train_state(model, optax.sgd(0.1),
                               jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))
    state, epoch = restore_checkpoint(path, state)
    assert epoch == 7

    pred, feat = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(feat), tfeat.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pred), tpred.numpy(), atol=2e-4)


def test_tolerant_partial_load():
    """Missing/unexpected keys behave like torch strict=False: unknown keys
    are reported, untouched leaves keep their initialized values (the
    reference's SimCLR checkpoints lack the aux classifier)."""
    model = BuildNet(name="resnet18", head="mlp", feat_dim=128,
                     num_classes=10)
    v = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)),
                   train=False)
    tmodel = TBuildNet(head="mlp")
    sd = {("module." + k if i % 2 else k): v_ for i, (k, v_) in
          enumerate(tmodel.state_dict().items())
          if not k.startswith("linear")}          # drop the aux classifier
    sd["totally.bogus.weight"] = torch.zeros(3)
    params, stats, report = convert_torch_state_dict(
        sd, v["params"], v["batch_stats"], verbose=False)
    assert "totally.bogus.weight" in report["unexpected"]
    assert any(m.startswith("linear_0") for m in report["missing"])
    # aux classifier untouched; encoder stem actually replaced
    np.testing.assert_array_equal(np.asarray(params["linear_1"]["kernel"]),
                                  np.asarray(v["params"]["linear_1"]["kernel"]))
    assert not np.allclose(np.asarray(params["ResNet_0"]["Conv_0"]["kernel"]),
                           np.asarray(v["params"]["ResNet_0"]["Conv_0"]["kernel"]))


def test_pth_roundtrip_bottleneck_shapes():
    """Bottleneck mapping: a torch resnet50-layout state_dict lands on the
    flax resnet50 tree with zero unexpected keys (shape-only check — the
    full forward is covered by the resnet18 roundtrip)."""

    class TBottleneck(tnn.Module):
        def __init__(self, in_planes, planes, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(in_planes, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, 4 * planes, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(4 * planes)
            self.shortcut = tnn.Sequential()
            if stride != 1 or in_planes != 4 * planes:
                self.shortcut = tnn.Sequential(
                    tnn.Conv2d(in_planes, 4 * planes, 1, stride, bias=False),
                    tnn.BatchNorm2d(4 * planes))

    class TResNet50Enc(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 3, 1, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            in_p = 64
            for li, (p, n) in enumerate(zip((64, 128, 256, 512),
                                            (3, 4, 6, 3)), start=1):
                blocks = []
                for b in range(n):
                    stride = 2 if (li > 1 and b == 0) else 1
                    blocks.append(TBottleneck(in_p, p, stride))
                    in_p = 4 * p
                setattr(self, f"layer{li}", tnn.Sequential(*blocks))

    class TNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = TResNet50Enc()
            self.head = tnn.Sequential(tnn.Linear(2048, 2048), tnn.ReLU(),
                                       tnn.Linear(2048, 128))
            self.linear = tnn.Sequential(tnn.Linear(128, 32), tnn.ReLU(),
                                         tnn.Linear(32, 10))

    model = BuildNet(name="resnet50", head="mlp", feat_dim=128,
                     num_classes=10)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                   train=False)
    _, _, report = convert_torch_state_dict(TNet().state_dict(),
                                            v["params"], v["batch_stats"],
                                            verbose=False)
    assert report["unexpected"] == []
    assert report["missing"] == []
