"""ResNet-50 backbone parity vs a hand-built torch.nn oracle (same weights,
BN folded on our side, eval mode on torch's)."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from tepose_tpu.models.backbone import (
    BOTTLENECK_LAYERS, convert_torch_resnet50, normalize_crop,
    resnet50_features, resnet50_init)


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU()
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        r = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            r = self.downsample(x)
        return self.relu(out + r)


class TorchResNet50Features(nn.Module):
    def __init__(self):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, BOTTLENECK_LAYERS[0])
        self.layer2 = self._make_layer(128, BOTTLENECK_LAYERS[1], 2)
        self.layer3 = self._make_layer(256, BOTTLENECK_LAYERS[2], 2)
        self.layer4 = self._make_layer(512, BOTTLENECK_LAYERS[3], 2)
        self.avgpool = nn.AdaptiveAvgPool2d(1)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes * 4))
        layers = [TorchBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [TorchBottleneck(self.inplanes, planes)
                   for _ in range(1, blocks)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.avgpool(x).flatten(1)


def test_resnet50_matches_torch(rng):
    torch.manual_seed(0)
    model = TorchResNet50Features()
    # randomise BN stats so folding is actually exercised
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.5, 1.5)
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.uniform_(-0.2, 0.2)
    model.eval()

    params = convert_torch_resnet50(model.state_dict())

    x = rng.randn(2, 3, 64, 64).astype(np.float32)  # small spatial for speed
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()
    ours = np.asarray(resnet50_features(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_resnet50_random_init_shapes(rng):
    params = resnet50_init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32))
    f = resnet50_features(params, x)
    assert f.shape == (1, 2048)
    assert np.all(np.isfinite(np.asarray(f)))


def test_normalize_crop():
    x = jnp.full((1, 3, 4, 4), 255.0)
    out = np.asarray(normalize_crop(x))
    expected = (1.0 - np.array([0.485, 0.456, 0.406])) / \
        np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, :, 0, 0], expected, atol=1e-5)
