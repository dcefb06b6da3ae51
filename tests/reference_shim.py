"""Test-only shim that makes the READ-ONLY reference implementation at
/root/reference importable on this CPU-only machine, to serve as a numerical
oracle for parity tests.

The environment lacks torchvision/timm/lietorch/lpips and CUDA; we stub the
former (a standard torch ResNet-34 stands in for torchvision.models.resnet34
— same architecture and state_dict key names) and patch ``.cuda()`` to be a
no-op.  Nothing here is shipped in the framework; it exists so tests can
compare our activations against the reference's actual code."""

from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn

REFERENCE_ROOT = "/root/reference"


class _BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _ResNet(nn.Module):
    def __init__(self, layers=(3, 4, 6, 3)):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(64, layers[0], 1)
        self.layer2 = self._make_layer(128, layers[1], 2)
        self.layer3 = self._make_layer(256, layers[2], 2)
        self.layer4 = self._make_layer(512, layers[3], 2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512, 1000)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes),
            )
        mods = [_BasicBlock(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes
        for _ in range(1, blocks):
            mods.append(_BasicBlock(planes, planes))
        return nn.Sequential(*mods)


def install():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvm.resnet34 = lambda pretrained=False, **kw: _ResNet()
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        tm = types.ModuleType("timm.models")
        tml = types.ModuleType("timm.models.layers")

        def trunc_normal_(tensor, std=1.0, **kw):
            with torch.no_grad():
                tensor.normal_(0, std).clamp_(-2 * std, 2 * std)
            return tensor

        tml.trunc_normal_ = trunc_normal_
        timm.models = tm
        tm.layers = tml
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = tm
        sys.modules["timm.models.layers"] = tml

    # CPU-only: .cuda() becomes identity
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self


def load_reference_model(n_view=2, npoints=64, seed=0):
    install()
    torch.manual_seed(seed)
    from models import CoPoNeRF as ref_mod

    model = ref_mod.CoPoNeRF(n_view=n_view, npoints=npoints)
    model.eval()
    return model
