#!/usr/bin/env python
"""Golden fixture for the AdaMPI predictor: run the reference MPIPredictor
(model/AdaMPI.py) on CPU with randomized weights and dump state_dict +
inputs/outputs. The reference imports torchvision (absent here), so a
minimal standard-ResNet stub is installed first -- that is textbook ResNet
plumbing, not reference code.

Usage: python tests/golden/gen_adampi_golden.py
"""
import os
import sys
import types
import pathlib

import numpy as np
import torch
import torch.nn as nn

REFERENCE = os.environ.get("MPIFLOW_REFERENCE", "/root/reference")
OUT = pathlib.Path(__file__).resolve().parent / "data"
OUT.mkdir(parents=True, exist_ok=True)

# ------------------------------------------------ torchvision stub
def conv3x3(inp, out, stride=1):
    return nn.Conv2d(inp, out, 3, stride=stride, padding=1, bias=False)


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 groups=1, base_width=64, dilation=1, norm_layer=None):
        super().__init__()
        self.conv1 = conv3x3(inplanes, planes, stride)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = conv3x3(planes, planes)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class Bottleneck(nn.Module):
    expansion = 4


class ResNet(nn.Module):
    def __init__(self, block, layers, num_classes=1000, **kw):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, num_classes)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1,
                          stride=stride, bias=False),
                nn.BatchNorm2d(planes * block.expansion))
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes))
        return nn.Sequential(*layers)


tv = types.ModuleType("torchvision")
tv_models = types.ModuleType("torchvision.models")
tv_resnet = types.ModuleType("torchvision.models.resnet")
tv_resnet.BasicBlock = BasicBlock
tv_resnet.Bottleneck = Bottleneck
tv_models.ResNet = ResNet
tv_models.resnet = tv_resnet
for n in ("resnet18", "resnet34", "resnet50", "resnet101", "resnet152"):
    setattr(tv_models, n, lambda *a, **k: None)
tv.models = tv_models
tv_transforms = types.ModuleType("torchvision.transforms")
tv_transforms.ToTensor = object
tv_utils = types.ModuleType("torchvision.utils")
tv_utils.save_image = lambda *a, **k: None
tv.transforms = tv_transforms
tv.utils = tv_utils
for name, mod in (("torchvision", tv), ("torchvision.models", tv_models),
                  ("torchvision.models.resnet", tv_resnet),
                  ("torchvision.transforms", tv_transforms),
                  ("torchvision.utils", tv_utils)):
    sys.modules[name] = mod

sys.path.insert(0, REFERENCE)

from model.AdaMPI import MPIPredictor  # noqa: E402


def randomize_state(model, seed):
    rng = np.random.RandomState(seed)
    sd = model.state_dict()
    new = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            new[k] = v
        elif k.endswith("running_var"):
            new[k] = torch.from_numpy(
                (0.5 + rng.rand(*v.shape)).astype(np.float32))
        elif v.ndim == 0:
            new[k] = v
        else:
            new[k] = torch.from_numpy(
                (rng.randn(*v.shape) * 0.2).astype(np.float32))
    model.load_state_dict(new)


def main():
    # the decoder's receptive-field extension requires H, W divisible by 128
    # (two stride-2 pools below the /32 scale must invert exactly)
    S, H, W = 8, 128, 128
    model = MPIPredictor(width=W, height=H, num_planes=S)
    randomize_state(model, 99)
    model.eval()

    rng = np.random.RandomState(5)
    img = torch.from_numpy(rng.rand(1, 3, H, W).astype(np.float32))
    disp = torch.from_numpy(rng.rand(1, 1, H, W).astype(np.float32))
    with torch.no_grad():
        mpi, render_disp = model(img, disp)
        # intermediates for finer-grained parity
        fm = model.fmn(img, disp, render_disp)
        feats = model.encoder(img, disp)
        # DPN path (bypassed in the reference forward but part of the surface)
        low = model.low_res_size
        rgb_low = torch.nn.functional.interpolate(
            img, size=low, mode="bilinear", align_corners=True)
        disp_low = torch.nn.functional.interpolate(
            disp, size=low, mode="bilinear", align_corners=True)
        dpn_disp = model.dpn(render_disp, rgb_low, disp_low)

    # Storing the full randomized state dict would be ~78MB; instead store
    # the ordered (key, shape) manifest -- the test regenerates the exact
    # values from the same seeded RNG (see randomize_state).
    sd_keys, sd_shapes = [], []
    for k, v in model.state_dict().items():
        sd_keys.append(k)
        sd_shapes.append(",".join(map(str, v.shape)))
    np.savez(OUT / "adampi.npz",
             img=img.numpy(), disp=disp.numpy(),
             mpi=mpi.numpy(), render_disp=render_disp.numpy(),
             feature_mask=fm.numpy(), dpn_disp=dpn_disp.numpy(),
             sd_keys=np.array(sd_keys), sd_shapes=np.array(sd_shapes),
             sd_seed=np.int64(99),
             **{f"feat{i}": f.numpy() for i, f in enumerate(feats)})
    print("adampi golden written:", (OUT / 'adampi.npz').stat().st_size // 1024,
          "KB")


if __name__ == "__main__":
    main()
