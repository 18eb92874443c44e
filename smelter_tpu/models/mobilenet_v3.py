"""MobileNetV3-Small-style model: SE blocks (ReduceMean squeeze +
HardSigmoid gate) and HardSwish — exercises the layout pass's reduction
remap and the hard-activation lowerings. Another production CNN family
beyond the five BASELINE configs."""

from __future__ import annotations

import torch
import torch.nn as nn


class SqueezeExcite(nn.Module):
    def __init__(self, c, r=4):
        super().__init__()
        self.fc1 = nn.Conv2d(c, max(c // r, 8), 1)
        self.fc2 = nn.Conv2d(max(c // r, 8), c, 1)
        self.act = nn.ReLU(inplace=False)
        self.gate = nn.Hardsigmoid()

    def forward(self, x):
        s = torch.mean(x, dim=(2, 3), keepdim=True)
        s = self.gate(self.fc2(self.act(self.fc1(s))))
        return x * s


class InvertedResidualV3(nn.Module):
    def __init__(self, cin, cout, hidden, kernel, stride, use_se, use_hs):
        super().__init__()
        act = nn.Hardswish if use_hs else nn.ReLU
        self.use_res = stride == 1 and cin == cout
        layers = []
        if hidden != cin:
            layers += [nn.Conv2d(cin, hidden, 1, bias=False),
                       nn.BatchNorm2d(hidden), act()]
        layers += [nn.Conv2d(hidden, hidden, kernel, stride, kernel // 2,
                             groups=hidden, bias=False),
                   nn.BatchNorm2d(hidden), act()]
        if use_se:
            layers.append(SqueezeExcite(hidden))
        layers += [nn.Conv2d(hidden, cout, 1, bias=False), nn.BatchNorm2d(cout)]
        self.block = nn.Sequential(*layers)

    def forward(self, x):
        out = self.block(x)
        return x + out if self.use_res else out


class MobileNetV3Small(nn.Module):
    # (kernel, hidden, out, SE, HS, stride)
    CFG = [
        (3, 16, 16, True, False, 2),
        (3, 72, 24, False, False, 2),
        (3, 88, 24, False, False, 1),
        (5, 96, 40, True, True, 2),
        (5, 240, 40, True, True, 1),
        (5, 120, 48, True, True, 1),
        (5, 288, 96, True, True, 2),
    ]

    def __init__(self, num_classes=1000, width=1.0):
        super().__init__()

        def c(v):
            return max(8, int(v * width) // 8 * 8)

        self.stem = nn.Sequential(nn.Conv2d(3, c(16), 3, 2, 1, bias=False),
                                  nn.BatchNorm2d(c(16)), nn.Hardswish())
        blocks = []
        cin = c(16)
        for k, h, o, se, hs, s in self.CFG:
            blocks.append(InvertedResidualV3(cin, c(o), c(h), k, s, se, hs))
            cin = c(o)
        self.blocks = nn.Sequential(*blocks)
        self.head_conv = nn.Sequential(nn.Conv2d(cin, c(576), 1, bias=False),
                                       nn.BatchNorm2d(c(576)), nn.Hardswish())
        self.pool = nn.AdaptiveAvgPool2d(1)
        self.flatten = nn.Flatten(1)
        self.classifier = nn.Linear(c(576), num_classes)

    def forward(self, x):
        x = self.head_conv(self.blocks(self.stem(x)))
        return self.classifier(self.flatten(self.pool(x)))


def create_torch(seed: int = 0, num_classes: int = 1000, width: float = 1.0):
    torch.manual_seed(seed)
    m = MobileNetV3Small(num_classes=num_classes, width=width).eval()
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn(mod.num_features, generator=g) * 0.1)
                mod.running_var.copy_(torch.rand(mod.num_features, generator=g) + 0.5)
    return m


def build(batch: int = 1, image_size: int = 224, seed: int = 0,
          num_classes: int = 1000, width: float = 1.0):
    from ..frontend.torch_export import export_torch

    m = create_torch(seed, num_classes, width)
    example = torch.randn(batch, 3, image_size, image_size)
    g = export_torch(m, example, name="mobilenet_v3", opset=18)
    return g, m, (batch, 3, image_size, image_size)
