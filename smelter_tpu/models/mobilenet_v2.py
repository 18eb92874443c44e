"""MobileNetV2 — the minimum end-to-end config (BASELINE.json configs[0]).

Hand-written torch definition (torchvision is not in this environment)
matching the standard architecture: inverted residuals with expansion,
depthwise 3x3, linear bottlenecks, ReLU6. Exercises exactly the op slice
SURVEY.md §7.2 names: Conv(+depthwise), BN, Clip(ReLU6), Add,
GlobalAveragePool, Gemm, Softmax.
"""

from __future__ import annotations

import torch
import torch.nn as nn


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class ConvBNReLU(nn.Sequential):
    def __init__(self, inp, oup, kernel=3, stride=1, groups=1):
        pad = (kernel - 1) // 2
        super().__init__(
            nn.Conv2d(inp, oup, kernel, stride, pad, groups=groups, bias=False),
            nn.BatchNorm2d(oup),
            nn.ReLU6(inplace=False),
        )


class InvertedResidual(nn.Module):
    def __init__(self, inp, oup, stride, expand_ratio):
        super().__init__()
        hidden = int(round(inp * expand_ratio))
        self.use_res = stride == 1 and inp == oup
        layers = []
        if expand_ratio != 1:
            layers.append(ConvBNReLU(inp, hidden, kernel=1))
        layers.extend([
            ConvBNReLU(hidden, hidden, stride=stride, groups=hidden),
            nn.Conv2d(hidden, oup, 1, 1, 0, bias=False),
            nn.BatchNorm2d(oup),
        ])
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        if self.use_res:
            return x + self.conv(x)
        return self.conv(x)


class MobileNetV2(nn.Module):
    # (expansion t, channels c, repeats n, stride s)
    CFG = [
        (1, 16, 1, 1),
        (6, 24, 2, 2),
        (6, 32, 3, 2),
        (6, 64, 4, 2),
        (6, 96, 3, 1),
        (6, 160, 3, 2),
        (6, 320, 1, 1),
    ]

    def __init__(self, num_classes: int = 1000, width_mult: float = 1.0):
        super().__init__()
        input_channel = _make_divisible(32 * width_mult)
        last_channel = _make_divisible(1280 * max(1.0, width_mult))
        features = [ConvBNReLU(3, input_channel, stride=2)]
        for t, c, n, s in self.CFG:
            out_c = _make_divisible(c * width_mult)
            for i in range(n):
                features.append(InvertedResidual(
                    input_channel, out_c, s if i == 0 else 1, t))
                input_channel = out_c
        features.append(ConvBNReLU(input_channel, last_channel, kernel=1))
        self.features = nn.Sequential(*features)
        self.pool = nn.AdaptiveAvgPool2d(1)
        self.flatten = nn.Flatten(1)
        self.classifier = nn.Linear(last_channel, num_classes)

    def forward(self, x):
        x = self.features(x)
        x = self.pool(x)
        x = self.flatten(x)
        return self.classifier(x)


def create_torch(seed: int = 0, num_classes: int = 1000, width_mult: float = 1.0) -> nn.Module:
    torch.manual_seed(seed)
    m = MobileNetV2(num_classes=num_classes, width_mult=width_mult).eval()
    # Randomize BN stats so fusion tests are non-trivial.
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn(mod.num_features, generator=g) * 0.1)
                mod.running_var.copy_(torch.rand(mod.num_features, generator=g) + 0.5)
    return m


def build(batch: int = 1, image_size: int = 224, seed: int = 0,
          num_classes: int = 1000, width_mult: float = 1.0):
    """Returns (IR graph, torch reference module, example input shape)."""
    from ..frontend.torch_export import export_torch

    m = create_torch(seed, num_classes, width_mult)
    example = torch.randn(batch, 3, image_size, image_size)
    g = export_torch(m, example, name="mobilenet_v2", opset=17)
    return g, m, (batch, 3, image_size, image_size)
