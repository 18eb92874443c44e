"""RetinaNet-style detection backbone+FPN+heads (no NMS).

Extends the zoo beyond the five BASELINE configs with the detection graph
shape: multi-scale feature pyramid (lateral 1x1 convs + top-down nearest
upsample + add), shared class/box heads over every level, and a
multi-output graph (per-level logits and box deltas — the reference
cannot even represent multi-output graphs, ONNXGraph.swift:178-180).
Post-processing (NMS) is out of engine scope (dynamic shapes; see
docs/ROADMAP.md item 6) — heads return dense per-anchor predictions, as
TF-Serving-style detection deployments do.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class _ConvBlock(nn.Sequential):
    def __init__(self, cin, cout, stride=1):
        super().__init__(
            nn.Conv2d(cin, cout, 3, stride, 1, bias=False),
            nn.BatchNorm2d(cout),
            nn.ReLU(inplace=False),
        )


class Backbone(nn.Module):
    """Tiny ResNet-ish backbone emitting C3, C4, C5."""

    def __init__(self, width=32):
        super().__init__()
        self.stem = _ConvBlock(3, width, stride=2)
        self.c3 = nn.Sequential(_ConvBlock(width, width * 2, 2),
                                _ConvBlock(width * 2, width * 2))
        self.c4 = nn.Sequential(_ConvBlock(width * 2, width * 4, 2),
                                _ConvBlock(width * 4, width * 4))
        self.c5 = nn.Sequential(_ConvBlock(width * 4, width * 8, 2),
                                _ConvBlock(width * 8, width * 8))

    def forward(self, x):
        x = self.stem(x)
        c3 = self.c3(x)
        c4 = self.c4(c3)
        c5 = self.c5(c4)
        return c3, c4, c5


class FPN(nn.Module):
    def __init__(self, cins, cout=64):
        super().__init__()
        self.lat3 = nn.Conv2d(cins[0], cout, 1)
        self.lat4 = nn.Conv2d(cins[1], cout, 1)
        self.lat5 = nn.Conv2d(cins[2], cout, 1)
        self.out3 = nn.Conv2d(cout, cout, 3, padding=1)
        self.out4 = nn.Conv2d(cout, cout, 3, padding=1)
        self.out5 = nn.Conv2d(cout, cout, 3, padding=1)

    def forward(self, c3, c4, c5):
        p5 = self.lat5(c5)
        p4 = self.lat4(c4) + F.interpolate(p5, scale_factor=2, mode="nearest")
        p3 = self.lat3(c3) + F.interpolate(p4, scale_factor=2, mode="nearest")
        return self.out3(p3), self.out4(p4), self.out5(p5)


class Heads(nn.Module):
    def __init__(self, c, num_classes, num_anchors=9):
        super().__init__()
        self.cls = nn.Sequential(_ConvBlock(c, c),
                                 nn.Conv2d(c, num_anchors * num_classes, 3, padding=1))
        self.box = nn.Sequential(_ConvBlock(c, c),
                                 nn.Conv2d(c, num_anchors * 4, 3, padding=1))

    def forward(self, p):
        return self.cls(p), self.box(p)


class RetinaFPN(nn.Module):
    def __init__(self, num_classes=20, width=32, fpn_c=64):
        super().__init__()
        self.backbone = Backbone(width)
        self.fpn = FPN((width * 2, width * 4, width * 8), fpn_c)
        self.heads = Heads(fpn_c, num_classes)

    def forward(self, x):
        c3, c4, c5 = self.backbone(x)
        p3, p4, p5 = self.fpn(c3, c4, c5)
        cls3, box3 = self.heads(p3)
        cls4, box4 = self.heads(p4)
        cls5, box5 = self.heads(p5)
        return cls3, box3, cls4, box4, cls5, box5


def create_torch(seed: int = 0, num_classes: int = 20, width: int = 32) -> nn.Module:
    torch.manual_seed(seed)
    m = RetinaFPN(num_classes=num_classes, width=width).eval()
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn(mod.num_features, generator=g) * 0.1)
                mod.running_var.copy_(torch.rand(mod.num_features, generator=g) + 0.5)
    return m


def build(batch: int = 1, image_size: int = 256, seed: int = 0,
          num_classes: int = 20, width: int = 32):
    from ..frontend.torch_export import export_torch

    m = create_torch(seed, num_classes, width)
    example = torch.randn(batch, 3, image_size, image_size)
    g = export_torch(m, example, name="retina_fpn", opset=17)
    return g, m, (batch, 3, image_size, image_size)
