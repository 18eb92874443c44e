"""U-Net style segmentation net (BASELINE.json configs[2]: exercises the
concat/upsample hot kernels under INT8 weights). Classic encoder/decoder
with skip connections — Concat across channel axis and bilinear Upsample
are exactly the ops the reference calls out as fragile on Metal
(reference: README.md:60-66 concat channel-multiple-of-4 limitation;
Converters.swift:554-574 concat, :478-552 upsample)."""

from __future__ import annotations

import torch
import torch.nn as nn


class DoubleConv(nn.Sequential):
    def __init__(self, inp, out):
        super().__init__(
            nn.Conv2d(inp, out, 3, padding=1, bias=False),
            nn.BatchNorm2d(out),
            nn.ReLU(inplace=False),
            nn.Conv2d(out, out, 3, padding=1, bias=False),
            nn.BatchNorm2d(out),
            nn.ReLU(inplace=False),
        )


class Down(nn.Sequential):
    def __init__(self, inp, out):
        super().__init__(nn.MaxPool2d(2), DoubleConv(inp, out))


class Up(nn.Module):
    def __init__(self, inp, out):
        super().__init__()
        self.up = nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True)
        self.conv = DoubleConv(inp, out)

    def forward(self, x, skip):
        x = self.up(x)
        x = torch.cat([skip, x], dim=1)
        return self.conv(x)


class UNet(nn.Module):
    def __init__(self, in_ch=3, num_classes=2, base=64):
        super().__init__()
        self.inc = DoubleConv(in_ch, base)
        self.d1 = Down(base, base * 2)
        self.d2 = Down(base * 2, base * 4)
        self.d3 = Down(base * 4, base * 8)
        self.d4 = Down(base * 8, base * 8)
        self.u1 = Up(base * 16, base * 4)
        self.u2 = Up(base * 8, base * 2)
        self.u3 = Up(base * 4, base)
        self.u4 = Up(base * 2, base)
        self.outc = nn.Conv2d(base, num_classes, 1)

    def forward(self, x):
        x1 = self.inc(x)
        x2 = self.d1(x1)
        x3 = self.d2(x2)
        x4 = self.d3(x3)
        x5 = self.d4(x4)
        x = self.u1(x5, x4)
        x = self.u2(x, x3)
        x = self.u3(x, x2)
        x = self.u4(x, x1)
        return self.outc(x)


def create_torch(seed: int = 0, num_classes: int = 2, base: int = 64) -> nn.Module:
    torch.manual_seed(seed)
    m = UNet(num_classes=num_classes, base=base).eval()
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn(mod.num_features, generator=g) * 0.1)
                mod.running_var.copy_(torch.rand(mod.num_features, generator=g) + 0.5)
    return m


def build(batch: int = 1, image_size: int = 256, seed: int = 0,
          num_classes: int = 2, base: int = 64):
    from ..frontend.torch_export import export_torch

    m = create_torch(seed, num_classes, base)
    example = torch.randn(batch, 3, image_size, image_size)
    g = export_torch(m, example, name="unet", opset=17)
    return g, m, (batch, 3, image_size, image_size)
