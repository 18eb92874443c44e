"""Keyword-spotting model: on-graph log-mel frontend + DS-CNN classifier.

The audio model family (speech-commands style). Unlike typical torch
deployments that compute the spectrogram on the host, the whole frontend
rides the accelerator here: STFT is a frame-gather + DFT-basis matmul
(ops/signal_ops.py) that lands on the MXU, so raw PCM goes in and logits
come out in one jitted program — no host FFT, no extra transfer.

IR is hand-built (GraphBuilder) with weights pulled from the torch
reference, like models/text_lstm.py; the torch forward uses torch.stft +
an identical HTK mel filterbank so parity covers the conv stack *and*
the frontend numerics.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn

from ..ir.build import GraphBuilder
from ..utils import dtypes as dt


def _mel_matrix(num_mel: int, n_fft: int, sr: int, lo: float, hi: float):
    """HTK triangular filterbank, (n_fft//2+1, num_mel) — mirrors the
    MelWeightMatrix lowering (golden-tested against it)."""
    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)

    edges = mel2hz(np.linspace(hz2mel(lo), hz2mel(hi), num_mel + 2))
    bins = np.arange(n_fft // 2 + 1, dtype=np.float64) * sr / n_fft
    lo_e, ce, hi_e = edges[:-2][None], edges[1:-1][None], edges[2:][None]
    f = bins[:, None]
    up = (f - lo_e) / np.maximum(ce - lo_e, 1e-12)
    down = (hi_e - f) / np.maximum(hi_e - ce, 1e-12)
    return np.clip(np.minimum(up, down), 0.0, 1.0).astype(np.float32)


class TorchKWS(nn.Module):
    """DS-CNN keyword spotter over a torch.stft log-mel frontend."""

    def __init__(self, num_classes=12, num_mel=40, n_fft=400, hop=160,
                 sr=16000, channels=64, blocks=4):
        super().__init__()
        self.n_fft, self.hop, self.num_mel = n_fft, hop, num_mel
        self.register_buffer("window", torch.hann_window(n_fft, periodic=True))
        self.register_buffer(
            "mel", torch.from_numpy(_mel_matrix(num_mel, n_fft, sr, 0.0, sr / 2)))
        self.stem = nn.Sequential(
            nn.Conv2d(1, channels, (10, 4), stride=(2, 2), padding=(4, 1),
                      bias=False),
            nn.BatchNorm2d(channels), nn.ReLU())
        ds = []
        for _ in range(blocks):
            ds += [nn.Conv2d(channels, channels, 3, padding=1, groups=channels,
                             bias=False),
                   nn.BatchNorm2d(channels), nn.ReLU(),
                   nn.Conv2d(channels, channels, 1, bias=False),
                   nn.BatchNorm2d(channels), nn.ReLU()]
        self.blocks = nn.Sequential(*ds)
        self.pool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(channels, num_classes)

    def frontend(self, wav):  # (B, T) -> (B, 1, frames, mel)
        spec = torch.stft(wav, n_fft=self.n_fft, hop_length=self.hop,
                          window=self.window, center=False,
                          return_complex=True)
        power = spec.abs() ** 2                       # (B, bins, frames)
        melspec = power.transpose(1, 2) @ self.mel    # (B, frames, mel)
        return torch.log(torch.clamp(melspec, min=1e-10))[:, None]

    def forward(self, wav):
        x = self.blocks(self.stem(self.frontend(wav)))
        return self.fc(self.pool(x).flatten(1))


def create_torch(seed: int = 0, **kw) -> nn.Module:
    torch.manual_seed(seed)
    m = TorchKWS(**kw).eval()
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn(mod.num_features, generator=g) * 0.1)
                mod.running_var.copy_(torch.rand(mod.num_features, generator=g) + 0.5)
    return m


def _conv(b, x, mod, **attrs):
    ins = [x, b.init(mod.weight.detach().numpy())]
    if mod.bias is not None:
        ins.append(b.init(mod.bias.detach().numpy()))
    return b.node("Conv", ins, kernel_shape=list(mod.kernel_size),
                  strides=list(mod.stride), group=mod.groups,
                  pads=list(mod.padding) * 2, dilations=list(mod.dilation),
                  **attrs)


def _bn(b, x, mod):
    return b.node("BatchNormalization", [
        x, b.init(mod.weight.detach().numpy()),
        b.init(mod.bias.detach().numpy()),
        b.init(mod.running_mean.detach().numpy()),
        b.init(mod.running_var.detach().numpy())], epsilon=mod.eps)


def build(batch: int = 1, samples: int = 16000, seed: int = 0,
          num_classes: int = 12, num_mel: int = 40, n_fft: int = 400,
          hop: int = 160, channels: int = 64, blocks: int = 4):
    """Returns (graph taking (B, samples) f32 PCM, torch module, shape)."""
    m = create_torch(seed, num_classes=num_classes, num_mel=num_mel,
                     n_fft=n_fft, hop=hop, channels=channels, blocks=blocks)

    b = GraphBuilder("audio_kws", opset=17)
    wav = b.input("audio", (batch, samples), dt.FLOAT)
    win = b.node("HannWindow", [b.init(np.array(n_fft, np.int64))])
    stft = b.node("STFT", [b.node("Unsqueeze", [wav, b.init(np.array([2], np.int64))]),
                           b.init(np.array(hop, np.int64)), win])
    power = b.node("ReduceSum", [b.node("Mul", [stft, stft]),
                                 b.init(np.array([-1], np.int64))], keepdims=0)
    mel = b.node("MelWeightMatrix", [
        b.init(np.array(num_mel, np.int64)), b.init(np.array(n_fft, np.int64)),
        b.init(np.array(16000, np.int64)), b.init(np.array(0.0, np.float32)),
        b.init(np.array(8000.0, np.float32))])
    melspec = b.node("MatMul", [power, mel])
    logmel = b.node("Log", [b.node("Max", [melspec,
                                           b.init(np.array(1e-10, np.float32))])])
    x = b.node("Unsqueeze", [logmel, b.init(np.array([1], np.int64))])

    x = b.node("Relu", [_bn(b, _conv(b, x, m.stem[0]), m.stem[1])])
    mods = list(m.blocks)
    for i in range(0, len(mods), 3):
        x = b.node("Relu", [_bn(b, _conv(b, x, mods[i]), mods[i + 1])])
    x = b.node("GlobalAveragePool", [x])
    x = b.node("Flatten", [x], axis=1)
    logits = b.node("Gemm", [x, b.init(m.fc.weight.detach().numpy()),
                             b.init(m.fc.bias.detach().numpy())],
                    transB=1, alpha=1.0, beta=1.0)
    g = b.finish([logits])
    return g, m, (batch, samples)
