"""Whisper-style speech encoder: conv1d subsampling over log-mel frames +
pre-LN transformer blocks (the speech-transformer serving family).

Exported through the fx frontend (frontend/torch_export.py) — exercises
rank-3 Conv, GELU, LayerNorm, and nn.MultiheadAttention in one model.
Pair with models/audio_kws.py's on-graph log-mel frontend (or
examples/audio_logmel.py) for raw-PCM-to-embeddings serving.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn


class Block(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.ln1 = nn.LayerNorm(dim)
        self.attn = nn.MultiheadAttention(dim, heads, batch_first=True)
        self.ln2 = nn.LayerNorm(dim)
        self.mlp = nn.Sequential(nn.Linear(dim, dim * 4), nn.GELU(),
                                 nn.Linear(dim * 4, dim))

    def forward(self, x):
        h = self.ln1(x)
        x = x + self.attn(h, h, h, need_weights=False)[0]
        return x + self.mlp(self.ln2(x))


class SpeechEncoder(nn.Module):
    """(B, frames, n_mel) log-mel -> (B, frames//2, dim) embeddings."""

    def __init__(self, n_mel=80, dim=128, heads=4, depth=4, frames=100):
        super().__init__()
        self.conv1 = nn.Conv1d(n_mel, dim, 3, padding=1)
        self.conv2 = nn.Conv1d(dim, dim, 3, stride=2, padding=1)
        # pos sized exactly to the post-subsample length: fx symbolic trace
        # cannot slice with a runtime length, and shapes are static anyway.
        n_pos = (frames + 1) // 2
        pos = torch.zeros(n_pos, dim)
        t = torch.arange(n_pos)[:, None].float()
        div = torch.exp(torch.arange(0, dim, 2).float()
                        * (-math.log(10000.0) / dim))
        pos[:, 0::2] = torch.sin(t * div)
        pos[:, 1::2] = torch.cos(t * div)
        self.register_buffer("pos", pos)
        self.blocks = nn.Sequential(*[Block(dim, heads) for _ in range(depth)])
        self.ln_post = nn.LayerNorm(dim)

    def forward(self, mel):                    # (B, T, n_mel)
        x = mel.permute(0, 2, 1)               # (B, n_mel, T)
        x = nn.functional.gelu(self.conv1(x))
        x = nn.functional.gelu(self.conv2(x))  # (B, dim, T//2)
        x = x.permute(0, 2, 1)
        x = x + self.pos
        return self.ln_post(self.blocks(x))


def create_torch(seed: int = 0, **kw) -> nn.Module:
    torch.manual_seed(seed)
    return SpeechEncoder(**kw).eval()


def build(batch: int = 1, frames: int = 100, seed: int = 0, n_mel: int = 80,
          dim: int = 128, heads: int = 4, depth: int = 4):
    from ..frontend.torch_export import export_torch

    m = create_torch(seed, n_mel=n_mel, dim=dim, heads=heads, depth=depth,
                     frames=frames)
    example = torch.randn(batch, frames, n_mel)
    g = export_torch(m, example, name="speech_encoder", opset=17)
    return g, m, (batch, frames, n_mel)
