"""LSTM text classifier: Embedding -> (bi)LSTM -> last hidden -> Linear.

The classic NLP serving workload, expressed through the ONNX LSTM op
(lowered onto lax.scan, ops/control_flow.py). Weights come from a torch
reference module with the gate order remapped (torch i,f,g,o -> ONNX
i,o,f,c), so parity tests compare against real torch LSTM numerics.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn

from ..ir.build import GraphBuilder
from ..utils import dtypes as dt


class TorchTextLSTM(nn.Module):
    def __init__(self, vocab=1000, dim=64, hidden=128, num_classes=5,
                 bidirectional=False):
        super().__init__()
        self.emb = nn.Embedding(vocab, dim)
        self.lstm = nn.LSTM(dim, hidden, bidirectional=bidirectional)
        self.fc = nn.Linear(hidden * (2 if bidirectional else 1), num_classes)

    def forward(self, tokens):  # (T, B) int64
        x = self.emb(tokens)                      # (T, B, D)
        out, (h_n, _) = self.lstm(x)              # h_n: (Dirs, B, H)
        feat = torch.cat([h_n[i] for i in range(h_n.shape[0])], dim=-1)
        return self.fc(feat)


def _onnx_lstm_weights(lstm: nn.LSTM):
    """torch LSTM -> ONNX W (D, 4H, I), R (D, 4H, H), B (D, 8H)."""
    def reorder(a):
        i, f, g, o = np.split(a, 4, axis=0)
        return np.concatenate([i, o, f, g], axis=0)

    ws, rs, bs = [], [], []
    dirs = ["" if d == 0 else "_reverse" for d in range(2 if lstm.bidirectional else 1)]
    for sfx in dirs:
        w_ih = reorder(getattr(lstm, f"weight_ih_l0{sfx}").detach().numpy())
        w_hh = reorder(getattr(lstm, f"weight_hh_l0{sfx}").detach().numpy())
        b_ih = reorder(getattr(lstm, f"bias_ih_l0{sfx}").detach().numpy())
        b_hh = reorder(getattr(lstm, f"bias_hh_l0{sfx}").detach().numpy())
        ws.append(w_ih)
        rs.append(w_hh)
        bs.append(np.concatenate([b_ih, b_hh]))
    return (np.stack(ws).astype(np.float32), np.stack(rs).astype(np.float32),
            np.stack(bs).astype(np.float32))


def create_torch(seed: int = 0, vocab=1000, dim=64, hidden=128, num_classes=5,
                 bidirectional=False) -> nn.Module:
    torch.manual_seed(seed)
    return TorchTextLSTM(vocab, dim, hidden, num_classes, bidirectional).eval()


def build(seq_len: int = 32, batch: int = 4, seed: int = 0, vocab=1000,
          dim=64, hidden=128, num_classes=5, bidirectional=False):
    """Returns (IR graph taking (T, B) int64 tokens, torch module, shape)."""
    m = create_torch(seed, vocab, dim, hidden, num_classes, bidirectional)
    W, R, Bb = _onnx_lstm_weights(m.lstm)
    dirs = 2 if bidirectional else 1

    b = GraphBuilder("text_lstm", opset=17)
    tokens = b.input("tokens", (seq_len, batch), dt.INT64)
    x = b.node("Gather", [b.init(m.emb.weight.detach().numpy()), tokens], axis=0)
    outs = b.node("LSTM", [x, b.init(W), b.init(R), b.init(Bb)], outputs=3,
                  hidden_size=hidden,
                  direction="bidirectional" if bidirectional else "forward")
    h_n = outs[1]  # (Dirs, B, H)
    feat = b.node("Reshape", [b.node("Transpose", [h_n], perm=[1, 0, 2]),
                              b.init(np.array([batch, dirs * hidden], np.int64))])
    logits = b.node("Gemm", [feat, b.init(m.fc.weight.detach().numpy()),
                             b.init(m.fc.bias.detach().numpy())],
                    transB=1, alpha=1.0, beta=1.0)
    g = b.finish([logits])
    return g, m, (seq_len, batch)
