"""torch exporter coverage for recurrent modules: nn.LSTM/GRU/RNN across
batch_first / bidirectional / multi-layer / relu variants, plus (h_n, c_n)
tuple unpacking through fx getitem."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import smelter_tpu as st
from smelter_tpu.frontend.torch_export import export_torch


class SeqClassifier(nn.Module):
    def __init__(self, rnn):
        super().__init__()
        self.rnn = rnn
        d = rnn.hidden_size * (2 if rnn.bidirectional else 1)
        self.fc = nn.Linear(d, 5)

    def forward(self, x):
        out, _ = self.rnn(x)
        last = out[:, -1] if self.rnn.batch_first else out[-1]
        return self.fc(last)


class StateModel(nn.Module):
    def __init__(self, rnn):
        super().__init__()
        self.rnn = rnn

    def forward(self, x):
        out, (h, c) = self.rnn(x)
        return h, c


CASES = [
    ("lstm", lambda: nn.LSTM(8, 16), False),
    ("lstm_batch_first", lambda: nn.LSTM(8, 16, batch_first=True), True),
    ("lstm_bidi", lambda: nn.LSTM(8, 16, bidirectional=True), False),
    ("lstm_2layer", lambda: nn.LSTM(8, 16, num_layers=2), False),
    ("gru", lambda: nn.GRU(8, 16), False),
    ("gru_bidi_bf", lambda: nn.GRU(8, 16, bidirectional=True,
                                   batch_first=True), True),
    ("rnn_tanh", lambda: nn.RNN(8, 16), False),
    ("rnn_relu", lambda: nn.RNN(8, 16, nonlinearity="relu"), False),
]


class TestRecurrentExport:
    @pytest.mark.parametrize("name,mk,bf", CASES, ids=[c[0] for c in CASES])
    def test_parity(self, name, mk, bf):
        torch.manual_seed(0)
        m = SeqClassifier(mk().eval()).eval()
        x = torch.randn(*((3, 7, 8) if bf else (7, 3, 8)))
        g = st.import_model(st.export_model(export_torch(m, x, name=name,
                                                         opset=17)))
        got = st.CompiledModel(g)(x.numpy())[0]
        with torch.no_grad():
            want = m(x).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_state_tuple_unpacking(self):
        torch.manual_seed(1)
        m = StateModel(nn.LSTM(8, 16, num_layers=2).eval()).eval()
        x = torch.randn(7, 3, 8)
        g = export_torch(m, x, name="hn", opset=17)
        got = st.CompiledModel(g)(x.numpy())
        with torch.no_grad():
            h, c = m(x)
        np.testing.assert_allclose(got[0], h.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(got[1], c.numpy(), rtol=1e-4, atol=1e-5)

    def test_explicit_initial_state_rejected(self):
        from smelter_tpu.ir.errors import NotSupportedError

        class WithState(nn.Module):
            def __init__(self):
                super().__init__()
                self.rnn = nn.GRU(4, 8)

            def forward(self, x, h0):
                out, _ = self.rnn(x, h0)
                return out

        m = WithState().eval()
        with pytest.raises(NotSupportedError, match="initial"):
            export_torch(m, (torch.randn(5, 2, 4), torch.zeros(1, 2, 8)),
                         name="t", opset=17)
