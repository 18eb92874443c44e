"""Control-flow + RNN op tests vs torch / manual references."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import smelter_tpu as st
from smelter_tpu.ir.build import GraphBuilder
from smelter_tpu.ir.graph import Graph, Node, TensorType, ValueInfo
from smelter_tpu.utils import dtypes as dt


class TestIf:
    def _if_graph(self, cond_static):
        b = GraphBuilder("ifg", opset=13)
        x = b.input("x", (2, 3))
        then_g = Graph(name="then", opset=13)
        then_g.nodes = [Node("Relu", ["x"], ["t_out"])]
        then_g.outputs = [ValueInfo("t_out")]
        else_g = Graph(name="else", opset=13)
        else_g.nodes = [Node("Neg", ["x"], ["e_out"])]
        else_g.outputs = [ValueInfo("e_out")]
        cond = b.init(np.asarray(cond_static))
        y = b.node("If", [cond], then_branch=then_g, else_branch=else_g)
        return b.finish([y])

    def test_static_true(self, rng):
        g = self._if_graph(np.bool_(True))
        x = rng.standard_normal((2, 3)).astype(np.float32)
        np.testing.assert_allclose(st.CompiledModel(g)(x)[0], np.maximum(x, 0))

    def test_static_false(self, rng):
        g = self._if_graph(np.bool_(False))
        x = rng.standard_normal((2, 3)).astype(np.float32)
        np.testing.assert_allclose(st.CompiledModel(g)(x)[0], -x)

    def test_subgraph_roundtrip(self, rng):
        """If branches survive protobuf serialization."""
        g = self._if_graph(np.bool_(True))
        g2 = st.import_model(st.export_model(g))
        x = rng.standard_normal((2, 3)).astype(np.float32)
        np.testing.assert_allclose(st.CompiledModel(g2)(x)[0], np.maximum(x, 0))


class TestLoop:
    def test_static_accumulator(self, rng):
        b = GraphBuilder("loopg", opset=13)
        x = b.input("x", (2, 2))
        body = Graph(name="body", opset=13)
        body.inputs = [ValueInfo("it"), ValueInfo("cond_in"), ValueInfo("acc")]
        body.nodes = [
            Node("Identity", ["cond_in"], ["cond_out"]),
            Node("Add", ["acc", "x"], ["acc_out"]),  # closure over outer x
        ]
        body.outputs = [ValueInfo("cond_out"), ValueInfo("acc_out")]
        m = b.init(np.int64(4))
        cond = b.init(np.bool_(True))
        y = b.node("Loop", [m, cond, x], body=body)
        g = b.finish([y])
        xin = rng.standard_normal((2, 2)).astype(np.float32)
        got = st.CompiledModel(g)(xin)[0]
        np.testing.assert_allclose(got, xin * 5, rtol=1e-5)


def _onnx_rnn_weights(mod, kind):
    """torch RNN module -> ONNX W, R, B (1, gates*H, ...) with gate reorder."""
    w_ih = mod.weight_ih_l0.detach().numpy()
    w_hh = mod.weight_hh_l0.detach().numpy()
    b_ih = mod.bias_ih_l0.detach().numpy()
    b_hh = mod.bias_hh_l0.detach().numpy()
    H = mod.hidden_size
    if kind == "lstm":
        # torch gate order i,f,g,o -> ONNX i,o,f,c
        def reorder(a):
            i, f, gq, o = np.split(a, 4, axis=0)
            return np.concatenate([i, o, f, gq], axis=0)
        w_ih, w_hh = reorder(w_ih), reorder(w_hh)
        b_ih, b_hh = reorder(b_ih), reorder(b_hh)
    elif kind == "gru":
        # torch r,z,n -> ONNX z,r,h
        def reorder(a):
            r, z, n = np.split(a, 3, axis=0)
            return np.concatenate([z, r, n], axis=0)
        w_ih, w_hh = reorder(w_ih), reorder(w_hh)
        b_ih, b_hh = reorder(b_ih), reorder(b_hh)
    return (w_ih[None], w_hh[None], np.concatenate([b_ih, b_hh])[None])


class TestRNN:
    @pytest.mark.parametrize("kind,op", [("lstm", "LSTM"), ("gru", "GRU"),
                                         ("rnn", "RNN")])
    def test_vs_torch(self, rng, kind, op):
        T, B, I, H = 5, 2, 8, 16
        torch.manual_seed(0)
        mod = {"lstm": nn.LSTM, "gru": nn.GRU, "rnn": nn.RNN}[kind](I, H).eval()
        if kind == "gru":
            mod = nn.GRU(I, H)  # default linear_before_reset=0 matches torch? no
        x = rng.standard_normal((T, B, I)).astype(np.float32)
        W, R, Bb = _onnx_rnn_weights(mod, kind)

        b = GraphBuilder("rnn", opset=13)
        xi = b.input("x", (T, B, I))
        attrs = dict(hidden_size=H)
        if kind == "gru":
            attrs["linear_before_reset"] = 1  # torch GRU semantics
        outs = b.node(op, [xi, b.init(W.astype(np.float32)),
                           b.init(R.astype(np.float32)),
                           b.init(Bb.astype(np.float32))],
                      outputs=2, **attrs)
        g = b.finish([outs[0]])
        got = st.CompiledModel(g)(x)[0]  # (T, 1, B, H)
        with torch.no_grad():
            want, _ = mod(torch.from_numpy(x))
        np.testing.assert_allclose(got[:, 0], want.numpy(), rtol=1e-4, atol=1e-4)


class TestMHAFrontend:
    def test_multihead_attention_export_and_fusion(self, rng):
        import smelter_tpu as st
        from smelter_tpu.frontend.torch_export import export_torch
        from smelter_tpu.passes.pass_manager import run_passes

        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.mha = nn.MultiheadAttention(32, 4, batch_first=True)

            def forward(self, x):
                a, _ = self.mha(x, x, x, need_weights=False)
                return x + a

        torch.manual_seed(0)
        m = M().eval()
        x = torch.randn(2, 8, 32)
        g = export_torch(m, x, "mha")
        got = st.CompiledModel(g)(x.numpy())[0]
        with torch.no_grad():
            want = m(x).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        st.Executor(g).infer_value_types()
        run_passes(g, ["fuse_attention", "dce"])
        assert sum(1 for _ in g.find_nodes("FusedAttention")) == 1
        np.testing.assert_allclose(st.CompiledModel(g)(x.numpy())[0], want,
                                   rtol=1e-4, atol=1e-5)


def _onnx_rnn_weights_bidir(mod, kind):
    """torch bidirectional RNN module -> ONNX W, R, B stacked (2, ...)."""
    parts = []
    for sfx in ("", "_reverse"):
        w_ih = getattr(mod, f"weight_ih_l0{sfx}").detach().numpy()
        w_hh = getattr(mod, f"weight_hh_l0{sfx}").detach().numpy()
        b_ih = getattr(mod, f"bias_ih_l0{sfx}").detach().numpy()
        b_hh = getattr(mod, f"bias_hh_l0{sfx}").detach().numpy()
        if kind == "lstm":
            def reorder(a):
                i, f, gq, o = np.split(a, 4, axis=0)
                return np.concatenate([i, o, f, gq], axis=0)
            w_ih, w_hh = reorder(w_ih), reorder(w_hh)
            b_ih, b_hh = reorder(b_ih), reorder(b_hh)
        parts.append((w_ih, w_hh, np.concatenate([b_ih, b_hh])))
    W = np.stack([p[0] for p in parts])
    R = np.stack([p[1] for p in parts])
    Bb = np.stack([p[2] for p in parts])
    return W, R, Bb


class TestSequenceLens:
    """ONNX sequence_lens semantics: frames past each sequence's end are
    zeroed in Y, the carried state freezes at the last valid frame, and
    reverse directions reverse within the valid length. Reference: torch
    pack_padded_sequence (zero-pads exactly like ONNX)."""

    def _run(self, g, x, n_out=2):
        return st.CompiledModel(g)(x)

    def test_lstm_forward_seq_lens(self, rng):
        T, B, I, H = 6, 3, 4, 8
        lens = np.asarray([6, 3, 1], np.int32)
        torch.manual_seed(1)
        mod = nn.LSTM(I, H).eval()
        x = rng.standard_normal((T, B, I)).astype(np.float32)
        W, R, Bb = _onnx_rnn_weights(mod, "lstm")

        b = GraphBuilder("lstm_sl", opset=13)
        xi = b.input("x", (T, B, I))
        outs = b.node("LSTM", [xi, b.init(W), b.init(R), b.init(Bb),
                               b.init(lens)], outputs=3, hidden_size=H)
        g = b.finish(list(outs))
        y, h_n, c_n = st.CompiledModel(g)(x)

        packed = nn.utils.rnn.pack_padded_sequence(
            torch.from_numpy(x), torch.from_numpy(lens.astype(np.int64)))
        with torch.no_grad():
            out_p, (h_t, c_t) = mod(packed)
        want, _ = nn.utils.rnn.pad_packed_sequence(out_p, total_length=T)
        np.testing.assert_allclose(y[:, 0], want.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(h_n[0], h_t[0].numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(c_n[0], c_t[0].numpy(), rtol=1e-4, atol=1e-5)

    def test_lstm_bidirectional_seq_lens(self, rng):
        T, B, I, H = 5, 3, 4, 6
        lens = np.asarray([5, 4, 2], np.int32)
        torch.manual_seed(2)
        mod = nn.LSTM(I, H, bidirectional=True).eval()
        x = rng.standard_normal((T, B, I)).astype(np.float32)
        W, R, Bb = _onnx_rnn_weights_bidir(mod, "lstm")

        b = GraphBuilder("lstm_bi_sl", opset=13)
        xi = b.input("x", (T, B, I))
        outs = b.node("LSTM", [xi, b.init(W), b.init(R), b.init(Bb),
                               b.init(lens)], outputs=3, hidden_size=H,
                      direction="bidirectional")
        g = b.finish([outs[0], outs[1]])
        y, h_n = st.CompiledModel(g)(x)  # y (T, 2, B, H)

        packed = nn.utils.rnn.pack_padded_sequence(
            torch.from_numpy(x), torch.from_numpy(lens.astype(np.int64)))
        with torch.no_grad():
            out_p, (h_t, _) = mod(packed)
        want, _ = nn.utils.rnn.pad_packed_sequence(out_p, total_length=T)
        want = want.numpy().reshape(T, B, 2, H).transpose(0, 2, 1, 3)
        np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(h_n, h_t.numpy(), rtol=1e-4, atol=1e-5)

    def test_gru_reverse_seq_lens(self, rng):
        """Reverse-direction GRU vs torch bidirectional's reverse half."""
        T, B, I, H = 5, 2, 3, 4
        lens = np.asarray([4, 2], np.int32)
        torch.manual_seed(3)
        mod = nn.GRU(I, H, bidirectional=True).eval()
        x = rng.standard_normal((T, B, I)).astype(np.float32)
        # extract only the reverse-direction weights as a single-dir ONNX GRU
        def reorder(a):
            r, z, n = np.split(a, 3, axis=0)
            return np.concatenate([z, r, n], axis=0)
        W = reorder(mod.weight_ih_l0_reverse.detach().numpy())[None]
        R = reorder(mod.weight_hh_l0_reverse.detach().numpy())[None]
        Bb = np.concatenate([
            reorder(mod.bias_ih_l0_reverse.detach().numpy()),
            reorder(mod.bias_hh_l0_reverse.detach().numpy())])[None]

        b = GraphBuilder("gru_rev_sl", opset=13)
        xi = b.input("x", (T, B, I))
        outs = b.node("GRU", [xi, b.init(W), b.init(R), b.init(Bb),
                              b.init(lens)], outputs=2, hidden_size=H,
                      direction="reverse", linear_before_reset=1)
        g = b.finish([outs[0]])
        y = st.CompiledModel(g)(x)[0][:, 0]  # (T, B, H)

        packed = nn.utils.rnn.pack_padded_sequence(
            torch.from_numpy(x), torch.from_numpy(lens.astype(np.int64)))
        with torch.no_grad():
            out_p, _ = mod(packed)
        want, _ = nn.utils.rnn.pad_packed_sequence(out_p, total_length=T)
        want = want.numpy().reshape(T, B, 2, H)[:, :, 1]  # reverse half
        np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-5)


class TestLSTMExtras:
    def test_peephole(self, rng):
        """LSTM with peephole weights P vs a manual numpy reference
        (ONNX spec: i/f gates see C_{t-1}, o gate sees C_t)."""
        T, B, I, H = 4, 2, 3, 5
        W = (rng.standard_normal((1, 4 * H, I)) * 0.4).astype(np.float32)
        R = (rng.standard_normal((1, 4 * H, H)) * 0.4).astype(np.float32)
        P = (rng.standard_normal((1, 3 * H)) * 0.4).astype(np.float32)
        x = rng.standard_normal((T, B, I)).astype(np.float32)

        def sigmoid(a):
            return 1 / (1 + np.exp(-a))

        wi, wo, wf, wc = np.split(W[0], 4)
        ri, ro, rf, rc = np.split(R[0], 4)
        pi, po, pf = np.split(P[0], 3)
        h = np.zeros((B, H), np.float32)
        c = np.zeros((B, H), np.float32)
        outs = []
        for t in range(T):
            xt = x[t]
            i = sigmoid(xt @ wi.T + h @ ri.T + pi * c)
            f = sigmoid(xt @ wf.T + h @ rf.T + pf * c)
            cc = np.tanh(xt @ wc.T + h @ rc.T)
            c = f * c + i * cc
            o = sigmoid(xt @ wo.T + h @ ro.T + po * c)
            h = o * np.tanh(c)
            outs.append(h.copy())
        want = np.stack(outs)

        b = GraphBuilder("lstm_p", opset=13)
        xi = b.input("x", (T, B, I))
        outs_n = b.node("LSTM", [xi, b.init(W), b.init(R), "", "", "", "",
                                 b.init(P)], outputs=1, hidden_size=H)
        g = b.finish([outs_n])
        got = st.CompiledModel(g)(x)[0][:, 0]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_clip_and_relu_activations(self, rng):
        """RNN with clip + Relu activation vs manual reference."""
        T, B, I, H = 3, 2, 4, 5
        W = (rng.standard_normal((1, H, I)) * 1.5).astype(np.float32)
        R = (rng.standard_normal((1, H, H)) * 1.5).astype(np.float32)
        x = rng.standard_normal((T, B, I)).astype(np.float32)
        clip = 0.8

        h = np.zeros((B, H), np.float32)
        outs = []
        for t in range(T):
            h = np.maximum(np.clip(x[t] @ W[0].T + h @ R[0].T, -clip, clip), 0)
            outs.append(h.copy())
        want = np.stack(outs)

        b = GraphBuilder("rnn_clip", opset=13)
        xi = b.input("x", (T, B, I))
        y = b.node("RNN", [xi, b.init(W), b.init(R)], outputs=1,
                   hidden_size=H, clip=clip, activations=[b"Relu"])
        g = b.finish([y])
        got = st.CompiledModel(g)(x)[0][:, 0]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_unsupported_activation_raises(self, rng):
        from smelter_tpu.ir.errors import NotSupportedError
        b = GraphBuilder("rnn_bad", opset=13)
        xi = b.input("x", (2, 1, 3))
        W = np.zeros((1, 4, 3), np.float32)
        R = np.zeros((1, 4, 4), np.float32)
        y = b.node("RNN", [xi, b.init(W), b.init(R)], outputs=1,
                   hidden_size=4, activations=[b"LeakyRelu"])
        g = b.finish([y])
        with pytest.raises(NotSupportedError, match="activation"):
            st.CompiledModel(g)(np.zeros((2, 1, 3), np.float32))


class TestGRUDefaultMode:
    def test_gru_linear_before_reset_0(self, rng):
        """ONNX default (linear_before_reset=0) against a manual numpy
        reference (torch only implements =1)."""
        T, B, I, H = 4, 2, 5, 7
        W = rng.standard_normal((1, 3 * H, I)).astype(np.float32) * 0.3
        R = rng.standard_normal((1, 3 * H, H)).astype(np.float32) * 0.3
        Bb = rng.standard_normal((1, 6 * H)).astype(np.float32) * 0.1
        x = rng.standard_normal((T, B, I)).astype(np.float32)

        def sigmoid(a):
            return 1 / (1 + np.exp(-a))

        wz, wr, wh = np.split(W[0], 3)
        rz, rr, rh = np.split(R[0], 3)
        wbz, wbr, wbh = np.split(Bb[0, :3 * H], 3)
        rbz, rbr, rbh = np.split(Bb[0, 3 * H:], 3)
        h = np.zeros((B, H), np.float32)
        outs = []
        for t in range(T):
            xt = x[t]
            z = sigmoid(xt @ wz.T + wbz + h @ rz.T + rbz)
            r = sigmoid(xt @ wr.T + wbr + h @ rr.T + rbr)
            n = np.tanh(xt @ wh.T + wbh + (r * h) @ rh.T + rbh)
            h = (1 - z) * n + z * h
            outs.append(h.copy())
        want = np.stack(outs)

        b = GraphBuilder("gru0", opset=13)
        xi = b.input("x", (T, B, I))
        y = b.node("GRU", [xi, b.init(W), b.init(R), b.init(Bb)], outputs=2,
                   hidden_size=H, linear_before_reset=0)
        g = b.finish([y[0]])
        got = st.CompiledModel(g)(x)[0][:, 0]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestScan:
    def test_cumulative_sum_scan(self, rng):
        """Scan computing running sums: state + scan input -> state, output."""
        body = Graph(name="body", opset=13)
        body.inputs = [ValueInfo("acc"), ValueInfo("xt")]
        body.nodes = [Node("Add", ["acc", "xt"], ["acc_out"]),
                      Node("Identity", ["acc_out"], ["y_out"])]
        body.outputs = [ValueInfo("acc_out"), ValueInfo("y_out")]

        b = GraphBuilder("scan", opset=13)
        x = b.input("x", (5, 2, 3))
        init = b.init(np.zeros((2, 3), np.float32))
        outs = b.node("Scan", [init, x], outputs=2, num_scan_inputs=1, body=body)
        g = b.finish([outs[0], outs[1]])
        xin = rng.standard_normal((5, 2, 3)).astype(np.float32)
        final, ys = st.CompiledModel(g)(xin)
        np.testing.assert_allclose(final, xin.sum(0), rtol=1e-5)
        np.testing.assert_allclose(ys, np.cumsum(xin, axis=0), rtol=1e-5)


class TestDynamicLoop:
    def test_while_cond_loop(self, rng):
        """Loop whose body flips cond to False once the accumulator's first
        element exceeds a bound — lax.while_loop path."""
        import smelter_tpu as st

        body = Graph(name="body", opset=13)
        body.inputs = [ValueInfo("it"), ValueInfo("cond_in"), ValueInfo("acc")]
        body.nodes = [
            Node("Add", ["acc", "one"], ["acc_out"]),
            Node("ReduceSum", ["acc_out"], ["s"], attrs={"keepdims": 0}),
            Node("Less", ["s", "bound"], ["cond_out"]),
        ]
        body.outputs = [ValueInfo("cond_out"), ValueInfo("acc_out")]
        b = GraphBuilder("dynloop", opset=13)
        x = b.input("x", (2,))
        b.graph.initializers["one"] = np.ones(2, np.float32)
        b.graph.initializers["bound"] = np.float32(10.0)
        cond = b.init(np.bool_(True))
        y = b.node("Loop", ["", cond, x], body=body)
        g = b.finish([y])
        out = st.CompiledModel(g)(np.zeros(2, np.float32))[0]
        # each iter adds [1,1]; stops when sum >= 10 -> 5 iterations
        np.testing.assert_allclose(out, [5.0, 5.0])
