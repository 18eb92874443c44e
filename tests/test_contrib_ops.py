"""Golden tests for the com.microsoft contrib-op lowerings
(ops/contrib_ops.py) against torch/numpy references."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from test_ops_golden import run_op, t2n

RTOL, ATOL = 2e-3, 2e-4


def sdpa(q, k, v, mask=None, scale=None, causal=False):
    """torch reference attention over (B,S,H,hd) inputs."""
    qt = torch.from_numpy(q).transpose(1, 2)
    kt = torch.from_numpy(k).transpose(1, 2)
    vt = torch.from_numpy(v).transpose(1, 2)
    out = F.scaled_dot_product_attention(
        qt, kt, vt,
        attn_mask=None if mask is None else torch.from_numpy(mask),
        scale=scale, is_causal=causal)
    return t2n(out.transpose(1, 2))


class TestGelus:
    def test_fast_gelu_bias(self, rng):
        x = rng.standard_normal((3, 17)).astype(np.float32)
        b = rng.standard_normal(17).astype(np.float32)
        got = run_op("FastGelu", [x], initializers=[b])
        want = t2n(F.gelu(torch.from_numpy(x + b), approximate="tanh"))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_quick_gelu(self, rng):
        x = rng.standard_normal((4, 9)).astype(np.float32)
        got = run_op("QuickGelu", [x], dict(alpha=1.702))
        xt = torch.from_numpy(x)
        want = t2n(xt * torch.sigmoid(1.702 * xt))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_bias_gelu(self, rng):
        a = rng.standard_normal((2, 5, 8)).astype(np.float32)
        b = rng.standard_normal(8).astype(np.float32)
        got = run_op("BiasGelu", [a], initializers=[b])
        want = t2n(F.gelu(torch.from_numpy(a + b)))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_bias_split_gelu(self, rng):
        x = rng.standard_normal((2, 6, 20)).astype(np.float32)
        b = rng.standard_normal(20).astype(np.float32)
        got = run_op("BiasSplitGelu", [x], initializers=[b])
        h = torch.from_numpy(x + b)
        want = t2n(h[..., :10] * F.gelu(h[..., 10:]))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

def test_bias_add_exact(rng):
    from smelter_tpu.ir.build import GraphBuilder
    import smelter_tpu as st

    x = rng.standard_normal((2, 6, 8)).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    s = rng.standard_normal((2, 6, 8)).astype(np.float32)
    g = GraphBuilder("t", opset=17)
    xi = g.input("x", x.shape)
    si = g.input("s", s.shape)
    bi = g.init(b)
    out = g.node("BiasAdd", [xi, bi, si])
    m = st.CompiledModel(g.finish([out]))
    np.testing.assert_allclose(m(x, s)[0], x + b + s, rtol=RTOL, atol=ATOL)


class TestFusedMatMul:
    @pytest.mark.parametrize("ta,tb", [(0, 0), (1, 0), (0, 1), (1, 1)])
    def test_trans_alpha(self, rng, ta, tb):
        a = rng.standard_normal((2, 5, 7) if not ta else (2, 7, 5)).astype(np.float32)
        b = rng.standard_normal((2, 7, 4) if not tb else (2, 4, 7)).astype(np.float32)
        got = run_op("FusedMatMul", [a, b], dict(alpha=0.5, transA=ta, transB=tb))
        at = torch.from_numpy(a).transpose(-1, -2) if ta else torch.from_numpy(a)
        bt = torch.from_numpy(b).transpose(-1, -2) if tb else torch.from_numpy(b)
        np.testing.assert_allclose(got, t2n(0.5 * at @ bt), rtol=RTOL, atol=ATOL)


class TestNormFamily:
    def test_skip_layer_norm(self, rng):
        x = rng.standard_normal((2, 5, 16)).astype(np.float32)
        skip = rng.standard_normal((2, 5, 16)).astype(np.float32)
        gamma = rng.standard_normal(16).astype(np.float32)
        beta = rng.standard_normal(16).astype(np.float32)
        bias = rng.standard_normal(16).astype(np.float32)
        got = run_op("SkipLayerNormalization", [x, skip],
                     dict(epsilon=1e-5), initializers=[gamma, beta, bias],
                     n_outputs=1)
        want = t2n(F.layer_norm(torch.from_numpy(x + skip + bias), (16,),
                                torch.from_numpy(gamma), torch.from_numpy(beta),
                                eps=1e-5))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_skip_layer_norm_sum_output(self, rng):
        from smelter_tpu.ir.build import GraphBuilder
        import smelter_tpu as st

        x = rng.standard_normal((2, 3, 8)).astype(np.float32)
        skip = rng.standard_normal((2, 3, 8)).astype(np.float32)
        gamma = np.ones(8, np.float32)
        g = GraphBuilder("t", opset=17)
        xi = g.input("x", x.shape)
        si = g.input("s", skip.shape)
        gi = g.init(gamma)
        outs = g.node("SkipLayerNormalization", [xi, si, gi],
                      outputs=["y", "", "", "sum"], epsilon=1e-5)
        gr = g.finish(["y", "sum"])
        m = st.CompiledModel(gr)
        y, h = m(x, skip)
        np.testing.assert_allclose(h, x + skip, rtol=RTOL, atol=ATOL)

    def test_simplified_layer_norm(self, rng):
        x = rng.standard_normal((2, 5, 16)).astype(np.float32)
        gamma = rng.standard_normal(16).astype(np.float32)
        got = run_op("SimplifiedLayerNormalization", [x],
                     dict(epsilon=1e-6), initializers=[gamma])
        ms = (x.astype(np.float64) ** 2).mean(-1, keepdims=True)
        want = (x / np.sqrt(ms + 1e-6) * gamma).astype(np.float32)
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_skip_simplified_layer_norm(self, rng):
        x = rng.standard_normal((2, 4, 12)).astype(np.float32)
        skip = rng.standard_normal((2, 4, 12)).astype(np.float32)
        gamma = rng.standard_normal(12).astype(np.float32)
        got = run_op("SkipSimplifiedLayerNormalization", [x, skip],
                     dict(epsilon=1e-6), initializers=[gamma])
        h = x + skip
        ms = (h.astype(np.float64) ** 2).mean(-1, keepdims=True)
        want = (h / np.sqrt(ms + 1e-6) * gamma).astype(np.float32)
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    @pytest.mark.parametrize("act", [0, 1])
    def test_group_norm_contrib(self, rng, act):
        x = rng.standard_normal((2, 6, 5, 8)).astype(np.float32)  # NHWC
        gamma = rng.standard_normal(8).astype(np.float32)
        beta = rng.standard_normal(8).astype(np.float32)
        got = run_op("GroupNorm", [x], dict(groups=4, epsilon=1e-5,
                                            channels_last=1, activation=act),
                     initializers=[gamma, beta])
        xt = torch.from_numpy(np.moveaxis(x, -1, 1))
        want = F.group_norm(xt, 4, torch.from_numpy(gamma),
                            torch.from_numpy(beta), eps=1e-5)
        if act:
            want = want * torch.sigmoid(want)
        np.testing.assert_allclose(got, np.moveaxis(t2n(want), 1, -1),
                                   rtol=RTOL, atol=1e-3)

    def test_skip_group_norm(self, rng):
        from smelter_tpu.ir.build import GraphBuilder
        import smelter_tpu as st

        x = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
        skip = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
        gamma = rng.standard_normal(8).astype(np.float32)
        beta = rng.standard_normal(8).astype(np.float32)
        g = GraphBuilder("t", opset=17)
        xi = g.input("x", x.shape)
        si = g.input("s", skip.shape)
        outs = g.node("SkipGroupNorm", [xi, g.init(gamma), g.init(beta), si],
                      outputs=["y", "sum"], groups=2, epsilon=1e-5,
                      channels_last=1, activation=0)
        m = st.CompiledModel(g.finish(["y", "sum"]))
        y, h = m(x, skip)
        np.testing.assert_allclose(h, x + skip, rtol=RTOL, atol=ATOL)
        xt = torch.from_numpy(np.moveaxis(x + skip, -1, 1))
        want = F.group_norm(xt, 2, torch.from_numpy(gamma),
                            torch.from_numpy(beta), eps=1e-5)
        np.testing.assert_allclose(y, np.moveaxis(t2n(want), 1, -1),
                                   rtol=RTOL, atol=1e-3)


class TestNhwcConv:
    def test_vs_torch(self, rng):
        x = rng.standard_normal((2, 9, 9, 3)).astype(np.float32)
        w = rng.standard_normal((8, 3, 3, 3)).astype(np.float32)  # OHWI
        bias = rng.standard_normal(8).astype(np.float32)
        got = run_op("NhwcConv", [x], dict(strides=[2, 2], pads=[1, 1, 1, 1],
                                           kernel_shape=[3, 3], group=1),
                     initializers=[w, bias])
        xt = torch.from_numpy(np.moveaxis(x, -1, 1))
        wt = torch.from_numpy(np.moveaxis(w, -1, 1))  # OHWI -> OIHW
        want = F.conv2d(xt, wt, torch.from_numpy(bias), stride=2, padding=1)
        np.testing.assert_allclose(got, np.moveaxis(t2n(want), 1, -1),
                                   rtol=RTOL, atol=1e-3)


class TestAttention:
    B, S, H, HD = 2, 7, 4, 8
    D = H * HD

    def _proj(self, rng, x, w, bias):
        qkv = x @ w + bias
        q, k, v = np.split(qkv, 3, axis=-1)
        r = (self.B, self.S, self.H, self.HD)
        return q.reshape(r), k.reshape(r), v.reshape(r)

    def test_basic(self, rng):
        x = rng.standard_normal((self.B, self.S, self.D)).astype(np.float32)
        w = (rng.standard_normal((self.D, 3 * self.D)) * 0.1).astype(np.float32)
        bias = rng.standard_normal(3 * self.D).astype(np.float32)
        got = run_op("Attention", [x], dict(num_heads=self.H),
                     initializers=[w, bias])
        q, k, v = self._proj(rng, x, w, bias)
        want = sdpa(q, k, v).reshape(self.B, self.S, self.D)
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=1e-3)

    def test_causal(self, rng):
        x = rng.standard_normal((self.B, self.S, self.D)).astype(np.float32)
        w = (rng.standard_normal((self.D, 3 * self.D)) * 0.1).astype(np.float32)
        bias = np.zeros(3 * self.D, np.float32)
        got = run_op("Attention", [x], dict(num_heads=self.H, unidirectional=1),
                     initializers=[w, bias])
        q, k, v = self._proj(rng, x, w, bias)
        want = sdpa(q, k, v, causal=True).reshape(self.B, self.S, self.D)
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=1e-3)

    def test_length_mask(self, rng):
        x = rng.standard_normal((self.B, self.S, self.D)).astype(np.float32)
        w = (rng.standard_normal((self.D, 3 * self.D)) * 0.1).astype(np.float32)
        bias = np.zeros(3 * self.D, np.float32)
        lens = np.array([4, 7], np.int32)
        got = run_op("Attention", [x], dict(num_heads=self.H),
                     initializers=[w, bias, lens])
        q, k, v = self._proj(rng, x, w, bias)
        keep = np.arange(self.S)[None, :] < lens[:, None]  # (B,S)
        mask = np.where(keep, 0.0, -np.inf).astype(np.float32)
        want = sdpa(q, k, v, mask=mask[:, None, None, :])
        np.testing.assert_allclose(got, want.reshape(self.B, self.S, self.D),
                                   rtol=RTOL, atol=1e-2)

    def test_past_present(self, rng):
        from smelter_tpu.ir.build import GraphBuilder
        import smelter_tpu as st

        sp = 3
        x = rng.standard_normal((self.B, self.S, self.D)).astype(np.float32)
        w = (rng.standard_normal((self.D, 3 * self.D)) * 0.1).astype(np.float32)
        past = rng.standard_normal(
            (2, self.B, self.H, sp, self.HD)).astype(np.float32)
        g = GraphBuilder("t", opset=17)
        xi = g.input("x", x.shape)
        pi = g.input("past", past.shape)
        outs = g.node("Attention", [xi, g.init(w), "", "", pi],
                      outputs=["y", "present"], num_heads=self.H)
        m = st.CompiledModel(g.finish(["y", "present"]))
        y, present = m(x, past)
        qkv = x @ w
        q, k, v = np.split(qkv, 3, axis=-1)
        r = (self.B, self.S, self.H, self.HD)
        q, k, v = q.reshape(r), k.reshape(r), v.reshape(r)
        kf = np.concatenate([np.moveaxis(past[0], 1, 2), k], axis=1)
        vf = np.concatenate([np.moveaxis(past[1], 1, 2), v], axis=1)
        want = sdpa(q, kf, vf).reshape(self.B, self.S, self.D)
        np.testing.assert_allclose(y, want, rtol=RTOL, atol=1e-3)
        assert present.shape == (2, self.B, self.H, sp + self.S, self.HD)
        np.testing.assert_allclose(present[0], np.moveaxis(kf, 1, 2),
                                   rtol=RTOL, atol=ATOL)

    def test_unequal_qkv_sizes(self, rng):
        vh = 2 * self.D
        x = rng.standard_normal((self.B, self.S, self.D)).astype(np.float32)
        w = (rng.standard_normal((self.D, 2 * self.D + vh)) * 0.1).astype(np.float32)
        bias = np.zeros(2 * self.D + vh, np.float32)
        got = run_op("Attention", [x],
                     dict(num_heads=self.H,
                          qkv_hidden_sizes=[self.D, self.D, vh]),
                     initializers=[w, bias])
        qkv = x @ w
        q = qkv[..., :self.D].reshape(self.B, self.S, self.H, self.HD)
        k = qkv[..., self.D:2 * self.D].reshape(self.B, self.S, self.H, self.HD)
        v = qkv[..., 2 * self.D:].reshape(self.B, self.S, self.H, 2 * self.HD)
        want = sdpa(q, k, v).reshape(self.B, self.S, vh)
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=1e-3)


class TestQAttention:
    def test_dequant_matches_float_attention(self, rng):
        B, S, H, HD = 2, 5, 2, 8
        D = H * HD
        x = rng.standard_normal((B, S, D)).astype(np.float32)
        w = (rng.standard_normal((D, 3 * D)) * 0.1).astype(np.float32)
        bias = rng.standard_normal(3 * D).astype(np.float32)
        xs, ws = 0.02, 0.01
        xq = np.clip(np.round(x / xs), -127, 127).astype(np.int8)
        wq = np.clip(np.round(w / ws), -127, 127).astype(np.int8)
        got = run_op("QAttention", [xq],
                     dict(num_heads=H),
                     initializers=[wq, bias, np.float32(xs), np.float32(ws)])
        xd, wd = xq.astype(np.float32) * xs, wq.astype(np.float32) * ws
        qkv = xd @ wd + bias
        q, k, v = np.split(qkv, 3, axis=-1)
        r = (B, S, H, HD)
        want = sdpa(q.reshape(r), k.reshape(r), v.reshape(r)).reshape(B, S, D)
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=1e-2)


class TestMultiHeadAttention:
    B, SQ, SK, H, HD = 2, 5, 7, 4, 8
    D = H * HD

    def _qkv(self, rng):
        q = rng.standard_normal((self.B, self.SQ, self.D)).astype(np.float32)
        k = rng.standard_normal((self.B, self.SK, self.D)).astype(np.float32)
        v = rng.standard_normal((self.B, self.SK, self.D)).astype(np.float32)
        return q, k, v

    def test_cross_attention(self, rng):
        q, k, v = self._qkv(rng)
        got = run_op("MultiHeadAttention", [q, k, v], dict(num_heads=self.H))
        r = (self.B, -1, self.H, self.HD)
        want = sdpa(q.reshape(*r), k.reshape(*r), v.reshape(*r))
        np.testing.assert_allclose(got, want.reshape(self.B, self.SQ, self.D),
                                   rtol=RTOL, atol=1e-3)

    def test_key_padding_mask(self, rng):
        q, k, v = self._qkv(rng)
        mask = (np.arange(self.SK)[None, :] <
                np.array([[4], [6]])).astype(np.int32)
        from smelter_tpu.ir.build import GraphBuilder
        import smelter_tpu as st

        g = GraphBuilder("t", opset=17)
        qi = g.input("q", q.shape)
        ki = g.input("k", k.shape)
        vi = g.input("v", v.shape)
        mi = g.input("m", mask.shape, dtype=6)  # int32
        out = g.node("MultiHeadAttention", [qi, ki, vi, "", mi],
                     num_heads=self.H)
        m = st.CompiledModel(g.finish([out]))
        got = m(q, k, v, mask)[0]
        r = (self.B, -1, self.H, self.HD)
        amask = np.where(mask.astype(bool), 0.0, -np.inf).astype(np.float32)
        want = sdpa(q.reshape(*r), k.reshape(*r), v.reshape(*r),
                    mask=amask[:, None, None, :])
        np.testing.assert_allclose(got, want.reshape(self.B, self.SQ, self.D),
                                   rtol=RTOL, atol=1e-2)

    def test_packed_qkv(self, rng):
        q = rng.standard_normal(
            (self.B, self.SQ, self.H, 3, self.HD)).astype(np.float32)
        got = run_op("MultiHeadAttention", [q], dict(num_heads=self.H))
        want = sdpa(q[:, :, :, 0], q[:, :, :, 1], q[:, :, :, 2])
        np.testing.assert_allclose(got, want.reshape(self.B, self.SQ, self.D),
                                   rtol=RTOL, atol=1e-3)

    def test_bnsh_kv_with_past(self, rng):
        from smelter_tpu.ir.build import GraphBuilder
        import smelter_tpu as st

        sp = 3
        q = rng.standard_normal((self.B, self.SQ, self.D)).astype(np.float32)
        k4 = rng.standard_normal(
            (self.B, self.H, self.SK, self.HD)).astype(np.float32)
        v4 = rng.standard_normal(
            (self.B, self.H, self.SK, self.HD)).astype(np.float32)
        pk = rng.standard_normal(
            (self.B, self.H, sp, self.HD)).astype(np.float32)
        pv = rng.standard_normal(
            (self.B, self.H, sp, self.HD)).astype(np.float32)
        g = GraphBuilder("t", opset=17)
        names = [g.input(n, a.shape) for n, a in
                 [("q", q), ("k", k4), ("v", v4)]]
        names += ["", "", ""]
        names += [g.input("pk", pk.shape), g.input("pv", pv.shape)]
        outs = g.node("MultiHeadAttention", names,
                      outputs=["y", "prk", "prv"], num_heads=self.H)
        m = st.CompiledModel(g.finish(["y", "prk", "prv"]))
        y, prk, prv = m(q, k4, v4, pk, pv)
        kf = np.concatenate([pk, k4], axis=2)
        vf = np.concatenate([pv, v4], axis=2)
        want = sdpa(q.reshape(self.B, self.SQ, self.H, self.HD),
                    np.moveaxis(kf, 1, 2), np.moveaxis(vf, 1, 2))
        np.testing.assert_allclose(y, want.reshape(self.B, self.SQ, self.D),
                                   rtol=RTOL, atol=1e-3)
        np.testing.assert_allclose(prk, kf, rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(prv, vf, rtol=RTOL, atol=ATOL)


class TestGQA:
    def test_grouped_causal(self, rng):
        B, S, H, HKV, HD = 2, 6, 4, 2, 8
        q = rng.standard_normal((B, S, H * HD)).astype(np.float32)
        k = rng.standard_normal((B, S, HKV * HD)).astype(np.float32)
        v = rng.standard_normal((B, S, HKV * HD)).astype(np.float32)
        got = run_op("GroupQueryAttention", [q, k, v],
                     dict(num_heads=H, kv_num_heads=HKV), n_outputs=1)
        kr = np.repeat(k.reshape(B, S, HKV, HD), H // HKV, axis=2)
        vr = np.repeat(v.reshape(B, S, HKV, HD), H // HKV, axis=2)
        want = sdpa(q.reshape(B, S, H, HD), kr, vr, causal=True)
        np.testing.assert_allclose(got, want.reshape(B, S, H * HD),
                                   rtol=RTOL, atol=1e-2)

    def test_packed_with_seqlens(self, rng):
        from smelter_tpu.ir.build import GraphBuilder
        import smelter_tpu as st

        B, S, H, HKV, HD = 2, 6, 4, 2, 8
        qkv = rng.standard_normal((B, S, (H + 2 * HKV) * HD)).astype(np.float32)
        seqlens = np.array([3, 6], np.int32) - 1
        g = GraphBuilder("t", opset=17)
        qi = g.input("q", qkv.shape)
        sl = g.input("sl", seqlens.shape, dtype=6)
        out = g.node("GroupQueryAttention", [qi, "", "", "", "", sl],
                     num_heads=H, kv_num_heads=HKV)
        m = st.CompiledModel(g.finish([out]))
        got = m(qkv, seqlens)[0]
        q = qkv[..., :H * HD].reshape(B, S, H, HD)
        k = qkv[..., H * HD:(H + HKV) * HD].reshape(B, S, HKV, HD)
        v = qkv[..., (H + HKV) * HD:].reshape(B, S, HKV, HD)
        kr = np.repeat(k, H // HKV, axis=2)
        vr = np.repeat(v, H // HKV, axis=2)
        causal = np.tril(np.ones((S, S), bool))
        keep = causal[None] & (np.arange(S)[None, None, :] <
                               (seqlens + 1)[:, None, None])
        mask = np.where(keep, 0.0, -1e9).astype(np.float32)[:, None]
        want = sdpa(q, kr, vr, mask=mask)
        # rows where everything is masked produce garbage in both impls for
        # queries past the length; compare only valid queries
        for b in range(B):
            s_valid = seqlens[b] + 1
            np.testing.assert_allclose(
                got[b, :s_valid], want.reshape(B, S, H * HD)[b, :s_valid],
                rtol=RTOL, atol=1e-2)

    def _cached_graph(self, B, S, H, HKV, HD, MAXL):
        import smelter_tpu as st
        from smelter_tpu.ir.build import GraphBuilder

        g = GraphBuilder("t", opset=17)
        qi = g.input("q", (B, S, H * HD))
        ki = g.input("k", (B, S, HKV * HD))
        vi = g.input("v", (B, S, HKV * HD))
        pk = g.input("pk", (B, HKV, MAXL, HD))
        pv = g.input("pv", (B, HKV, MAXL, HD))
        sl = g.input("sl", (B,), dtype=6)
        outs = g.node("GroupQueryAttention", [qi, ki, vi, pk, pv, sl],
                      outputs=["y", "prk", "prv"],
                      num_heads=H, kv_num_heads=HKV)
        return st.CompiledModel(g.finish(["y", "prk", "prv"]))

    def test_shared_buffer_past_decode_parity(self, rng):
        """ORT-genai serving pattern: prompt chunk into an empty shared
        buffer, then per-token steps with growing seqlens_k — every
        position must match the full causal no-cache form."""
        B, T, H, HKV, HD, MAXL = 2, 7, 4, 2, 8, 12
        S0 = 4
        q = rng.standard_normal((B, T, H * HD)).astype(np.float32)
        k = rng.standard_normal((B, T, HKV * HD)).astype(np.float32)
        v = rng.standard_normal((B, T, HKV * HD)).astype(np.float32)
        want = run_op("GroupQueryAttention", [q, k, v],
                      dict(num_heads=H, kv_num_heads=HKV), n_outputs=1)
        mp = self._cached_graph(B, S0, H, HKV, HD, MAXL)
        zeros = np.zeros((B, HKV, MAXL, HD), np.float32)
        sl = np.full((B,), S0 - 1, np.int32)
        y, prk, prv = mp(q[:, :S0], k[:, :S0], v[:, :S0], zeros, zeros, sl)
        np.testing.assert_allclose(y, want[:, :S0], rtol=RTOL, atol=1e-2)
        ms = self._cached_graph(B, 1, H, HKV, HD, MAXL)
        for t in range(S0, T):
            sl = np.full((B,), t, np.int32)  # tot = t+1
            y, prk, prv = ms(q[:, t:t + 1], k[:, t:t + 1], v[:, t:t + 1],
                             prk, prv, sl)
            np.testing.assert_allclose(y[:, 0], want[:, t], rtol=RTOL,
                                       atol=1e-2, err_msg=f"pos {t}")
        # present buffers carry the rotated-free raw K rows 0..T-1
        np.testing.assert_allclose(
            np.moveaxis(prk, 1, 2)[:, :T].reshape(B, T, HKV * HD), k,
            rtol=RTOL, atol=ATOL)

    def test_shared_buffer_per_batch_lengths(self, rng):
        """Per-batch seqlens_k: each stream steps at its OWN position —
        the continuous-batching shape. Reference: per-batch full runs."""
        B, H, HKV, HD, MAXL = 2, 4, 2, 8, 10
        lens = [5, 3]  # stream 0 decodes at position 5, stream 1 at 3
        q = rng.standard_normal((B, 1, H * HD)).astype(np.float32)
        k1 = rng.standard_normal((B, 1, HKV * HD)).astype(np.float32)
        v1 = rng.standard_normal((B, 1, HKV * HD)).astype(np.float32)
        hist_k = rng.standard_normal((B, max(lens), HKV * HD)).astype(np.float32)
        hist_v = rng.standard_normal((B, max(lens), HKV * HD)).astype(np.float32)
        pk = np.zeros((B, HKV, MAXL, HD), np.float32)
        pv = np.zeros((B, HKV, MAXL, HD), np.float32)
        for b, ln in enumerate(lens):
            pk[b, :, :ln] = np.moveaxis(
                hist_k[b, :ln].reshape(ln, HKV, HD), 0, 1)
            pv[b, :, :ln] = np.moveaxis(
                hist_v[b, :ln].reshape(ln, HKV, HD), 0, 1)
        ms = self._cached_graph(B, 1, H, HKV, HD, MAXL)
        sl = np.asarray(lens, np.int32)  # tot = len+1 (incl. new token)
        y, prk, prv = ms(q, k1, v1, pk, pv, sl)
        for b, ln in enumerate(lens):
            kf = np.concatenate([hist_k[b:b + 1, :ln], k1[b:b + 1]], axis=1)
            vf = np.concatenate([hist_v[b:b + 1, :ln], v1[b:b + 1]], axis=1)
            kr = np.repeat(kf.reshape(1, ln + 1, HKV, HD), H // HKV, axis=2)
            vr = np.repeat(vf.reshape(1, ln + 1, HKV, HD), H // HKV, axis=2)
            want = sdpa(q[b:b + 1].reshape(1, 1, H, HD), kr, vr)
            np.testing.assert_allclose(
                y[b:b + 1], want.reshape(1, 1, H * HD), rtol=RTOL,
                atol=1e-2, err_msg=f"stream {b}")
            # the new row landed at position len
            np.testing.assert_allclose(
                prk[b, :, lens[b]],
                k1[b, 0].reshape(HKV, HD), rtol=RTOL, atol=ATOL)


class TestRotary:
    def _rotate_ref(self, x, pos, cos, sin, interleaved):
        # x (B,S,H,hd); rotate over full hd
        r2 = cos.shape[-1]
        c = cos[pos][:, :, None, :]
        s = sin[pos][:, :, None, :]
        if interleaved:
            x1, x2 = x[..., 0::2], x[..., 1::2]
            out = np.empty_like(x)
            out[..., 0::2] = x1 * c - x2 * s
            out[..., 1::2] = x1 * s + x2 * c
            return out
        x1, x2 = x[..., :r2], x[..., r2:]
        return np.concatenate([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)

    @pytest.mark.parametrize("interleaved", [0, 1])
    def test_4d(self, rng, interleaved):
        from smelter_tpu.ir.build import GraphBuilder
        import smelter_tpu as st

        B, H, S, HD = 2, 3, 5, 8
        x = rng.standard_normal((B, H, S, HD)).astype(np.float32)
        pos = np.tile(np.arange(S, dtype=np.int64), (B, 1))
        inv = 1.0 / 10000 ** (np.arange(0, HD, 2) / HD)
        ang = np.arange(16)[:, None] * inv[None]
        cos, sin = np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)
        g = GraphBuilder("t", opset=17)
        xi = g.input("x", x.shape)
        pi = g.input("p", pos.shape, dtype=7)  # int64
        out = g.node("RotaryEmbedding", [xi, pi, g.init(cos), g.init(sin)],
                     interleaved=interleaved)
        m = st.CompiledModel(g.finish([out]))
        got = m(x, pos)[0]
        xn = np.moveaxis(x, 1, 2)  # (B,S,H,hd)
        want = np.moveaxis(
            self._rotate_ref(xn, pos, cos, sin, interleaved), 2, 1)
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=1e-3)

    def test_3d_heads(self, rng):
        from smelter_tpu.ir.build import GraphBuilder
        import smelter_tpu as st

        B, S, H, HD = 2, 5, 4, 8
        x = rng.standard_normal((B, S, H * HD)).astype(np.float32)
        pos = np.tile(np.arange(S, dtype=np.int64), (B, 1))
        inv = 1.0 / 10000 ** (np.arange(0, HD, 2) / HD)
        ang = np.arange(16)[:, None] * inv[None]
        cos, sin = np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)
        g = GraphBuilder("t", opset=17)
        xi = g.input("x", x.shape)
        pi = g.input("p", pos.shape, dtype=7)
        out = g.node("RotaryEmbedding", [xi, pi, g.init(cos), g.init(sin)],
                     num_heads=H)
        m = st.CompiledModel(g.finish([out]))
        got = m(x, pos)[0]
        xh = x.reshape(B, S, H, HD)
        want = self._rotate_ref(xh, pos, cos, sin, 0).reshape(B, S, H * HD)
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=1e-3)


class TestEmbedLayerNorm:
    def test_full(self, rng):
        from smelter_tpu.ir.build import GraphBuilder
        import smelter_tpu as st

        B, S, V, Hd = 2, 6, 30, 16
        ids = rng.integers(0, V, (B, S)).astype(np.int32)
        seg = rng.integers(0, 2, (B, S)).astype(np.int32)
        word = rng.standard_normal((V, Hd)).astype(np.float32)
        post = rng.standard_normal((S + 2, Hd)).astype(np.float32)
        segt = rng.standard_normal((2, Hd)).astype(np.float32)
        gamma = rng.standard_normal(Hd).astype(np.float32)
        beta = rng.standard_normal(Hd).astype(np.float32)
        mask = (np.arange(S)[None, :] < np.array([[4], [6]])).astype(np.int32)
        g = GraphBuilder("t", opset=17)
        ii = g.input("ids", ids.shape, dtype=6)
        si = g.input("seg", seg.shape, dtype=6)
        mi = g.input("mask", mask.shape, dtype=6)
        outs = g.node(
            "EmbedLayerNormalization",
            [ii, si, g.init(word), g.init(post), g.init(segt),
             g.init(gamma), g.init(beta), mi],
            outputs=["y", "mask_index"], epsilon=1e-5)
        m = st.CompiledModel(g.finish(["y", "mask_index"]))
        y, mix = m(ids, seg, mask)
        e = word[ids] + post[:S][None] + segt[seg]
        want = t2n(F.layer_norm(torch.from_numpy(e), (Hd,),
                                torch.from_numpy(gamma),
                                torch.from_numpy(beta), eps=1e-5))
        np.testing.assert_allclose(y, want, rtol=RTOL, atol=1e-3)
        np.testing.assert_array_equal(mix, [4, 6])


class TestMatMulNBits:
    @pytest.mark.parametrize("bits", [4, 8])
    def test_roundtrip(self, rng, bits):
        M, K, N, BS = 5, 64, 12, 16
        nb = K // BS
        a = rng.standard_normal((M, K)).astype(np.float32)
        wf = rng.integers(0, 2 ** bits, (N, nb, BS)).astype(np.uint8)
        scales = (rng.standard_normal((N, nb)) * 0.1 + 0.5).astype(np.float32)
        if bits == 4:
            pairs = wf.reshape(N, nb, BS // 2, 2)
            packed = (pairs[..., 0] | (pairs[..., 1] << 4)).astype(np.uint8)
        else:
            packed = wf
        got = run_op("MatMulNBits", [a],
                     dict(K=K, N=N, bits=bits, block_size=BS),
                     initializers=[packed, scales.reshape(-1)])
        zp = 1 << (bits - 1)
        wd = (wf.astype(np.float32) - zp) * scales[:, :, None]
        want = a @ wd.reshape(N, K).T
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=1e-2)

    def test_uint8_zero_points_and_bias(self, rng):
        M, K, N, BS = 4, 32, 6, 16
        nb = K // BS
        a = rng.standard_normal((M, K)).astype(np.float32)
        wf = rng.integers(0, 16, (N, nb, BS)).astype(np.uint8)
        scales = (rng.standard_normal((N, nb)) * 0.1 + 0.5).astype(np.float32)
        zps = rng.integers(0, 16, (N, nb)).astype(np.uint8)
        bias = rng.standard_normal(N).astype(np.float32)
        pairs = wf.reshape(N, nb, BS // 2, 2)
        packed = (pairs[..., 0] | (pairs[..., 1] << 4)).astype(np.uint8)
        zpairs = np.zeros((N, (nb + 1) // 2 * 2), np.uint8)
        zpairs[:, :nb] = zps
        zpacked = (zpairs[:, 0::2] | (zpairs[:, 1::2] << 4)).astype(np.uint8)
        from smelter_tpu.ir.build import GraphBuilder
        import smelter_tpu as st

        g = GraphBuilder("t", opset=17)
        ai = g.input("a", a.shape)
        out = g.node("MatMulNBits",
                     [ai, g.init(packed), g.init(scales.reshape(-1)),
                      g.init(zpacked), "", g.init(bias)],
                     K=K, N=N, bits=4, block_size=BS)
        m = st.CompiledModel(g.finish([out]))
        got = m(a)[0]
        wd = (wf.astype(np.float32) - zps[:, :, None]) * scales[:, :, None]
        want = a @ wd.reshape(N, K).T + bias
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=1e-2)


class TestMHAPackedKV:
    def test_packed_kv(self, rng):
        B, SQ, SK, H, HD = 2, 4, 6, 2, 8
        D = H * HD
        q = rng.standard_normal((B, SQ, D)).astype(np.float32)
        kv = rng.standard_normal((B, SK, H, 2, HD)).astype(np.float32)
        got = run_op("MultiHeadAttention", [q, kv], dict(num_heads=H))
        want = sdpa(q.reshape(B, SQ, H, HD), kv[:, :, :, 0], kv[:, :, :, 1])
        np.testing.assert_allclose(got, want.reshape(B, SQ, D),
                                   rtol=RTOL, atol=1e-3)


class TestGQAWindow:
    def test_sliding_window(self, rng):
        B, S, H, HKV, HD = 1, 8, 2, 1, 8
        W = 3
        q = rng.standard_normal((B, S, H * HD)).astype(np.float32)
        k = rng.standard_normal((B, S, HKV * HD)).astype(np.float32)
        v = rng.standard_normal((B, S, HKV * HD)).astype(np.float32)
        got = run_op("GroupQueryAttention", [q, k, v],
                     dict(num_heads=H, kv_num_heads=HKV,
                          local_window_size=W), n_outputs=1)
        kr = np.repeat(k.reshape(B, S, HKV, HD), H // HKV, axis=2)
        vr = np.repeat(v.reshape(B, S, HKV, HD), H // HKV, axis=2)
        ii, jj = np.meshgrid(np.arange(S), np.arange(S), indexing="ij")
        keep = (jj <= ii) & (jj > ii - W)  # window keys incl. current
        mask = np.where(keep, 0.0, -1e9).astype(np.float32)[None, None]
        want = sdpa(q.reshape(B, S, H, HD), kr, vr, mask=mask)
        np.testing.assert_allclose(got, want.reshape(B, S, H * HD),
                                   rtol=RTOL, atol=1e-2)


class TestGatherNDBatchDims:
    def test_batch_dims_1(self, rng):
        x = rng.standard_normal((3, 5, 7)).astype(np.float32)
        idx = rng.integers(0, 5, (3, 4, 1)).astype(np.int64)
        got = run_op("GatherND", [x, idx], dict(batch_dims=1), opset=13)
        want = np.stack([x[i][idx[i, :, 0]] for i in range(3)])
        np.testing.assert_array_equal(got, want)

    def test_batch_dims_2(self, rng):
        x = rng.standard_normal((2, 3, 6, 4)).astype(np.float32)
        idx = rng.integers(0, 6, (2, 3, 2, 1)).astype(np.int64)
        got = run_op("GatherND", [x, idx], dict(batch_dims=2), opset=13)
        want = np.empty((2, 3, 2, 4), np.float32)
        for i in range(2):
            for j in range(3):
                want[i, j] = x[i, j][idx[i, j, :, 0]]
        np.testing.assert_array_equal(got, want)


class TestAttentionRotary:
    def test_do_rotary_vs_manual(self, rng):
        B, S, H, HD = 2, 6, 2, 8
        D = H * HD
        x = rng.standard_normal((B, S, D)).astype(np.float32)
        w = (rng.standard_normal((D, 3 * D)) * 0.1).astype(np.float32)
        bias = np.zeros(3 * D, np.float32)
        got = run_op("Attention", [x], dict(num_heads=H, do_rotary=1,
                                            unidirectional=1),
                     initializers=[w, bias])
        qkv = x @ w
        q, k, v = np.split(qkv, 3, axis=-1)
        r4 = (B, S, H, HD)
        q, k, v = q.reshape(r4), k.reshape(r4), v.reshape(r4)
        inv = 1.0 / 10000.0 ** (np.arange(0, HD, 2) / HD)
        ang = np.arange(S)[:, None] * inv[None]
        cos = np.cos(ang)[None, :, None, :]
        sin = np.sin(ang)[None, :, None, :]

        def rot(t):
            t1, t2 = t[..., :HD // 2], t[..., HD // 2:]
            return np.concatenate([t1 * cos - t2 * sin,
                                   t1 * sin + t2 * cos], -1).astype(np.float32)

        want = sdpa(rot(q), rot(k), v, causal=True).reshape(B, S, D)
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=1e-2)


class TestMatMulNBits8BitZp:
    def test_uint8_zero_points_no_wraparound(self, rng):
        M, K, N, BS = 4, 32, 6, 16
        nb = K // BS
        a = rng.standard_normal((M, K)).astype(np.float32)
        # weights near 255 with zero-point 0: w-zp = 255 would wrap in int8
        wf = rng.integers(200, 256, (N, nb, BS)).astype(np.uint8)
        scales = np.full((N, nb), 0.01, np.float32)
        zps = np.zeros((N, nb), np.uint8)
        bias = rng.standard_normal(N).astype(np.float32)
        from smelter_tpu.ir.build import GraphBuilder
        import smelter_tpu as st

        g = GraphBuilder("t", opset=17)
        ai = g.input("a", a.shape)
        out = g.node("MatMulNBits",
                     [ai, g.init(wf), g.init(scales.reshape(-1)),
                      g.init(zps), "", g.init(bias)],
                     K=K, N=N, bits=8, block_size=BS)
        m = st.CompiledModel(g.finish([out]))
        got = m(a)[0]
        wd = (wf.astype(np.float32) - zps[:, :, None]) * scales[:, :, None]
        want = a @ wd.reshape(N, K).T + bias
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-2)


class TestMoE:
    def _ref(self, x, router, w1, b1, w2, k, norm, act_fn):
        import scipy.special as sp

        probs = sp.softmax(router.astype(np.float64), axis=-1)
        order = np.argsort(-probs, axis=-1)[:, :k]
        out = np.zeros_like(x, np.float64)
        for r in range(x.shape[0]):
            sel = order[r]
            wts = probs[r, sel]
            if norm:
                wts = wts / wts.sum()
            for e, wt in zip(sel, wts):
                h = act_fn(x[r] @ w1[e] + b1[e])
                out[r] += wt * (h @ w2[e])
        return out.astype(np.float32)

    @pytest.mark.parametrize("k,norm", [(1, 0), (2, 1)])
    def test_topk_routing(self, rng, k, norm):
        R, H, E, I = 6, 8, 4, 16
        x = rng.standard_normal((R, H)).astype(np.float32)
        router = rng.standard_normal((R, E)).astype(np.float32)
        w1 = (rng.standard_normal((E, H, I)) * 0.3).astype(np.float32)
        b1 = rng.standard_normal((E, I)).astype(np.float32)
        w2 = (rng.standard_normal((E, I, H)) * 0.3).astype(np.float32)
        got = run_op("MoE", [x, router],
                     dict(k=k, activation_type="relu",
                          normalize_routing_weights=norm),
                     initializers=[w1, b1, w2])
        want = self._ref(x, router, w1, b1, w2, k, norm,
                         lambda v: np.maximum(v, 0))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_swiglu_fc3(self, rng):
        R, H, E, I = 4, 8, 2, 12
        x = rng.standard_normal((R, H)).astype(np.float32)
        router = rng.standard_normal((R, E)).astype(np.float32)
        w1 = (rng.standard_normal((E, H, I)) * 0.3).astype(np.float32)
        w2 = (rng.standard_normal((E, I, H)) * 0.3).astype(np.float32)
        w3 = (rng.standard_normal((E, H, I)) * 0.3).astype(np.float32)
        from smelter_tpu.ir.build import GraphBuilder
        import smelter_tpu as st

        g = GraphBuilder("t", opset=17)
        xi = g.input("x", x.shape)
        ri = g.input("r", router.shape)
        out = g.node("MoE", [xi, ri, g.init(w1), "", g.init(w2), "",
                             g.init(w3)],
                     k=1, activation_type="swiglu")
        m = st.CompiledModel(g.finish([out]))
        got = m(x, router)[0]

        import scipy.special as sp

        probs = sp.softmax(router.astype(np.float64), -1)
        sel = np.argmax(probs, -1)
        want = np.zeros_like(x, np.float64)
        for r in range(R):
            e = sel[r]

            def silu(v):
                return v / (1 + np.exp(-v))

            h = silu(x[r] @ w1[e]) * (x[r] @ w3[e])
            want[r] = probs[r, e] * (h @ w2[e])
        np.testing.assert_allclose(got, want.astype(np.float32),
                                   rtol=1e-3, atol=1e-3)


class TestQMoE:
    @pytest.mark.parametrize("bits", [4, 8])
    def test_matches_float_moe(self, rng, bits):
        R, H, E, I = 5, 8, 3, 12
        x = rng.standard_normal((R, H)).astype(np.float32)
        router = rng.standard_normal((R, E)).astype(np.float32)
        lo, hi = (0, 16) if bits == 4 else (0, 256)
        off = 8 if bits == 4 else 128
        w1q = rng.integers(lo, hi, (E, H, I)).astype(np.uint8)
        w2q = rng.integers(lo, hi, (E, I, H)).astype(np.uint8)
        s1 = np.full((E, I), 0.05, np.float32)
        s2 = np.full((E, H), 0.05, np.float32)

        def pack(w):
            if bits == 8:
                return w
            pairs = w.reshape(w.shape[0], w.shape[1], -1, 2)
            return (pairs[..., 0] | (pairs[..., 1] << 4)).astype(np.uint8)

        from smelter_tpu.ir.build import GraphBuilder
        import smelter_tpu as st

        g = GraphBuilder("t", opset=17)
        xi = g.input("x", x.shape)
        ri = g.input("r", router.shape)
        out = g.node("QMoE",
                     [xi, ri, g.init(pack(w1q)), g.init(s1.reshape(-1)), "",
                      g.init(pack(w2q)), g.init(s2.reshape(-1)), ""],
                     k=2, activation_type="relu",
                     normalize_routing_weights=1, expert_weight_bits=bits)
        m = st.CompiledModel(g.finish([out]))
        got = m(x, router)[0]
        # float reference through the plain MoE op with dequantized weights
        w1 = (w1q.astype(np.float32) - off) * s1[:, None, :]
        w2 = (w2q.astype(np.float32) - off) * s2[:, None, :]
        g2 = GraphBuilder("t2", opset=17)
        xi2 = g2.input("x", x.shape)
        ri2 = g2.input("r", router.shape)
        out2 = g2.node("MoE", [xi2, ri2, g2.init(w1), "", g2.init(w2)],
                       k=2, activation_type="relu",
                       normalize_routing_weights=1)
        want = st.CompiledModel(g2.finish([out2]))(x, router)[0]
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


class TestMoEGating:
    def test_geglu_gating_uses_activation(self, rng):
        """fc3 present with activation_type='gelu' must gate with gelu,
        not silu."""
        R, H, E, I = 3, 8, 2, 10
        x = rng.standard_normal((R, H)).astype(np.float32)
        router = rng.standard_normal((R, E)).astype(np.float32)
        w1 = (rng.standard_normal((E, H, I)) * 0.4).astype(np.float32)
        w2 = (rng.standard_normal((E, I, H)) * 0.4).astype(np.float32)
        w3 = (rng.standard_normal((E, H, I)) * 0.4).astype(np.float32)
        from smelter_tpu.ir.build import GraphBuilder
        import smelter_tpu as st
        import scipy.special as sp

        g = GraphBuilder("t", opset=17)
        xi = g.input("x", x.shape)
        ri = g.input("r", router.shape)
        out = g.node("MoE", [xi, ri, g.init(w1), "", g.init(w2), "",
                             g.init(w3)], k=1, activation_type="gelu")
        got = st.CompiledModel(g.finish([out]))(x, router)[0]
        probs = sp.softmax(router.astype(np.float64), -1)
        sel = np.argmax(probs, -1)
        want = np.zeros_like(x, np.float64)
        for r in range(R):
            e = sel[r]
            h = x[r] @ w1[e]
            gelu = 0.5 * h * (1 + sp.erf(h / np.sqrt(2)))
            want[r] = probs[r, e] * ((gelu * (x[r] @ w3[e])) @ w2[e])
        np.testing.assert_allclose(got, want.astype(np.float32),
                                   rtol=1e-3, atol=1e-3)

    def test_swiglu_without_fc3_raises(self, rng):
        from smelter_tpu.ir.build import GraphBuilder
        from smelter_tpu.ir.errors import NotSupportedError
        import smelter_tpu as st

        g = GraphBuilder("t", opset=17)
        xi = g.input("x", (2, 8))
        ri = g.input("r", (2, 2))
        out = g.node("MoE", [xi, ri,
                             g.init(np.zeros((2, 8, 4), np.float32)), "",
                             g.init(np.zeros((2, 4, 8), np.float32))],
                     k=1, activation_type="swiglu")
        m = st.CompiledModel(g.finish([out]))
        with pytest.raises(NotSupportedError):
            m(np.zeros((2, 8), np.float32), np.zeros((2, 2), np.float32))
