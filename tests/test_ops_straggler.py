"""Golden tests for the standard-domain straggler ops added in round 2:
LpPool/GlobalLpPool, AffineGrid, DeformConv, bitwise family, random ops,
and the loss ops."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from test_ops_golden import run_op, t2n

RTOL, ATOL = 1e-4, 1e-4


class TestLpPool:
    @pytest.mark.parametrize("p,stride", [(2, 1), (2, 2), (1, 2), (3, 1)])
    def test_vs_torch(self, rng, p, stride):
        x = rng.standard_normal((2, 3, 9, 11)).astype(np.float32)
        got = run_op("LpPool", [x], dict(kernel_shape=[3, 3],
                                         strides=[stride, stride], p=p),
                     opset=18)
        # ONNX pools |x|^p; torch lp_pool2d pools x^p — feed |x| so the two
        # agree for odd p as well
        want = t2n(F.lp_pool2d(torch.from_numpy(np.abs(x)), p, 3,
                               stride=stride))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_global(self, rng):
        x = rng.standard_normal((2, 4, 6, 6)).astype(np.float32)
        got = run_op("GlobalLpPool", [x], dict(p=2))
        want = np.sqrt((x.astype(np.float64) ** 2).sum((2, 3), keepdims=True))
        np.testing.assert_allclose(got, want.astype(np.float32),
                                   rtol=1e-4, atol=1e-4)


class TestAffineGrid:
    @pytest.mark.parametrize("align", [0, 1])
    def test_2d_vs_torch(self, rng, align):
        theta = rng.standard_normal((2, 2, 3)).astype(np.float32)
        size = np.array([2, 3, 5, 7], np.int64)
        got = run_op("AffineGrid", [theta], dict(align_corners=align),
                     opset=20, initializers=[size])
        want = t2n(F.affine_grid(torch.from_numpy(theta), [2, 3, 5, 7],
                                 align_corners=bool(align)))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_3d_vs_torch(self, rng):
        theta = rng.standard_normal((1, 3, 4)).astype(np.float32)
        size = np.array([1, 2, 3, 4, 5], np.int64)
        got = run_op("AffineGrid", [theta], dict(align_corners=0),
                     opset=20, initializers=[size])
        want = t2n(F.affine_grid(torch.from_numpy(theta), [1, 2, 3, 4, 5],
                                 align_corners=False))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def _deform_conv_ref(x, w, offset, bias, mask, stride, pad, dil, group, og):
    """Loop reference with torchvision deform_conv2d semantics (the ONNX-19
    DeformConv contract): offsets laid out (og, kH, kW, [dy,dx]), bilinear
    sampling with zeros outside."""
    N, C, H, W = x.shape
    O, Cg, KH, KW = w.shape
    oh = (H + 2 * pad - dil * (KH - 1) - 1) // stride + 1
    ow = (W + 2 * pad - dil * (KW - 1) - 1) // stride + 1

    def sample(img, py, px):
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        dy, dx = py - y0, px - x0
        v = 0.0
        for yy, xx, cw in ((y0, x0, (1 - dy) * (1 - dx)),
                           (y0, x0 + 1, (1 - dy) * dx),
                           (y0 + 1, x0, dy * (1 - dx)),
                           (y0 + 1, x0 + 1, dy * dx)):
            if 0 <= yy < H and 0 <= xx < W:
                v += cw * img[yy, xx]
        return v

    out = np.zeros((N, O, oh, ow), np.float64)
    for n in range(N):
        for o_ in range(O):
            gi = o_ // (O // group)
            for i in range(oh):
                for j in range(ow):
                    acc = 0.0 if bias is None else float(bias[o_])
                    for cl in range(Cg):
                        c = gi * Cg + cl
                        ogi = c // (C // og)
                        for a in range(KH):
                            for b in range(KW):
                                tap = (ogi * KH + a) * KW + b
                                py = (i * stride - pad + a * dil
                                      + offset[n, tap * 2, i, j])
                                px = (j * stride - pad + b * dil
                                      + offset[n, tap * 2 + 1, i, j])
                                v = sample(x[n, c], py, px)
                                if mask is not None:
                                    v *= mask[n, tap, i, j]
                                acc += w[o_, cl, a, b] * v
                    out[n, o_, i, j] = acc
    return out.astype(np.float32)


class TestDeformConv:
    def _run(self, rng, group=1, og=1, with_mask=False, with_bias=False,
             stride=1, pad=1, dil=1):
        N, C, H, W = 2, 4 * group, 8, 9
        O, KH, KW = 6 * group, 3, 3
        x = rng.standard_normal((N, C, H, W)).astype(np.float32)
        w = rng.standard_normal((O, C // group, KH, KW)).astype(np.float32)
        oh = (H + 2 * pad - dil * (KH - 1) - 1) // stride + 1
        ow = (W + 2 * pad - dil * (KW - 1) - 1) // stride + 1
        offset = (rng.standard_normal(
            (N, og * 2 * KH * KW, oh, ow)) * 0.7).astype(np.float32)
        mask = rng.uniform(0.2, 1.0, (N, og * KH * KW, oh, ow)).astype(
            np.float32) if with_mask else None
        bias = rng.standard_normal(O).astype(np.float32) if with_bias else None

        from smelter_tpu.ir.build import GraphBuilder
        import smelter_tpu as st

        g = GraphBuilder("t", opset=19)
        names = [g.input("x", x.shape), g.init(w), g.input("off", offset.shape)]
        names.append(g.init(bias) if with_bias else "")
        if with_mask:
            names.append(g.input("mask", mask.shape))
        out = g.node("DeformConv", names, strides=[stride, stride],
                     pads=[pad, pad, pad, pad], dilations=[dil, dil],
                     group=group, offset_group=og, kernel_shape=[KH, KW])
        m = st.CompiledModel(g.finish([out]))
        args = [x, offset] + ([mask] if with_mask else [])
        got = m(*args)[0]
        want = _deform_conv_ref(x, w, offset, bias, mask,
                                stride, pad, dil, group, og)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_basic(self, rng):
        self._run(rng)

    def test_mask_bias(self, rng):
        self._run(rng, with_mask=True, with_bias=True)

    def test_groups(self, rng):
        self._run(rng, group=2, og=2, stride=2, dil=2)


class TestBitwise:
    def test_and_or_xor_not(self, rng):
        a = rng.integers(0, 255, (4, 5)).astype(np.int32)
        b = rng.integers(0, 255, (4, 5)).astype(np.int32)
        np.testing.assert_array_equal(
            run_op("BitwiseAnd", [a, b], opset=18), a & b)
        np.testing.assert_array_equal(
            run_op("BitwiseOr", [a, b], opset=18), a | b)
        np.testing.assert_array_equal(
            run_op("BitwiseXor", [a, b], opset=18), a ^ b)
        np.testing.assert_array_equal(
            run_op("BitwiseNot", [a], opset=18), ~a)


class TestRandom:
    def test_normal_stats(self):
        got = run_op("RandomNormal", [],
                     dict(shape=[2000], mean=3.0, scale=0.5, seed=1.0))
        assert got.shape == (2000,)
        assert abs(got.mean() - 3.0) < 0.1
        assert abs(got.std() - 0.5) < 0.1

    def test_uniform_range(self):
        got = run_op("RandomUniform", [],
                     dict(shape=[1000], low=-2.0, high=2.0, seed=2.0))
        assert got.min() >= -2.0 and got.max() < 2.0
        assert abs(got.mean()) < 0.3

    def test_like_variants(self, rng):
        x = rng.standard_normal((7, 9)).astype(np.float32)
        got = run_op("RandomNormalLike", [x], dict(seed=1.0))
        assert got.shape == x.shape and got.dtype == np.float32
        got = run_op("RandomUniformLike", [x], dict(seed=1.0, low=5.0, high=6.0))
        assert got.min() >= 5.0 and got.max() < 6.0

    def test_deterministic_per_seed(self, rng):
        a = run_op("RandomNormal", [], dict(shape=[16], seed=1.0))
        b = run_op("RandomNormal", [], dict(shape=[16], seed=1.0))
        c = run_op("RandomNormal", [], dict(shape=[16], seed=3.0))
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)


class TestLosses:
    @pytest.mark.parametrize("reduction", ["none", "sum", "mean"])
    def test_nll_vs_torch(self, rng, reduction):
        N, C, D = 4, 5, 3
        logp = F.log_softmax(torch.from_numpy(
            rng.standard_normal((N, C, D)).astype(np.float32)), dim=1)
        target = rng.integers(0, C, (N, D)).astype(np.int64)
        weight = rng.uniform(0.5, 1.5, C).astype(np.float32)
        got = run_op("NegativeLogLikelihoodLoss", [t2n(logp), target],
                     dict(reduction=reduction), opset=13,
                     initializers=[weight])
        want = t2n(F.nll_loss(logp, torch.from_numpy(target),
                              torch.from_numpy(weight), reduction=reduction))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_nll_ignore_index(self, rng):
        N, C = 6, 4
        logp = F.log_softmax(torch.from_numpy(
            rng.standard_normal((N, C)).astype(np.float32)), dim=1)
        target = rng.integers(0, C, (N,)).astype(np.int64)
        target[1] = 2
        got = run_op("NegativeLogLikelihoodLoss", [t2n(logp), target],
                     dict(reduction="mean", ignore_index=2), opset=13)
        want = t2n(F.nll_loss(logp, torch.from_numpy(target),
                              ignore_index=2, reduction="mean"))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("reduction", ["none", "sum", "mean"])
    def test_sce_vs_torch(self, rng, reduction):
        N, C = 5, 7
        scores = rng.standard_normal((N, C)).astype(np.float32)
        target = rng.integers(0, C, (N,)).astype(np.int64)
        got, logp = run_op("SoftmaxCrossEntropyLoss", [scores, target],
                           dict(reduction=reduction), opset=13, n_outputs=2)
        want = t2n(F.cross_entropy(torch.from_numpy(scores),
                                   torch.from_numpy(target),
                                   reduction=reduction))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            logp, t2n(F.log_softmax(torch.from_numpy(scores), dim=1)),
            rtol=1e-4, atol=1e-4)
