"""ONNX quantized-operator tests (QDQ / QLinear / integer ops) vs numpy
reference math."""

import numpy as np
import pytest

from tests.test_ops_golden import run_op


class TestIntegerOps:
    def test_matmul_integer(self, rng):
        a = rng.integers(-128, 127, (4, 8), dtype=np.int8)
        b = rng.integers(-128, 127, (8, 6), dtype=np.int8)
        got = run_op("MatMulInteger", [a, b], opset=13)
        want = a.astype(np.int32) @ b.astype(np.int32)
        np.testing.assert_array_equal(got, want)

    def test_matmul_integer_zp(self, rng):
        a = rng.integers(0, 255, (3, 5), dtype=np.uint8)
        b = rng.integers(0, 255, (5, 4), dtype=np.uint8)
        got = run_op("MatMulInteger", [a, b], opset=13,
                     initializers=[np.uint8(128), np.uint8(127)])
        want = (a.astype(np.int32) - 128) @ (b.astype(np.int32) - 127)
        np.testing.assert_array_equal(got, want)

    def test_conv_integer(self, rng):
        x = rng.integers(-100, 100, (1, 3, 8, 8), dtype=np.int8)
        w = rng.integers(-100, 100, (4, 3, 3, 3), dtype=np.int8)
        got = run_op("ConvInteger", [x], dict(kernel_shape=[3, 3]),
                     opset=13, initializers=[w])
        import torch
        import torch.nn.functional as F
        want = F.conv2d(torch.from_numpy(x.astype(np.float64)),
                        torch.from_numpy(w.astype(np.float64))).numpy()
        np.testing.assert_array_equal(got, want.astype(np.int32))


class TestQLinear:
    def test_qlinear_matmul_roundtrip(self, rng):
        af = rng.standard_normal((4, 16)).astype(np.float32)
        bf = rng.standard_normal((16, 8)).astype(np.float32)
        a_s, b_s = np.float32(np.abs(af).max() / 127), np.float32(np.abs(bf).max() / 127)
        a_q = np.clip(np.round(af / a_s), -127, 127).astype(np.int8)
        b_q = np.clip(np.round(bf / b_s), -127, 127).astype(np.int8)
        y_s = np.float32(np.abs(af @ bf).max() / 127)
        got = run_op("QLinearMatMul", [a_q], opset=13, initializers=[
            a_s, np.int8(0), b_q, b_s, np.int8(0), y_s, np.int8(0)])
        want_f = (a_q.astype(np.float32) * a_s) @ (b_q.astype(np.float32) * b_s)
        want = np.clip(np.round(want_f / y_s), -128, 127).astype(np.int8)
        np.testing.assert_allclose(got.astype(np.int32), want.astype(np.int32),
                                   atol=1)  # rounding boundary tolerance

    def test_qlinear_conv(self, rng):
        xf = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
        wf = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)
        x_s = np.float32(np.abs(xf).max() / 127)
        w_s = (np.abs(wf).reshape(4, -1).max(1) / 127).astype(np.float32)
        x_q = np.clip(np.round(xf / x_s), -127, 127).astype(np.int8)
        w_q = np.clip(np.round(wf / w_s[:, None, None, None]), -127, 127).astype(np.int8)
        import torch
        import torch.nn.functional as F
        ref_f = F.conv2d(torch.from_numpy(x_q.astype(np.float32) * x_s),
                         torch.from_numpy(w_q.astype(np.float32) * w_s[:, None, None, None])).numpy()
        y_s = np.float32(np.abs(ref_f).max() / 127)
        got = run_op("QLinearConv", [x_q], dict(kernel_shape=[3, 3]), opset=13,
                     initializers=[x_s, np.int8(0), w_q, w_s, np.zeros(4, np.int8),
                                   y_s, np.int8(0)])
        want = np.clip(np.round(ref_f / y_s), -128, 127).astype(np.int8)
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 1  # float rounding at the requant boundary

    def test_qlinear_conv_mixed_output_dtype(self, rng):
        """uint8 activations requantized to int8: output dtype/range must
        follow the y zero-point (inputs[7]), not x's."""
        xf = rng.random((1, 2, 6, 6)).astype(np.float32) * 4  # positive
        wf = rng.standard_normal((3, 2, 3, 3)).astype(np.float32)
        x_s = np.float32(xf.max() / 255)
        x_z = np.uint8(0)
        w_s = np.float32(np.abs(wf).max() / 127)
        x_q = np.clip(np.round(xf / x_s), 0, 255).astype(np.uint8)
        w_q = np.clip(np.round(wf / w_s), -127, 127).astype(np.int8)
        import torch
        import torch.nn.functional as F
        ref_f = F.conv2d(torch.from_numpy(x_q.astype(np.float32) * x_s),
                         torch.from_numpy(w_q.astype(np.float32) * w_s)).numpy()
        y_s = np.float32(np.abs(ref_f).max() / 127)
        got = run_op("QLinearConv", [x_q], dict(kernel_shape=[3, 3]), opset=13,
                     initializers=[x_s, x_z, w_q, w_s, np.int8(0),
                                   y_s, np.int8(0)])
        assert got.dtype == np.int8
        want = np.clip(np.round(ref_f / y_s), -128, 127).astype(np.int8)
        assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1

    def test_dynamic_quantize(self, rng):
        x = rng.standard_normal((3, 7)).astype(np.float32) * 4
        q, s, zp = run_op("DynamicQuantizeLinear", [x], opset=13, n_outputs=3)
        back = (q.astype(np.float32) - zp.astype(np.float32)) * s
        assert np.abs(back - x).max() <= s * 0.51 + 1e-6


class TestNewTensorOps:
    def test_einsum(self, rng):
        a = rng.standard_normal((2, 3, 4)).astype(np.float32)
        b = rng.standard_normal((2, 4, 5)).astype(np.float32)
        got = run_op("Einsum", [a, b], dict(equation="bij,bjk->bik"), opset=13)
        np.testing.assert_allclose(got, np.einsum("bij,bjk->bik", a, b), rtol=1e-4)

    def test_gather_nd(self, rng):
        x = rng.standard_normal((4, 5, 6)).astype(np.float32)
        idx = np.array([[0, 1], [3, 4]], np.int64)
        got = run_op("GatherND", [x, idx], opset=13)
        np.testing.assert_array_equal(got, x[[0, 3], [1, 4]])

    def test_scatter_nd(self, rng):
        x = np.zeros((4, 3), np.float32)
        idx = np.array([[0], [2]], np.int64)
        upd = np.ones((2, 3), np.float32)
        got = run_op("ScatterND", [x, idx, upd], opset=13)
        want = x.copy(); want[[0, 2]] = 1
        np.testing.assert_array_equal(got, want)

    def test_one_hot(self):
        idx = np.array([0, 2, 1], np.int64)
        got = run_op("OneHot", [idx], dict(axis=-1), opset=13,
                     initializers=[np.int64(4), np.array([0.0, 1.0], np.float32)])
        np.testing.assert_array_equal(got, np.eye(4, dtype=np.float32)[idx])

    def test_trilu(self, rng):
        x = rng.standard_normal((4, 4)).astype(np.float32)
        got = run_op("Trilu", [x], dict(upper=1), opset=14)
        np.testing.assert_array_equal(got, np.triu(x))


def _quant_ref(y, s, z, dtype=np.uint8):
    info = np.iinfo(dtype)
    return np.clip(np.round(y / s) + z, info.min, info.max).astype(dtype)


class TestQLinearElementwise:
    """ORT QOperator-format contrib ops: dequant -> op -> requant vs a
    numpy reference with identical rounding."""

    def test_qlinear_add(self, rng):
        a = rng.integers(0, 255, (2, 8), dtype=np.uint8)
        b_ = rng.integers(0, 255, (2, 8), dtype=np.uint8)
        sa, za, sb, zb, sy, zy = 0.02, 120, 0.05, 128, 0.06, 100
        got = run_op("QLinearAdd",
                     [a, np.float32(sa), np.uint8(za),
                      b_, np.float32(sb), np.uint8(zb),
                      np.float32(sy), np.uint8(zy)])
        want = _quant_ref((a.astype(np.float32) - za) * sa
                          + (b_.astype(np.float32) - zb) * sb, sy, zy)
        assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1

    def test_qlinear_mul_int8(self, rng):
        a = rng.integers(-128, 127, (3, 5), dtype=np.int8)
        b_ = rng.integers(-128, 127, (3, 5), dtype=np.int8)
        got = run_op("QLinearMul",
                     [a, np.float32(0.1), np.int8(0),
                      b_, np.float32(0.2), np.int8(3),
                      np.float32(0.5), np.int8(-10)])
        want = _quant_ref((a.astype(np.float32)) * 0.1
                          * (b_.astype(np.float32) - 3) * 0.2,
                          0.5, -10, np.int8)
        assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1

    def test_qlinear_sigmoid(self, rng):
        x = rng.integers(0, 255, (4, 4), dtype=np.uint8)
        got = run_op("QLinearSigmoid",
                     [x, np.float32(0.05), np.uint8(128),
                      np.float32(1 / 256), np.uint8(0)])
        xf = (x.astype(np.float32) - 128) * 0.05
        want = _quant_ref(1 / (1 + np.exp(-xf)), 1 / 256, 0)
        assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1

    def test_qlinear_leaky_relu(self, rng):
        x = rng.integers(-128, 127, (4, 4), dtype=np.int8)
        got = run_op("QLinearLeakyRelu",
                     [x, np.float32(0.1), np.int8(5),
                      np.float32(0.1), np.int8(5)], dict(alpha=0.2))
        xf = (x.astype(np.float32) - 5) * 0.1
        want = _quant_ref(np.where(xf >= 0, xf, 0.2 * xf), 0.1, 5, np.int8)
        assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1

    def test_qlinear_global_average_pool(self, rng):
        x = rng.integers(0, 255, (2, 3, 6, 6), dtype=np.uint8)
        got = run_op("QLinearGlobalAveragePool",
                     [x, np.float32(0.04), np.uint8(130),
                      np.float32(0.04), np.uint8(130)])
        xf = (x.astype(np.float32) - 130) * 0.04
        want = _quant_ref(xf.mean(axis=(2, 3), keepdims=True), 0.04, 130)
        assert got.shape == (2, 3, 1, 1)
        assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1

    def test_qlinear_average_pool(self, rng):
        x = rng.integers(0, 255, (1, 2, 8, 8), dtype=np.uint8)
        got = run_op("QLinearAveragePool",
                     [x, np.float32(0.03), np.uint8(128),
                      np.float32(0.03), np.uint8(128)],
                     dict(kernel_shape=[2, 2], strides=[2, 2]))
        xf = (x.astype(np.float32) - 128) * 0.03
        pooled = xf.reshape(1, 2, 4, 2, 4, 2).mean(axis=(3, 5))
        want = _quant_ref(pooled, 0.03, 128)
        assert got.shape == (1, 2, 4, 4)
        assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1

    def test_qlinear_concat(self, rng):
        a = rng.integers(0, 255, (2, 3), dtype=np.uint8)
        b_ = rng.integers(0, 255, (2, 5), dtype=np.uint8)
        got = run_op("QLinearConcat",
                     [np.float32(0.1), np.uint8(10),
                      a, np.float32(0.1), np.uint8(0),
                      b_, np.float32(0.2), np.uint8(50)], dict(axis=1))
        af = a.astype(np.float32) * 0.1
        bf = (b_.astype(np.float32) - 50) * 0.2
        want = _quant_ref(np.concatenate([af, bf], axis=1), 0.1, 10)
        assert got.shape == (2, 8)
        assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1

    def test_qgemm_quantized_out(self, rng):
        a = rng.integers(-128, 127, (4, 8), dtype=np.int8)
        b_ = rng.integers(-128, 127, (6, 8), dtype=np.int8)  # transB
        bias = rng.integers(-1000, 1000, (6,), dtype=np.int32)
        sa, sb, sy = 0.05, 0.02, 0.3
        got = run_op("QGemm",
                     [a, np.float32(sa), np.int8(0),
                      b_, np.float32(sb), np.int8(0),
                      bias, np.float32(sy), np.int8(0)], dict(transB=1))
        acc = a.astype(np.int32) @ b_.T.astype(np.int32) + bias
        want = _quant_ref(acc.astype(np.float32) * sa * sb, sy, 0, np.int8)
        assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1

    def test_qgemm_float_out(self, rng):
        a = rng.integers(0, 255, (3, 5), dtype=np.uint8)
        b_ = rng.integers(0, 255, (5, 7), dtype=np.uint8)
        got = run_op("QGemm",
                     [a, np.float32(0.1), np.uint8(128),
                      b_, np.float32(0.2), np.uint8(100)])
        want = ((a.astype(np.float32) - 128) * 0.1) @ ((b_.astype(np.float32) - 100) * 0.2)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)
