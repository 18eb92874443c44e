"""Per-op golden tests: single-op ONNX graphs executed by the engine vs
torch functional reference (SURVEY.md §4 differential-testing strategy;
torch stands in for onnxruntime, which is absent from this environment)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import smelter_tpu as st
from smelter_tpu.ir.build import GraphBuilder


def run_op(op_type, inputs, attrs=None, opset=13, n_outputs=1, initializers=None):
    """Build a 1-node graph, run through protobuf roundtrip + engine."""
    b = GraphBuilder("t", opset=opset)
    in_names = []
    for i, arr in enumerate(inputs):
        from smelter_tpu.utils import dtypes as dt
        code = dt.numpy_to_onnx_dtype(arr.dtype)
        in_names.append(b.input(f"in{i}", arr.shape, code))
    for arr in initializers or []:
        in_names.append(b.init(np.asarray(arr)))
    out = b.node(op_type, in_names, outputs=n_outputs, **(attrs or {}))
    outs = [out] if isinstance(out, str) else out
    g = b.finish(outs)
    # Exercise the serialization path every time.
    g = st.import_model(st.export_model(g))
    m = st.CompiledModel(g)
    res = m(*inputs)
    return res[0] if n_outputs == 1 else res


def t2n(t):
    return t.detach().numpy()


RTOL, ATOL = 1e-4, 1e-5


class TestConv:
    @pytest.mark.parametrize("stride,pad,dil", [
        (1, 0, 1), (2, 1, 1), (1, 2, 2), (3, 1, 1),
    ])
    def test_conv2d(self, rng, stride, pad, dil):
        x = rng.standard_normal((2, 3, 13, 15)).astype(np.float32)
        w = rng.standard_normal((8, 3, 3, 3)).astype(np.float32)
        bias = rng.standard_normal(8).astype(np.float32)
        got = run_op("Conv", [x], dict(
            strides=[stride, stride], pads=[pad, pad, pad, pad],
            dilations=[dil, dil], kernel_shape=[3, 3], group=1,
        ), initializers=[w, bias])
        want = t2n(F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                            torch.from_numpy(bias), stride=stride,
                            padding=pad, dilation=dil))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_conv2d_asymmetric_pads(self, rng):
        x = rng.standard_normal((1, 4, 10, 10)).astype(np.float32)
        w = rng.standard_normal((6, 4, 3, 3)).astype(np.float32)
        got = run_op("Conv", [x], dict(pads=[0, 1, 2, 0], kernel_shape=[3, 3]),
                     initializers=[w])
        xp = F.pad(torch.from_numpy(x), (1, 0, 0, 2))  # (wl, wr, ht, hb)
        want = t2n(F.conv2d(xp, torch.from_numpy(w)))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_depthwise(self, rng):
        x = rng.standard_normal((1, 8, 12, 12)).astype(np.float32)
        w = rng.standard_normal((8, 1, 3, 3)).astype(np.float32)
        got = run_op("Conv", [x], dict(group=8, pads=[1, 1, 1, 1], kernel_shape=[3, 3]),
                     initializers=[w])
        want = t2n(F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                            padding=1, groups=8))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_grouped(self, rng):
        x = rng.standard_normal((2, 8, 9, 9)).astype(np.float32)
        w = rng.standard_normal((12, 2, 3, 3)).astype(np.float32)
        got = run_op("Conv", [x], dict(group=4, kernel_shape=[3, 3]),
                     initializers=[w])
        want = t2n(F.conv2d(torch.from_numpy(x), torch.from_numpy(w), groups=4))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_same_upper_autopad(self, rng):
        x = rng.standard_normal((1, 3, 11, 11)).astype(np.float32)
        w = rng.standard_normal((5, 3, 3, 3)).astype(np.float32)
        got = run_op("Conv", [x], dict(auto_pad="SAME_UPPER", strides=[2, 2],
                                       kernel_shape=[3, 3]), initializers=[w])
        assert got.shape == (1, 5, 6, 6)  # ceil(11/2)
        # total pad = (6-1)*2 + 3 - 11 = 2 -> (1, 1) each spatial dim
        xp = F.pad(torch.from_numpy(x), (1, 1, 1, 1))
        want = t2n(F.conv2d(xp, torch.from_numpy(w), stride=2))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_conv1d(self, rng):
        x = rng.standard_normal((2, 3, 20)).astype(np.float32)
        w = rng.standard_normal((4, 3, 5)).astype(np.float32)
        got = run_op("Conv", [x], dict(pads=[2, 2], kernel_shape=[5]),
                     initializers=[w])
        want = t2n(F.conv1d(torch.from_numpy(x), torch.from_numpy(w), padding=2))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


class TestConvTranspose:
    @pytest.mark.parametrize("stride,pad,outpad", [
        (1, 0, 0), (2, 1, 0), (2, 1, 1), (3, 0, 2),
    ])
    def test_basic(self, rng, stride, pad, outpad):
        x = rng.standard_normal((1, 4, 7, 7)).astype(np.float32)
        w = rng.standard_normal((4, 6, 3, 3)).astype(np.float32)  # (Cin, Cout, k, k)
        got = run_op("ConvTranspose", [x], dict(
            strides=[stride, stride], pads=[pad] * 4,
            output_padding=[outpad, outpad], kernel_shape=[3, 3],
        ), initializers=[w])
        want = t2n(F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                                      stride=stride, padding=pad,
                                      output_padding=outpad))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=1e-4)

    def test_grouped(self, rng):
        x = rng.standard_normal((1, 4, 5, 5)).astype(np.float32)
        w = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)  # g=2: (Cin, Cout/g, ...)
        got = run_op("ConvTranspose", [x], dict(group=2, strides=[2, 2],
                                                kernel_shape=[3, 3]),
                     initializers=[w])
        want = t2n(F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                                      stride=2, groups=2))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=1e-4)


class TestGemmMatMul:
    def test_gemm_transb(self, rng):
        a = rng.standard_normal((4, 16)).astype(np.float32)
        w = rng.standard_normal((8, 16)).astype(np.float32)
        bias = rng.standard_normal(8).astype(np.float32)
        got = run_op("Gemm", [a], dict(transB=1, alpha=1.0, beta=1.0),
                     initializers=[w, bias])
        want = t2n(F.linear(torch.from_numpy(a), torch.from_numpy(w),
                            torch.from_numpy(bias)))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=1e-4)

    def test_gemm_alpha_beta(self, rng):
        a = rng.standard_normal((3, 5)).astype(np.float32)
        bm = rng.standard_normal((5, 7)).astype(np.float32)
        c = rng.standard_normal((3, 7)).astype(np.float32)
        got = run_op("Gemm", [a], dict(alpha=0.5, beta=2.0), initializers=[bm, c])
        want = 0.5 * (a @ bm) + 2.0 * c
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=1e-4)

    def test_matmul_batched(self, rng):
        a = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
        bm = rng.standard_normal((2, 3, 5, 6)).astype(np.float32)
        got = run_op("MatMul", [a, bm])
        np.testing.assert_allclose(got, a @ bm, rtol=RTOL, atol=1e-4)


class TestPool:
    @pytest.mark.parametrize("k,s,pad,ceil", [
        (2, 2, 0, 0), (3, 2, 1, 0), (3, 2, 1, 1), (3, 3, 0, 1),
    ])
    def test_maxpool(self, rng, k, s, pad, ceil):
        x = rng.standard_normal((2, 4, 13, 13)).astype(np.float32)
        got = run_op("MaxPool", [x], dict(kernel_shape=[k, k], strides=[s, s],
                                          pads=[pad] * 4, ceil_mode=ceil))
        want = t2n(F.max_pool2d(torch.from_numpy(x), k, s, pad,
                                ceil_mode=bool(ceil)))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    @pytest.mark.parametrize("count_include_pad", [0, 1])
    def test_avgpool(self, rng, count_include_pad):
        x = rng.standard_normal((1, 3, 12, 12)).astype(np.float32)
        got = run_op("AveragePool", [x], dict(kernel_shape=[3, 3], strides=[2, 2],
                                              pads=[1, 1, 1, 1],
                                              count_include_pad=count_include_pad))
        want = t2n(F.avg_pool2d(torch.from_numpy(x), 3, 2, 1,
                                count_include_pad=bool(count_include_pad)))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_avgpool_ceil(self, rng):
        x = rng.standard_normal((1, 2, 11, 11)).astype(np.float32)
        got = run_op("AveragePool", [x], dict(kernel_shape=[3, 3], strides=[2, 2],
                                              ceil_mode=1))
        want = t2n(F.avg_pool2d(torch.from_numpy(x), 3, 2, 0, ceil_mode=True))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_global_avg(self, rng):
        x = rng.standard_normal((2, 5, 9, 9)).astype(np.float32)
        got = run_op("GlobalAveragePool", [x])
        want = x.mean(axis=(2, 3), keepdims=True)
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


class TestNorm:
    def test_batchnorm(self, rng):
        x = rng.standard_normal((2, 6, 8, 8)).astype(np.float32)
        scale = rng.standard_normal(6).astype(np.float32)
        bias = rng.standard_normal(6).astype(np.float32)
        mean = rng.standard_normal(6).astype(np.float32)
        var = rng.random(6).astype(np.float32) + 0.1
        got = run_op("BatchNormalization", [x], dict(epsilon=1e-5),
                     initializers=[scale, bias, mean, var])
        want = t2n(F.batch_norm(torch.from_numpy(x), torch.from_numpy(mean),
                                torch.from_numpy(var), torch.from_numpy(scale),
                                torch.from_numpy(bias), eps=1e-5))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_instancenorm(self, rng):
        x = rng.standard_normal((2, 4, 6, 6)).astype(np.float32)
        scale = rng.standard_normal(4).astype(np.float32)
        bias = rng.standard_normal(4).astype(np.float32)
        got = run_op("InstanceNormalization", [x], dict(epsilon=1e-5),
                     initializers=[scale, bias])
        want = t2n(F.instance_norm(torch.from_numpy(x),
                                   weight=torch.from_numpy(scale),
                                   bias=torch.from_numpy(bias), eps=1e-5))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_custom_group_norm(self, rng):
        """The reference's custom op: inputs [x, groups, gamma, beta]
        (Converters.swift:1272-1300)."""
        x = rng.standard_normal((2, 8, 5, 5)).astype(np.float32)
        gamma = rng.standard_normal(8).astype(np.float32)
        beta = rng.standard_normal(8).astype(np.float32)
        got = run_op("custom_group_norm", [x],
                     initializers=[np.array([4], np.int64), gamma, beta])
        want = t2n(F.group_norm(torch.from_numpy(x), 4, torch.from_numpy(gamma),
                                torch.from_numpy(beta), eps=1e-5))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_layernorm(self, rng):
        x = rng.standard_normal((2, 7, 16)).astype(np.float32)
        scale = rng.standard_normal(16).astype(np.float32)
        bias = rng.standard_normal(16).astype(np.float32)
        got = run_op("LayerNormalization", [x], dict(axis=-1, epsilon=1e-5),
                     opset=17, initializers=[scale, bias])
        want = t2n(F.layer_norm(torch.from_numpy(x), (16,),
                                torch.from_numpy(scale), torch.from_numpy(bias)))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestActivations:
    CASES = [
        ("Relu", {}, lambda t: F.relu(t)),
        ("Sigmoid", {}, torch.sigmoid),
        ("Tanh", {}, torch.tanh),
        ("Elu", dict(alpha=0.7), lambda t: F.elu(t, alpha=0.7)),
        ("LeakyRelu", dict(alpha=0.1), lambda t: F.leaky_relu(t, 0.1)),
        ("Softplus", {}, F.softplus),
        ("Softsign", {}, F.softsign),
        ("HardSigmoid", dict(alpha=1 / 6, beta=0.5), F.hardsigmoid),
        ("Exp", {}, torch.exp),
        ("Abs", {}, torch.abs),
        ("Neg", {}, torch.neg),
        ("Sqrt", {}, lambda t: torch.sqrt(torch.abs(t) + 1)),
        ("Erf", {}, torch.erf),
        ("Mish", {}, F.mish),
        ("Selu", {}, F.selu),
    ]

    @pytest.mark.parametrize("op,attrs,ref", CASES, ids=[c[0] for c in CASES])
    def test_unary(self, rng, op, attrs, ref):
        x = rng.standard_normal((3, 17)).astype(np.float32)
        if op == "Sqrt":
            x = np.abs(x) + 1
            ref = torch.sqrt
        got = run_op(op, [x], attrs)
        np.testing.assert_allclose(got, t2n(ref(torch.from_numpy(x))),
                                   rtol=1e-4, atol=1e-5)

    def test_prelu_per_channel(self, rng):
        x = rng.standard_normal((2, 4, 5, 5)).astype(np.float32)
        slope = rng.random(4).astype(np.float32)
        got = run_op("PRelu", [x], initializers=[slope.reshape(4, 1, 1)])
        want = t2n(F.prelu(torch.from_numpy(x), torch.from_numpy(slope)))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_clip_opset11(self, rng):
        x = rng.standard_normal((4, 4)).astype(np.float32) * 3
        got = run_op("Clip", [x], initializers=[np.float32(0), np.float32(6)],
                     opset=13)
        np.testing.assert_allclose(got, np.clip(x, 0, 6))

    def test_softmax_axis1_opset9(self, rng):
        x = rng.standard_normal((2, 5, 3)).astype(np.float32)
        got = run_op("Softmax", [x], dict(axis=1), opset=9)
        # opset<13 semantics: softmax over flattened trailing dims
        flat = x.reshape(2, 15)
        want = t2n(F.softmax(torch.from_numpy(flat), dim=1)).reshape(2, 5, 3)
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_softmax_opset13(self, rng):
        x = rng.standard_normal((2, 5, 3)).astype(np.float32)
        got = run_op("Softmax", [x], dict(axis=1), opset=13)
        want = t2n(F.softmax(torch.from_numpy(x), dim=1))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_logsoftmax_opset13(self, rng):
        x = rng.standard_normal((4, 10)).astype(np.float32)
        got = run_op("LogSoftmax", [x], dict(axis=-1), opset=13)
        want = t2n(F.log_softmax(torch.from_numpy(x), dim=-1))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


class TestResize:
    def test_upsample_nearest(self, rng):
        x = rng.standard_normal((1, 2, 4, 4)).astype(np.float32)
        got = run_op("Upsample", [x], dict(mode="nearest", scales=[1.0, 1.0, 2.0, 2.0]),
                     opset=7)
        want = t2n(F.interpolate(torch.from_numpy(x), scale_factor=2, mode="nearest"))
        np.testing.assert_allclose(got, want)

    def test_upsample_bilinear_align(self, rng):
        x = rng.standard_normal((1, 3, 5, 5)).astype(np.float32)
        got = run_op("Upsample", [x], dict(mode="linear", scales=[1.0, 1.0, 2.0, 2.0]),
                     opset=7)
        want = t2n(F.interpolate(torch.from_numpy(x), scale_factor=2,
                                 mode="bilinear", align_corners=True))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=1e-5)

    def test_resize_linear_half_pixel(self, rng):
        x = rng.standard_normal((1, 2, 6, 6)).astype(np.float32)
        got = run_op("Resize", [x], dict(
            mode="linear", coordinate_transformation_mode="half_pixel"),
            opset=13,
            initializers=[np.array([], np.float32),
                          np.array([1, 1, 2, 2], np.float32)])
        want = t2n(F.interpolate(torch.from_numpy(x), scale_factor=2,
                                 mode="bilinear", align_corners=False))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=1e-5)

    def test_resize_sizes_nearest(self, rng):
        x = rng.standard_normal((1, 2, 5, 7)).astype(np.float32)
        got = run_op("Resize", [x], dict(
            mode="nearest", coordinate_transformation_mode="asymmetric",
            nearest_mode="floor"),
            opset=13,
            initializers=[np.array([], np.float32), np.array([], np.float32),
                          np.array([1, 2, 10, 14], np.int64)])
        want = t2n(F.interpolate(torch.from_numpy(x), size=(10, 14), mode="nearest"))
        np.testing.assert_allclose(got, want)


class TestTensorOps:
    def test_concat_3way(self, rng):
        xs = [rng.standard_normal((1, c, 4, 4)).astype(np.float32) for c in (2, 3, 5)]
        got = run_op("Concat", xs, dict(axis=1))
        np.testing.assert_allclose(got, np.concatenate(xs, axis=1))

    def test_reshape_zero_and_minus1(self, rng):
        x = rng.standard_normal((2, 3, 4)).astype(np.float32)
        got = run_op("Reshape", [x], initializers=[np.array([0, -1], np.int64)])
        np.testing.assert_allclose(got, x.reshape(2, 12))

    def test_flatten_axis2(self, rng):
        x = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
        got = run_op("Flatten", [x], dict(axis=2))
        np.testing.assert_allclose(got, x.reshape(6, 20))

    def test_pad_modes(self, rng):
        x = rng.standard_normal((1, 2, 4, 4)).astype(np.float32)
        for mode, tmode in [("constant", "constant"), ("reflect", "reflect"),
                            ("edge", "replicate")]:
            got = run_op("Pad", [x], dict(mode=mode), opset=13,
                         initializers=[np.array([0, 0, 1, 1, 0, 0, 1, 1], np.int64)])
            want = t2n(F.pad(torch.from_numpy(x), (1, 1, 1, 1), mode=tmode))
            np.testing.assert_allclose(got, want, err_msg=mode)

    def test_slice_with_steps(self, rng):
        x = rng.standard_normal((4, 10, 8)).astype(np.float32)
        got = run_op("Slice", [x], opset=13, initializers=[
            np.array([1, 0], np.int64), np.array([9, 8], np.int64),
            np.array([1, 2], np.int64), np.array([2, 1], np.int64)])
        np.testing.assert_allclose(got, x[:, 1:9:2, 0:8])

    def test_transpose(self, rng):
        x = rng.standard_normal((2, 3, 4)).astype(np.float32)
        got = run_op("Transpose", [x], dict(perm=[2, 0, 1]))
        np.testing.assert_allclose(got, x.transpose(2, 0, 1))

    def test_split_sizes(self, rng):
        x = rng.standard_normal((2, 10)).astype(np.float32)
        got = run_op("Split", [x], dict(axis=1), opset=13, n_outputs=2,
                     initializers=[np.array([3, 7], np.int64)])
        np.testing.assert_allclose(got[0], x[:, :3])
        np.testing.assert_allclose(got[1], x[:, 3:])

    def test_gather_dynamic(self, rng):
        x = rng.standard_normal((5, 4)).astype(np.float32)
        idx = np.array([0, 2, 4], np.int64)
        got = run_op("Gather", [x, idx], dict(axis=0))
        np.testing.assert_allclose(got, x[[0, 2, 4]])

    def test_shape_reshape_chain(self, rng):
        """Shape -> Reshape chain resolves statically (ONNX export idiom)."""
        b = GraphBuilder("chain", opset=13)
        x = b.input("x", (2, 3, 4))
        shp = b.node("Shape", [x])
        flat_spec = b.init(np.array([0, -1], np.int64))
        y = b.node("Reshape", [x, flat_spec])
        z = b.node("Gather", [shp, b.init(np.array(0, np.int64))], axis=0)
        g = b.finish([y])
        m = st.CompiledModel(g)
        out = m(rng.standard_normal((2, 3, 4)).astype(np.float32))
        assert out[0].shape == (2, 12)

    def test_depth_to_space_dcr(self, rng):
        x = rng.standard_normal((1, 8, 3, 3)).astype(np.float32)
        got = run_op("DepthToSpace", [x], dict(blocksize=2, mode="DCR"))
        want = t2n(F.pixel_shuffle(torch.from_numpy(x), 2))
        # torch pixel_shuffle implements CRD ordering; DCR differs. Compare
        # against the ONNX-spec reference implementation instead.
        n, c, h, w = x.shape
        ref = x.reshape(n, 2, 2, c // 4, h, w).transpose(0, 3, 4, 1, 5, 2)
        ref = ref.reshape(n, c // 4, h * 2, w * 2)
        np.testing.assert_allclose(got, ref)

    def test_depth_to_space_crd_matches_pixel_shuffle(self, rng):
        x = rng.standard_normal((1, 8, 3, 3)).astype(np.float32)
        got = run_op("DepthToSpace", [x], dict(blocksize=2, mode="CRD"))
        want = t2n(F.pixel_shuffle(torch.from_numpy(x), 2))
        np.testing.assert_allclose(got, want)

    def test_expand(self, rng):
        x = rng.standard_normal((3, 1)).astype(np.float32)
        got = run_op("Expand", [x], initializers=[np.array([2, 3, 4], np.int64)])
        np.testing.assert_allclose(got, np.broadcast_to(x, (2, 3, 4)))

    def test_cast(self, rng):
        from smelter_tpu.utils import dtypes as dt
        x = (rng.standard_normal((3, 3)) * 10).astype(np.float32)
        got = run_op("Cast", [x], dict(to=dt.INT32))
        assert got.dtype == np.int32
        np.testing.assert_array_equal(got, x.astype(np.int32))


class TestReduce:
    def test_reduce_mean_axes_attr(self, rng):
        x = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
        got = run_op("ReduceMean", [x], dict(axes=[2, 3], keepdims=1), opset=13)
        np.testing.assert_allclose(got, x.mean(axis=(2, 3), keepdims=True),
                                   rtol=RTOL, atol=ATOL)

    def test_reduce_sum_axes_input_opset13(self, rng):
        x = rng.standard_normal((2, 3, 4)).astype(np.float32)
        got = run_op("ReduceSum", [x], dict(keepdims=0), opset=13,
                     initializers=[np.array([1], np.int64)])
        np.testing.assert_allclose(got, x.sum(axis=1), rtol=RTOL, atol=1e-4)

    def test_argmax(self, rng):
        x = rng.standard_normal((4, 10)).astype(np.float32)
        got = run_op("ArgMax", [x], dict(axis=1, keepdims=0))
        np.testing.assert_array_equal(got, x.argmax(axis=1))

    def test_topk(self, rng):
        x = rng.standard_normal((3, 20)).astype(np.float32)
        vals, idx = run_op("TopK", [x], dict(axis=-1), opset=13, n_outputs=2,
                           initializers=[np.array([5], np.int64)])
        tv, ti = torch.topk(torch.from_numpy(x), 5, dim=-1)
        np.testing.assert_allclose(vals, t2n(tv), rtol=RTOL, atol=ATOL)
        np.testing.assert_array_equal(idx, t2n(ti))


class TestBinary:
    @pytest.mark.parametrize("op,fn", [
        ("Add", np.add), ("Sub", np.subtract), ("Mul", np.multiply),
        ("Div", np.divide), ("Pow", np.power),
    ])
    def test_broadcast(self, rng, op, fn):
        a = rng.random((2, 3, 4)).astype(np.float32) + 1
        b_ = rng.random((3, 1)).astype(np.float32) + 1
        got = run_op(op, [a, b_])
        np.testing.assert_allclose(got, fn(a, b_), rtol=RTOL, atol=ATOL)

    def test_where(self, rng):
        c = rng.random((3, 4)) > 0.5
        a = rng.standard_normal((3, 4)).astype(np.float32)
        b_ = rng.standard_normal((3, 4)).astype(np.float32)
        got = run_op("Where", [c, a, b_], opset=13)
        np.testing.assert_allclose(got, np.where(c, a, b_))


class TestResizeCubic:
    def test_cubic_half_pixel_vs_torch(self, rng):
        x = rng.standard_normal((1, 2, 7, 7)).astype(np.float32)
        got = run_op("Resize", [x], dict(
            mode="cubic", coordinate_transformation_mode="half_pixel"),
            opset=13,
            initializers=[np.array([], np.float32),
                          np.array([1, 1, 2, 2], np.float32)])
        want = t2n(F.interpolate(torch.from_numpy(x), scale_factor=2,
                                 mode="bicubic", align_corners=False))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_cubic_align_corners(self, rng):
        x = rng.standard_normal((1, 1, 6, 6)).astype(np.float32)
        got = run_op("Resize", [x], dict(
            mode="cubic", coordinate_transformation_mode="align_corners"),
            opset=13,
            initializers=[np.array([], np.float32),
                          np.array([1, 1, 2, 2], np.float32)])
        want = t2n(F.interpolate(torch.from_numpy(x), scale_factor=2,
                                 mode="bicubic", align_corners=True))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestGridSample:
    @pytest.mark.parametrize("mode,align", [("bilinear", 0), ("bilinear", 1),
                                            ("nearest", 1)])
    def test_vs_torch(self, rng, mode, align):
        x = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
        grid = (rng.random((2, 5, 6, 2)).astype(np.float32) * 2 - 1)
        got = run_op("GridSample", [x, grid], dict(
            mode=mode, align_corners=align, padding_mode="zeros"), opset=16)
        want = t2n(F.grid_sample(torch.from_numpy(x), torch.from_numpy(grid),
                                 mode=mode, align_corners=bool(align),
                                 padding_mode="zeros"))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_out_of_bounds_zeros(self, rng):
        x = rng.standard_normal((1, 2, 4, 4)).astype(np.float32)
        grid = np.full((1, 2, 2, 2), 3.0, np.float32)  # far outside
        got = run_op("GridSample", [x, grid], dict(
            mode="bilinear", align_corners=1, padding_mode="zeros"), opset=16)
        np.testing.assert_allclose(got, 0.0)

    @pytest.mark.parametrize("pad,align", [("border", 0), ("border", 1),
                                           ("reflection", 0),
                                           ("reflection", 1)])
    def test_padding_modes_out_of_range(self, rng, pad, align):
        """Coordinates well outside [-1,1] exercise border clamping and
        multi-fold reflection."""
        x = rng.standard_normal((2, 3, 7, 5)).astype(np.float32)
        grid = (rng.random((2, 4, 4, 2)).astype(np.float32) * 6 - 3)
        got = run_op("GridSample", [x, grid], dict(
            mode="bilinear", align_corners=align, padding_mode=pad), opset=16)
        want = t2n(F.grid_sample(torch.from_numpy(x), torch.from_numpy(grid),
                                 mode="bilinear", align_corners=bool(align),
                                 padding_mode=pad))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestConvTransposeOutputShape:
    def test_even_split_matches_torch(self, rng):
        """output_shape that implies symmetric pads == torch padding=1."""
        x = rng.standard_normal((2, 4, 5, 5)).astype(np.float32)
        w = rng.standard_normal((4, 6, 3, 3)).astype(np.float32)
        got = run_op("ConvTranspose", [x], dict(
            strides=[2, 2], kernel_shape=[3, 3], output_shape=[9, 9]),
            initializers=[w])
        want = t2n(F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                                      stride=2, padding=1))
        assert got.shape[2:] == (9, 9)
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    @pytest.mark.parametrize("auto_pad,pads", [
        ("NOTSET", [1, 1, 0, 0]),        # odd total: extra pad at start
        ("SAME_UPPER", [0, 0, 1, 1]),    # extra pad at end
    ])
    def test_odd_split_direction(self, rng, auto_pad, pads):
        """Odd total padding: output_shape semantics must match the
        equivalent explicit-pads ConvTranspose (ONNX split rule)."""
        x = rng.standard_normal((1, 3, 5, 5)).astype(np.float32)
        w = rng.standard_normal((3, 4, 3, 3)).astype(np.float32)
        attrs = dict(strides=[2, 2], kernel_shape=[3, 3], output_shape=[10, 10])
        if auto_pad != "NOTSET":
            attrs["auto_pad"] = auto_pad
        got = run_op("ConvTranspose", [x], attrs, initializers=[w])
        assert got.shape[2:] == (10, 10)
        want = run_op("ConvTranspose", [x], dict(
            strides=[2, 2], kernel_shape=[3, 3], pads=pads), initializers=[w])
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


class TestMaxPoolIndices:
    @pytest.mark.parametrize("k,s,pad", [(2, 2, 0), (3, 2, 1), (3, 1, 0)])
    def test_vs_torch(self, rng, k, s, pad):
        x = rng.standard_normal((2, 3, 9, 11)).astype(np.float32)
        y, idx = run_op("MaxPool", [x], dict(
            kernel_shape=[k, k], strides=[s, s], pads=[pad] * 4),
            n_outputs=2)
        want, widx = F.max_pool2d(torch.from_numpy(x), k, stride=s,
                                  padding=pad, return_indices=True)
        np.testing.assert_allclose(y, t2n(want), rtol=RTOL, atol=ATOL)
        # torch indices are per-(N,C)-plane; ONNX flattens the whole tensor
        N, C, H, W = x.shape
        off = (np.arange(N)[:, None, None, None] * C
               + np.arange(C)[None, :, None, None]) * (H * W)
        np.testing.assert_array_equal(np.asarray(idx), t2n(widx) + off)

    def test_layout_pass_keeps_nchw(self, rng):
        """The NHWC layout pass must not convert an indices-producing
        MaxPool (flat indices are NCHW offsets)."""
        from smelter_tpu.passes.pass_manager import run_passes

        b = GraphBuilder("mpidx", opset=13)
        x = b.input("x", (1, 3, 8, 8))
        h = b.conv(x, np.random.default_rng(0).standard_normal(
            (8, 3, 3, 3)).astype(np.float32), pads=(1, 1, 1, 1))
        outs = b.node("MaxPool", [h], outputs=2, kernel_shape=[2, 2],
                      strides=[2, 2])
        g = b.finish(list(outs))
        xin = np.random.default_rng(1).standard_normal((1, 3, 8, 8)).astype(np.float32)
        before = st.CompiledModel(g)(xin)
        run_passes(g, ["layout_nhwc", "dce"])
        after = st.CompiledModel(g)(xin)
        np.testing.assert_allclose(after[0], before[0], rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(after[1], before[1])


class TestResizeCropAndResize:
    def test_exact_integer_crop(self, rng):
        """roi (0.25,0.75) on a 9-wide axis lands on integer coordinates:
        result equals the plain slice."""
        x = rng.standard_normal((1, 2, 9, 9)).astype(np.float32)
        roi = np.array([0, 0, 0.25, 0.25, 1, 1, 0.75, 0.75], np.float32)
        sizes = np.array([1, 2, 5, 5], np.int64)
        got = run_op("Resize", [x], dict(
            mode="linear", coordinate_transformation_mode="tf_crop_and_resize"),
            opset=13,
            initializers=[roi, np.array([], np.float32), sizes])
        np.testing.assert_allclose(got, x[:, :, 2:7, 2:7], rtol=1e-5, atol=1e-6)

    def test_extrapolation_value(self, rng):
        """roi extending past the image fills with extrapolation_value."""
        x = rng.standard_normal((1, 1, 5, 5)).astype(np.float32)
        roi = np.array([0, 0, 0.5, 0.0, 1, 1, 1.5, 1.0], np.float32)
        sizes = np.array([1, 1, 5, 5], np.int64)
        got = run_op("Resize", [x], dict(
            mode="nearest", coordinate_transformation_mode="tf_crop_and_resize",
            extrapolation_value=-7.0),
            opset=13,
            initializers=[roi, np.array([], np.float32), sizes])
        # rows whose source coordinate exceeds H-1 must be the fill value
        assert (np.asarray(got)[0, 0, -2:] == -7.0).all()
        assert not (np.asarray(got)[0, 0, 0] == -7.0).any()


class TestNegativeIndices:
    def test_gather_negative(self, rng):
        x = rng.standard_normal((5, 4)).astype(np.float32)
        idx = np.array([-1, 0, -5], np.int64)
        got = run_op("Gather", [x, idx], dict(axis=0))
        np.testing.assert_allclose(got, x[[-1, 0, -5]])

    def test_gather_elements_negative(self, rng):
        x = rng.standard_normal((3, 4)).astype(np.float32)
        idx = np.array([[-1, 0, -2, 1]] * 3, np.int64)
        got = run_op("GatherElements", [x, idx], dict(axis=1), opset=13)
        want = np.take_along_axis(x, idx % 4, axis=1)
        np.testing.assert_allclose(got, want)


class TestLRN:
    def test_vs_torch(self, rng):
        x = rng.standard_normal((2, 8, 6, 6)).astype(np.float32)
        got = run_op("LRN", [x], dict(size=5, alpha=1e-3, beta=0.75, bias=1.5))
        want = t2n(torch.nn.functional.local_response_norm(
            torch.from_numpy(x), 5, alpha=1e-3, beta=0.75, k=1.5))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestOpsetVariants:
    def test_squeeze_axes_attr_opset11(self, rng):
        x = rng.standard_normal((1, 3, 1, 4)).astype(np.float32)
        got = run_op("Squeeze", [x], dict(axes=[0, 2]), opset=11)
        assert got.shape == (3, 4)

    def test_unsqueeze_axes_attr_opset11(self, rng):
        x = rng.standard_normal((3, 4)).astype(np.float32)
        got = run_op("Unsqueeze", [x], dict(axes=[0, 3]), opset=11)
        assert got.shape == (1, 3, 4, 1)

    def test_pad_attrs_opset2(self, rng):
        x = rng.standard_normal((1, 2, 4, 4)).astype(np.float32)
        got = run_op("Pad", [x], dict(pads=[0, 0, 1, 1, 0, 0, 1, 1], value=0.0),
                     opset=10)
        assert got.shape == (1, 2, 6, 6)

    def test_split_attr_opset11(self, rng):
        x = rng.standard_normal((2, 9)).astype(np.float32)
        a, bvals = run_op("Split", [x], dict(axis=1, split=[4, 5]), opset=11,
                          n_outputs=2)
        assert a.shape == (2, 4) and bvals.shape == (2, 5)


class TestMiscUnary:
    CASES = [
        ("Celu", dict(alpha=0.8), lambda t: F.celu(t, alpha=0.8)),
        ("ThresholdedRelu", dict(alpha=0.5), lambda t: F.threshold(t, 0.5, 0.0)),
        ("Shrink", dict(lambd=0.4, bias=0.1),
         lambda t: torch.where(t < -0.4, t + 0.1,
                               torch.where(t > 0.4, t - 0.1,
                                           torch.zeros_like(t)))),
        ("Atan", {}, torch.atan),
        ("Tan", {}, torch.tan),
        ("Sinh", {}, torch.sinh),
        ("Cosh", {}, torch.cosh),
        ("Asinh", {}, torch.asinh),
    ]

    @pytest.mark.parametrize("op,attrs,ref", CASES, ids=[c[0] for c in CASES])
    def test_vs_torch(self, rng, op, attrs, ref):
        x = rng.standard_normal((3, 11)).astype(np.float32)
        got = run_op(op, [x], attrs, opset=13)
        np.testing.assert_allclose(got, t2n(ref(torch.from_numpy(x))),
                                   rtol=1e-4, atol=1e-5)

    def test_asin_acos_atanh_domain(self, rng):
        x = (rng.random((3, 7)).astype(np.float32) * 1.8 - 0.9)
        for op, ref in [("Asin", torch.asin), ("Acos", torch.acos),
                        ("Atanh", torch.atanh)]:
            got = run_op(op, [x], opset=13)
            np.testing.assert_allclose(got, t2n(ref(torch.from_numpy(x))),
                                       rtol=1e-4, atol=1e-5)

    def test_isnan_isinf(self):
        x = np.array([1.0, np.nan, np.inf, -np.inf, 0.0], np.float32)
        assert list(run_op("IsNaN", [x], opset=13)) == [False, True, False, False, False]
        assert list(run_op("IsInf", [x], opset=13)) == [False, False, True, True, False]
        only_pos = run_op("IsInf", [x], dict(detect_negative=0), opset=13)
        assert list(only_pos) == [False, False, True, False, False]


class TestRankGenerality:
    def test_conv3d(self, rng):
        x = rng.standard_normal((1, 2, 6, 7, 8)).astype(np.float32)
        w = rng.standard_normal((4, 2, 3, 3, 3)).astype(np.float32)
        got = run_op("Conv", [x], dict(pads=[1, 1, 1, 1, 1, 1],
                                       kernel_shape=[3, 3, 3]),
                     initializers=[w])
        want = t2n(F.conv3d(torch.from_numpy(x), torch.from_numpy(w), padding=1))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_maxpool3d(self, rng):
        x = rng.standard_normal((1, 2, 6, 6, 6)).astype(np.float32)
        got = run_op("MaxPool", [x], dict(kernel_shape=[2, 2, 2],
                                          strides=[2, 2, 2]))
        want = t2n(F.max_pool3d(torch.from_numpy(x), 2, 2))
        np.testing.assert_allclose(got, want)

    def test_avgpool1d(self, rng):
        x = rng.standard_normal((2, 3, 16)).astype(np.float32)
        got = run_op("AveragePool", [x], dict(kernel_shape=[4], strides=[2],
                                              pads=[1, 1]))
        want = t2n(F.avg_pool1d(torch.from_numpy(x), 4, 2, 1,
                                count_include_pad=False))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_conv_transpose1d(self, rng):
        x = rng.standard_normal((1, 3, 10)).astype(np.float32)
        w = rng.standard_normal((3, 5, 4)).astype(np.float32)
        got = run_op("ConvTranspose", [x], dict(strides=[2], kernel_shape=[4]),
                     initializers=[w])
        want = t2n(F.conv_transpose1d(torch.from_numpy(x), torch.from_numpy(w),
                                      stride=2))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_instancenorm3d(self, rng):
        x = rng.standard_normal((2, 3, 4, 5, 6)).astype(np.float32)
        scale = rng.standard_normal(3).astype(np.float32)
        bias = rng.standard_normal(3).astype(np.float32)
        got = run_op("InstanceNormalization", [x], dict(epsilon=1e-5),
                     initializers=[scale, bias])
        want = t2n(F.instance_norm(torch.from_numpy(x),
                                   weight=torch.from_numpy(scale),
                                   bias=torch.from_numpy(bias), eps=1e-5))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestReduceLogSum:
    def test_axes_attr(self, rng):
        x = (np.abs(rng.standard_normal((2, 3, 4))) + 0.1).astype(np.float32)
        got = run_op("ReduceLogSum", [x], dict(axes=[1], keepdims=1), opset=13)
        np.testing.assert_allclose(
            got, np.log(x.sum(axis=1, keepdims=True)), rtol=1e-5, atol=1e-6)


class TestScatterDeprecated:
    def test_matches_torch_scatter(self, rng):
        x = rng.standard_normal((4, 5)).astype(np.float32)
        idx = rng.integers(0, 4, (2, 5)).astype(np.int64)
        upd = rng.standard_normal((2, 5)).astype(np.float32)
        got = run_op("Scatter", [x, idx, upd], dict(axis=0), opset=9)
        want = torch.from_numpy(x.copy()).scatter(
            0, torch.from_numpy(idx), torch.from_numpy(upd))
        np.testing.assert_allclose(got, t2n(want), rtol=1e-6, atol=1e-7)


class TestMaxUnpool:
    @pytest.mark.parametrize("k,s,with_shape", [(2, 2, False), (2, 2, True),
                                                (3, 2, True)])
    def test_roundtrip_vs_torch(self, rng, k, s, with_shape):
        x = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
        b = GraphBuilder("unpool", opset=13)
        xi = b.input("x", x.shape)
        y, idx = b.node("MaxPool", [xi], outputs=2,
                        kernel_shape=[k, k], strides=[s, s])
        ins = [y, idx]
        if with_shape:
            ins.append(b.init(np.array([2, 3, 8, 8], np.int64)))
        out = b.node("MaxUnpool", ins, kernel_shape=[k, k], strides=[s, s])
        g = b.finish([out])
        got = st.CompiledModel(g)(x)[0]
        ty, tidx = F.max_pool2d(torch.from_numpy(x), k, s,
                                return_indices=True)
        want = F.max_unpool2d(ty, tidx, k, s,
                              output_size=(8, 8) if with_shape else None)
        np.testing.assert_allclose(got, t2n(want), rtol=1e-6, atol=1e-7)

    def test_odd_output_shape_pads_unindexed_edge(self, rng):
        """output_shape one larger than kernel*pooled (odd pre-pool size):
        the dense non-overlapping path must zero-pad the never-indexed
        last row/col."""
        x = rng.standard_normal((1, 2, 9, 9)).astype(np.float32)
        b = GraphBuilder("unpool_odd", opset=13)
        xi = b.input("x", x.shape)
        y, idx = b.node("MaxPool", [xi], outputs=2,
                        kernel_shape=[2, 2], strides=[2, 2])
        out = b.node("MaxUnpool",
                     [y, idx, b.init(np.array([1, 2, 9, 9], np.int64))],
                     kernel_shape=[2, 2], strides=[2, 2])
        g = b.finish([out])
        got = st.CompiledModel(g)(x)[0]
        ty, tidx = F.max_pool2d(torch.from_numpy(x), 2, 2,
                                return_indices=True)
        want = F.max_unpool2d(ty, tidx, 2, 2, output_size=(9, 9))
        np.testing.assert_allclose(got, t2n(want), rtol=1e-6, atol=1e-7)


class TestMaxRoiPool:
    def test_vs_numpy_reference(self, rng):
        N, C, H, W = 2, 3, 10, 12
        ph, pw, scale = 3, 4, 0.5
        x = rng.standard_normal((N, C, H, W)).astype(np.float32)
        rois = np.array([[0, 0, 0, 12, 14],
                         [1, 4, 2, 18, 16],
                         [0, 6, 6, 8, 8]], np.float32)
        got = run_op("MaxRoiPool", [x, rois],
                     dict(pooled_shape=[ph, pw], spatial_scale=scale))
        want = np.zeros((len(rois), C, ph, pw), np.float32)
        for r, roi in enumerate(rois):
            b = int(roi[0])
            x1, y1, x2, y2 = np.round(roi[1:] * scale)
            rw = max(x2 - x1 + 1, 1)
            rh = max(y2 - y1 + 1, 1)
            for i in range(ph):
                for j in range(pw):
                    hs = int(np.clip(np.floor(i * rh / ph) + y1, 0, H))
                    he = int(np.clip(np.ceil((i + 1) * rh / ph) + y1, 0, H))
                    ws = int(np.clip(np.floor(j * rw / pw) + x1, 0, W))
                    we = int(np.clip(np.ceil((j + 1) * rw / pw) + x1, 0, W))
                    patch = x[b, :, hs:he, ws:we]
                    want[r, :, i, j] = (patch.max(axis=(1, 2))
                                        if patch.size else 0.0)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


class TestTfIdfVectorizer:
    ATTRS = dict(mode="TF", min_gram_length=1, max_gram_length=2,
                 max_skip_count=0, ngram_counts=[0, 2],
                 ngram_indexes=[0, 1, 2, 3],
                 pool_int64s=[2, 3, 5, 6, 7, 8])

    def test_tf_counts(self, rng):
        x = np.array([[1, 2, 3, 5, 6, 7, 8, 6, 7],
                      [5, 6, 5, 6, 8, 2, 2, 9, 9]], np.int32)
        got = run_op("TfIdfVectorizer", [x], dict(self.ATTRS), opset=13)
        np.testing.assert_array_equal(
            got, np.array([[1, 1, 1, 1], [2, 0, 2, 0]], np.float32))

    def test_skip_and_1d(self, rng):
        x = np.array([5, 9, 6], np.int32)  # (5,6) matches only at skip=1
        attrs = dict(self.ATTRS, max_skip_count=1, min_gram_length=2)
        got = run_op("TfIdfVectorizer", [x], attrs, opset=13)
        np.testing.assert_array_equal(got, np.array([0, 0, 1, 0], np.float32))

    def test_tfidf_weights(self, rng):
        x = np.array([[2, 2, 3, 5, 6]], np.int32)
        attrs = dict(self.ATTRS, mode="TFIDF",
                     weights=[1.0, 2.0, 0.5, 3.0])
        got = run_op("TfIdfVectorizer", [x], attrs, opset=13)
        np.testing.assert_array_equal(
            got, np.array([[2.0, 2.0, 0.5, 0.0]], np.float32))
