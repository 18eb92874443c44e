"""Optimizer pass tests: BN fusion (conv/depthwise/convtranspose/gemm),
constant folding, nop elision, pad folding — each checked for numerical
equivalence before/after on real sub-graphs."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import smelter_tpu as st
from smelter_tpu.frontend.torch_export import export_torch
from smelter_tpu.ir.build import GraphBuilder
from smelter_tpu.passes.pass_manager import run_passes
from smelter_tpu.models import mobilenet_v2


def outputs_of(g, *x):
    return st.CompiledModel(g)(*x)[0]


def clone(g):
    return st.import_model(st.export_model(g))


class TestBNFusion:
    def _check(self, tm, shape, expect_bn_left=0):
        x = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
        g = export_torch(tm, torch.from_numpy(x), "t")
        before = outputs_of(g, x)
        g2 = run_passes(clone(g))
        after = outputs_of(g2, x)
        n_bn = sum(1 for _ in g2.find_nodes("BatchNormalization"))
        assert n_bn == expect_bn_left, f"{n_bn} BN nodes left"
        np.testing.assert_allclose(after, before, rtol=1e-4, atol=1e-5)
        return g2

    def test_conv_bn(self):
        torch.manual_seed(0)
        tm = nn.Sequential(nn.Conv2d(3, 8, 3, padding=1), nn.BatchNorm2d(8)).eval()
        with torch.no_grad():
            tm[1].running_mean.normal_(0, 0.3)
            tm[1].running_var.uniform_(0.5, 2.0)
        g2 = self._check(tm, (1, 3, 8, 8))
        assert sum(1 for _ in g2.find_nodes("Conv")) == 1

    def test_conv_nobias_bn(self):
        torch.manual_seed(1)
        tm = nn.Sequential(nn.Conv2d(3, 8, 3, bias=False), nn.BatchNorm2d(8)).eval()
        with torch.no_grad():
            tm[1].running_mean.normal_(0, 0.3)
            tm[1].running_var.uniform_(0.5, 2.0)
        g2 = self._check(tm, (1, 3, 8, 8))
        conv = next(g2.find_nodes("Conv"))
        assert len(conv.inputs) == 3  # bias was added by fusion

    def test_depthwise_bn(self):
        torch.manual_seed(2)
        tm = nn.Sequential(nn.Conv2d(8, 8, 3, groups=8, bias=False),
                           nn.BatchNorm2d(8)).eval()
        with torch.no_grad():
            tm[1].running_mean.normal_(0, 0.3)
            tm[1].running_var.uniform_(0.5, 2.0)
        self._check(tm, (1, 8, 9, 9))

    def test_convtranspose_bn_grouped(self):
        torch.manual_seed(3)
        tm = nn.Sequential(nn.ConvTranspose2d(4, 6, 3, stride=2, groups=2),
                           nn.BatchNorm2d(6)).eval()
        with torch.no_grad():
            tm[1].running_mean.normal_(0, 0.3)
            tm[1].running_var.uniform_(0.5, 2.0)
        self._check(tm, (1, 4, 5, 5))

    def test_gemm_bn(self):
        torch.manual_seed(4)
        tm = nn.Sequential(nn.Flatten(1), nn.Linear(12, 6), nn.BatchNorm1d(6)).eval()
        with torch.no_grad():
            tm[2].running_mean.normal_(0, 0.3)
            tm[2].running_var.uniform_(0.5, 2.0)
        self._check(tm, (2, 3, 2, 2))

    def test_bn_not_fused_when_conv_shared(self):
        """Conv output consumed twice: fusion must not fire."""
        b = GraphBuilder("t", opset=13)
        x = b.input("x", (1, 3, 8, 8))
        c = b.conv(x, np.random.default_rng(0).standard_normal((4, 3, 3, 3)).astype(np.float32))
        bn = b.batch_norm(c, np.ones(4, np.float32), np.zeros(4, np.float32),
                          np.zeros(4, np.float32), np.ones(4, np.float32))
        other = b.node("Relu", [c])
        out = b.node("Add", [bn, other])
        g = b.finish([out])
        xin = np.random.default_rng(1).standard_normal((1, 3, 8, 8)).astype(np.float32)
        before = outputs_of(g, xin)
        run_passes(g)
        assert sum(1 for _ in g.find_nodes("BatchNormalization")) == 1
        np.testing.assert_allclose(outputs_of(g, xin), before, rtol=1e-5)

    def test_bn_fold_with_shared_weight(self):
        """Two convs share one weight; only one feeds a BN. Folding must
        not corrupt the other conv's weight (weight tying)."""
        rng = np.random.default_rng(0)
        w = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)
        b = GraphBuilder("tied", opset=13)
        x = b.input("x", (1, 3, 8, 8))
        wn = b.init(w)
        c1 = b.node("Conv", [x, wn], kernel_shape=[3, 3], pads=[1, 1, 1, 1])
        c2 = b.node("Conv", [x, wn], kernel_shape=[3, 3], pads=[1, 1, 1, 1])
        bn = b.batch_norm(c1, np.full(4, 2.0, np.float32),
                          np.zeros(4, np.float32),
                          rng.standard_normal(4).astype(np.float32) * 0.3,
                          rng.uniform(0.5, 2.0, 4).astype(np.float32))
        out = b.node("Add", [bn, c2])
        g = b.finish([out])
        xin = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
        before = outputs_of(g, xin)
        run_passes(g)
        assert sum(1 for _ in g.find_nodes("BatchNormalization")) == 0
        np.testing.assert_allclose(outputs_of(g, xin), before,
                                   rtol=1e-4, atol=1e-5)

    def test_mobilenet_fusion_end_to_end(self):
        g, tm, shape = mobilenet_v2.build(1, 96, width_mult=0.35, num_classes=10)
        x = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
        before = outputs_of(g, x)
        run_passes(g)
        assert sum(1 for _ in g.find_nodes("BatchNormalization")) == 0
        np.testing.assert_allclose(outputs_of(g, x), before, rtol=1e-3, atol=1e-4)


class TestFolding:
    def test_fold_constants_chain(self):
        b = GraphBuilder("t", opset=13)
        x = b.input("x", (2, 4))
        c1 = b.init(np.arange(4, dtype=np.float32))
        c2 = b.init(np.full(4, 2.0, np.float32))
        s = b.node("Add", [c1, c2])
        s2 = b.node("Mul", [s, c2])
        y = b.node("Add", [x, s2])
        g = b.finish([y])
        n = run_passes(g, ["fold_constants", "dce"])
        assert len(g.nodes) == 1  # only the final Add survives
        out = outputs_of(g, np.zeros((2, 4), np.float32))
        np.testing.assert_allclose(out[0], (np.arange(4) + 2) * 2)

    def test_nop_elision(self):
        b = GraphBuilder("t", opset=13)
        x = b.input("x", (2, 4))
        y = b.node("Dropout", [x])
        y = b.node("Identity", [y])
        y = b.node("Relu", [y])
        g = b.finish([y])
        run_passes(g, ["eliminate_nops", "dce"])
        assert [n.op_type for n in g.nodes] == ["Relu"]

    def test_pad_into_conv(self):
        b = GraphBuilder("t", opset=13)
        x = b.input("x", (1, 3, 8, 8))
        pads = b.init(np.array([0, 0, 1, 1, 0, 0, 1, 1], np.int64))
        p = b.node("Pad", [x, pads], mode="constant")
        y = b.conv(p, np.random.default_rng(0).standard_normal((4, 3, 3, 3)).astype(np.float32))
        g = b.finish([y])
        xin = np.random.default_rng(1).standard_normal((1, 3, 8, 8)).astype(np.float32)
        before = outputs_of(g, xin)
        run_passes(g, ["fuse_pad_conv", "dce"])
        assert sum(1 for _ in g.find_nodes("Pad")) == 0
        conv = next(g.find_nodes("Conv"))
        assert conv.attrs["pads"] == [1, 1, 1, 1]
        np.testing.assert_allclose(outputs_of(g, xin), before, rtol=1e-5)

    def test_reflect_pad_not_folded(self):
        b = GraphBuilder("t", opset=13)
        x = b.input("x", (1, 3, 8, 8))
        pads = b.init(np.array([0, 0, 1, 1, 0, 0, 1, 1], np.int64))
        p = b.node("Pad", [x, pads], mode="reflect")
        y = b.conv(p, np.ones((4, 3, 3, 3), np.float32))
        g = b.finish([y])
        run_passes(g, ["fuse_pad_conv"])
        assert sum(1 for _ in g.find_nodes("Pad")) == 1


class TestAttentionFusion:
    def test_vit_attention_fused(self):
        from smelter_tpu.models import vit

        g, tm, shape = vit.build(2, 32, patch=8, dim=64, depth=2, heads=4,
                                 num_classes=10)
        x = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
        before = outputs_of(g, x)
        run_passes(g)
        # the packed-QKV glue collapses too (fuse_qkv_attention)
        assert sum(1 for _ in g.find_nodes("FusedQKVAttention")) == 2
        assert sum(1 for _ in g.find_nodes("FusedAttention")) == 0
        assert sum(1 for _ in g.find_nodes("Softmax")) == 0
        # only the cls-token slice survives
        assert sum(1 for _ in g.find_nodes("Slice")) == 1
        np.testing.assert_allclose(outputs_of(g, x), before, rtol=1e-3, atol=1e-4)

    def test_non_attention_softmax_untouched(self):
        b = GraphBuilder("t", opset=13)
        x = b.input("x", (2, 8))
        y = b.node("Softmax", [x], axis=-1)
        g = b.finish([y])
        run_passes(g, ["fuse_attention"])
        assert sum(1 for _ in g.find_nodes("Softmax")) == 1


class TestLayoutNHWC:
    @pytest.mark.parametrize("case", ["mnv2", "resnet", "unet", "esrgan"])
    def test_parity_and_transpose_count(self, case):
        from smelter_tpu.models import esrgan, mobilenet_v2, resnet50, unet

        builders = {
            "mnv2": lambda: mobilenet_v2.build(1, 96, width_mult=0.35, num_classes=10),
            "resnet": lambda: resnet50.build(2, 64, layers=(1, 1, 1, 1), width=16,
                                             num_classes=10),
            "unet": lambda: unet.build(1, 64, base=8, num_classes=3),
            "esrgan": lambda: esrgan.build(1, 24, nf=16, nb=1, scale=4),
        }
        g, tm, shape = builders[case]()
        x = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
        before = outputs_of(g, x)
        run_passes(g)
        run_passes(g, ["layout_nhwc", "dce"])
        assert g.metadata["layout"] == "nhwc"
        # only the input/output boundary transposes remain
        assert sum(1 for _ in g.find_nodes("Transpose")) == 2
        np.testing.assert_allclose(outputs_of(g, x), before, rtol=1e-3, atol=1e-4)

    def test_int8_dequant_conv_weights_permuted(self):
        from smelter_tpu.models import resnet50
        from smelter_tpu.quant import quantize_weights

        g, tm, shape = resnet50.build(1, 64, layers=(1, 1, 1, 1), width=16,
                                      num_classes=10)
        x = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
        before = outputs_of(g, x)
        run_passes(g)
        quantize_weights(g, "int8", min_elements=1)
        run_passes(g, ["layout_nhwc", "dce"])
        dq = [n for n in g.nodes if n.op_type == "DequantizeLinear"]
        assert dq and all(n.attr("axis") == 3 for n in dq
                          if g.initializers[n.inputs[0]].ndim == 4)
        after = outputs_of(g, x)
        assert (after.argmax(1) == before.argmax(1)).all()

    def test_idempotent(self):
        from smelter_tpu.models import resnet50

        g, _, _ = resnet50.build(1, 64, layers=(1, 1, 1, 1), width=16,
                                 num_classes=10)
        run_passes(g, ["layout_nhwc"])
        assert run_passes(g, ["layout_nhwc"]) is g  # second run no-ops
        assert g.metadata["layout"] == "nhwc"

    def test_shared_conv_weight_not_double_permuted(self):
        """Two convs sharing one weight initializer (siamese): the layout
        pass must not transpose it twice."""
        rng = np.random.default_rng(0)
        w = rng.standard_normal((8, 3, 3, 3)).astype(np.float32)
        b = GraphBuilder("siamese", opset=13)
        x1 = b.input("x1", (1, 3, 8, 8))
        x2 = b.input("x2", (1, 3, 8, 8))
        wn = b.init(w)
        h1 = b.node("Conv", [x1, wn], kernel_shape=[3, 3], pads=[1, 1, 1, 1])
        h2 = b.node("Conv", [x2, wn], kernel_shape=[3, 3], pads=[1, 1, 1, 1])
        y = b.node("Add", [h1, h2])
        g = b.finish([y])
        a1 = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
        a2 = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
        before = outputs_of(g, a1, a2)
        run_passes(g, ["layout_nhwc", "dce"])
        np.testing.assert_allclose(outputs_of(g, a1, a2), before,
                                   rtol=1e-4, atol=1e-5)

    def test_shared_dequant_conv_weight_not_double_permuted(self):
        """Two convs sharing one DequantizeLinear'd int8 weight."""
        rng = np.random.default_rng(0)
        q = rng.integers(-127, 128, (8, 3, 3, 3)).astype(np.int8)
        scale = (rng.random(8).astype(np.float32) + 0.5) / 100
        b = GraphBuilder("siamese_q", opset=13)
        x1 = b.input("x1", (1, 3, 8, 8))
        x2 = b.input("x2", (1, 3, 8, 8))
        w = b.node("DequantizeLinear", [b.init(q), b.init(scale)], axis=0)
        h1 = b.node("Conv", [x1, w], kernel_shape=[3, 3], pads=[1, 1, 1, 1])
        h2 = b.node("Conv", [x2, w], kernel_shape=[3, 3], pads=[1, 1, 1, 1])
        y = b.node("Add", [h1, h2])
        g = b.finish([y])
        a1 = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
        a2 = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
        before = outputs_of(g, a1, a2)
        run_passes(g, ["layout_nhwc", "dce"])
        np.testing.assert_allclose(outputs_of(g, a1, a2), before,
                                   rtol=1e-4, atol=1e-5)


class TestLayoutDepthToSpace:
    @pytest.mark.parametrize("mode", ["DCR", "CRD"])
    def test_d2s_nhwc_parity(self, mode):
        b = GraphBuilder("d2s", opset=13)
        x = b.input("x", (1, 3, 16, 16))
        h = b.conv(x, np.random.default_rng(0).standard_normal((16, 3, 3, 3)).astype(np.float32),
                   pads=(1, 1, 1, 1))
        h = b.node("DepthToSpace", [h], blocksize=2, mode=mode)
        h = b.node("Relu", [h])
        g = b.finish([h])
        xin = np.random.default_rng(1).standard_normal((1, 3, 16, 16)).astype(np.float32)
        before = outputs_of(g, xin)
        run_passes(g, ["layout_nhwc", "dce"])
        d2s = next(g.find_nodes("DepthToSpace"))
        assert d2s.attr("data_layout") == "NHWC"
        assert sum(1 for _ in g.find_nodes("Transpose")) == 2
        np.testing.assert_allclose(outputs_of(g, xin), before, rtol=1e-4, atol=1e-5)

    def test_slice_stays_nhwc(self):
        """Spatial crop between convs keeps the NHWC flow (axes remapped)."""
        b = GraphBuilder("crop", opset=13)
        x = b.input("x", (1, 3, 12, 12))
        h = b.conv(x, np.random.default_rng(0).standard_normal((8, 3, 3, 3)).astype(np.float32),
                   pads=(1, 1, 1, 1))
        h = b.node("Slice", [h, b.init(np.array([2, 2], np.int64)),
                             b.init(np.array([10, 10], np.int64)),
                             b.init(np.array([2, 3], np.int64))])
        h = b.conv(h, np.random.default_rng(1).standard_normal((4, 8, 3, 3)).astype(np.float32))
        g = b.finish([h])
        xin = np.random.default_rng(2).standard_normal((1, 3, 12, 12)).astype(np.float32)
        before = outputs_of(g, xin)
        run_passes(g, ["layout_nhwc", "dce"])
        assert sum(1 for _ in g.find_nodes("Transpose")) == 2
        np.testing.assert_allclose(outputs_of(g, xin), before, rtol=1e-4, atol=1e-5)


class TestNativeAttentionFusion:
    """The round-2 native-layout branches of fuse_attention: torch-export
    form (K via Transpose(0,2,3,1)) and constant-folded K/V projections,
    incl. the batch-1-constant vs batch>1-activation broadcast case."""

    def _attn_graph(self, rng, b_act, const_kv):
        import smelter_tpu as st
        from smelter_tpu.ir.build import GraphBuilder

        B, N, H, HD = b_act, 6, 2, 8
        D = H * HD
        T = 5
        g = GraphBuilder("t", opset=17)
        q4 = g.input("q", (B, N, H, HD))  # native (B,N,H,hd)
        qt = g.node("Transpose", [q4], perm=[0, 2, 1, 3])
        if const_kv:
            kT = rng.standard_normal((1, H, HD, T)).astype(np.float32)
            vv = rng.standard_normal((1, H, T, HD)).astype(np.float32)
            k_name, v_name = g.init(kT), g.init(vv)
        else:
            k4 = g.input("k", (B, T, H, HD))
            v4 = g.input("v", (B, T, H, HD))
            k_name = g.node("Transpose", [k4], perm=[0, 2, 3, 1])
            v_name = g.node("Transpose", [v4], perm=[0, 2, 1, 3])
        sc = g.node("MatMul", [qt, k_name])
        sc = g.node("Mul", [sc, g.init(np.float32(HD ** -0.5))])
        at = g.node("Softmax", [sc], axis=-1)
        cv = g.node("MatMul", [at, v_name])
        cv = g.node("Transpose", [cv], perm=[0, 2, 1, 3])
        out = g.node("Reshape", [cv, g.init(np.array([B, N, D], np.int64))])
        return g.finish([out])

    @pytest.mark.parametrize("b_act,const_kv", [(1, False), (2, False),
                                                (1, True), (2, True)])
    def test_parity_and_fusion(self, b_act, const_kv):
        import smelter_tpu as st

        g = self._attn_graph(np.random.default_rng(0), b_act, const_kv)
        unfused = st.CompiledModel(g)
        g2 = self._attn_graph(np.random.default_rng(0), b_act, const_kv)
        from smelter_tpu.passes.fuse_attention import fuse_attention
        n = fuse_attention(g2)
        assert n == 1, "native-form attention must fuse"
        fused = st.CompiledModel(g2)
        args = [np.random.default_rng(1).standard_normal(
            (b_act, 6, 2, 8)).astype(np.float32)]
        if not const_kv:
            args += [np.random.default_rng(2).standard_normal(
                (b_act, 5, 2, 8)).astype(np.float32),
                np.random.default_rng(3).standard_normal(
                    (b_act, 5, 2, 8)).astype(np.float32)]
        np.testing.assert_allclose(fused(*args)[0], unfused(*args)[0],
                                   rtol=1e-4, atol=1e-4)


class TestConvTransposeNHWC:
    @pytest.mark.parametrize("group,stride,outpad", [(1, 2, 0), (2, 2, 1),
                                                     (1, 3, 2)])
    def test_layout_pass_parity(self, group, stride, outpad):
        import smelter_tpu as st
        from smelter_tpu.ir.build import GraphBuilder
        from smelter_tpu.passes.layout import layout_nhwc

        rng = np.random.default_rng(0)
        cin, cout_g = 4 * group, 6
        x = rng.standard_normal((2, cin, 7, 8)).astype(np.float32)
        w = rng.standard_normal((cin, cout_g, 3, 3)).astype(np.float32)
        bias = rng.standard_normal(cout_g * group).astype(np.float32)

        def build():
            g = GraphBuilder("t", opset=17)
            xi = g.input("x", x.shape)
            out = g.node("ConvTranspose", [xi, g.init(w), g.init(bias)],
                         strides=[stride, stride], pads=[1, 1, 1, 1],
                         output_padding=[outpad, outpad],
                         kernel_shape=[3, 3], group=group)
            return g.finish([out])

        want = st.CompiledModel(build())(x)[0]
        g2 = build()
        n = layout_nhwc(g2)
        assert n > 0
        assert any(nd.op_type == "ConvTranspose"
                   and nd.attr("data_layout") == "NHWC" for nd in g2.nodes)
        got = st.CompiledModel(g2)(x)[0]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestGridSampleNHWC:
    @pytest.mark.parametrize("mode,pad,align", [
        ("bilinear", "zeros", 0), ("bilinear", "border", 1),
        ("nearest", "zeros", 0), ("bilinear", "reflection", 0)])
    def test_layout_pass_parity(self, mode, pad, align):
        import smelter_tpu as st
        from smelter_tpu.ir.build import GraphBuilder
        from smelter_tpu.passes.layout import layout_nhwc

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 5, 7, 8)).astype(np.float32)
        grid = rng.uniform(-1.3, 1.3, (2, 6, 6, 2)).astype(np.float32)

        def build():
            g = GraphBuilder("t", opset=17)
            xi = g.input("x", x.shape)
            gi = g.input("grid", grid.shape)
            # conv ahead of GridSample so the NHWC flow actually reaches it
            c = g.conv(xi, rng.standard_normal((5, 5, 1, 1)).astype(np.float32))
            out = g.node("GridSample", [c, gi], mode=mode,
                         padding_mode=pad, align_corners=align)
            return g.finish([out])

        rng = np.random.default_rng(0)  # identical weights both builds
        want = st.CompiledModel(build())(x, grid)[0]
        rng = np.random.default_rng(0)
        g2 = build()
        layout_nhwc(g2)
        assert any(n.op_type == "GridSample"
                   and n.attr("data_layout") == "NHWC" for n in g2.nodes)
        got = st.CompiledModel(g2)(x, grid)[0]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestCollapseLayoutTransposes:
    """collapse_layout_transposes: the SD-style spatial<->token sandwiches
    (Transpose/Reshape/Transpose around attention) must collapse to one
    NHWC Reshape each, with bit-identical numerics."""

    def _spatial_attn_graph(self, rng, B=2, C=8, H=6, W=5):
        from smelter_tpu.ir.build import GraphBuilder

        g = GraphBuilder("t", opset=17)
        xi = g.input("x", (B, C, H, W))
        h = g.conv(xi, rng.standard_normal((C, C, 1, 1)).astype(np.float32))
        # tokens: (B,C,H,W) -> (B,C,HW) -> (B,HW,C)
        t = g.node("Reshape", [h, g.init(np.array([B, C, H * W], np.int64))])
        t = g.node("Transpose", [t], perm=[0, 2, 1])
        t = g.node("MatMul", [t, g.init(
            rng.standard_normal((C, C)).astype(np.float32))])
        t = g.node("Softmax", [t], axis=-1)
        # back to spatial
        t = g.node("Transpose", [t], perm=[0, 2, 1])
        t = g.node("Reshape", [t, g.init(np.array([B, C, H, W], np.int64))])
        out = g.conv(t, rng.standard_normal((C, C, 1, 1)).astype(np.float32))
        return g.finish([out])

    def test_both_sandwiches_collapse(self):
        import smelter_tpu as st
        from smelter_tpu.passes.layout import collapse_layout_transposes

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 8, 6, 5)).astype(np.float32)
        rng = np.random.default_rng(1)
        want = st.CompiledModel(self._spatial_attn_graph(rng))(x)[0]
        rng = np.random.default_rng(1)
        g = self._spatial_attn_graph(rng)
        run_passes(g, ["layout_nhwc"])
        n = collapse_layout_transposes(g)
        run_passes(g, ["dce"])
        assert n == 2, f"expected both sandwiches collapsed, got {n}"
        # only the graph-boundary transposes remain
        assert sum(1 for _ in g.find_nodes("Transpose")) == 2
        got = st.CompiledModel(g)(x)[0]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_sd_unet_end_to_end(self):
        import smelter_tpu as st
        from smelter_tpu.models import sd_unet

        g, tm, shape = sd_unet.build(batch=1, image_size=8, base=16, heads=2)
        x = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        m = st.compile(g)  # default pipeline includes the collapse pass
        np.testing.assert_allclose(m(x)[0], want, rtol=1e-3, atol=2e-4)

    def test_shared_intermediate_not_collapsed(self):
        """If the mid Reshape output has a second consumer, the sandwich
        must stay (the pass requires sole-consumer chains)."""
        import smelter_tpu as st
        from smelter_tpu.ir.build import GraphBuilder
        from smelter_tpu.passes.layout import collapse_layout_transposes

        rng = np.random.default_rng(0)
        B, C, H, W = 1, 4, 3, 3

        def build():
            g = GraphBuilder("t", opset=17)
            xi = g.input("x", (B, C, H, W))
            h = g.conv(xi, rng.standard_normal((C, C, 1, 1)).astype(np.float32))
            r = g.node("Reshape", [h, g.init(np.array([B, C, H * W], np.int64))])
            t = g.node("Transpose", [r], perm=[0, 2, 1])
            s = g.node("ReduceSum", [r], axes=[2], keepdims=0)  # 2nd consumer
            u = g.node("ReduceSum", [t], axes=[1], keepdims=0)
            out = g.node("Add", [s, u])
            return g.finish([out])

        x = rng.standard_normal((B, C, H, W)).astype(np.float32)
        rng = np.random.default_rng(1)
        want = st.CompiledModel(build())(x)[0]
        rng = np.random.default_rng(1)
        g = build()
        run_passes(g, ["layout_nhwc"])
        assert collapse_layout_transposes(g) == 0
        np.testing.assert_allclose(st.CompiledModel(g)(x)[0], want,
                                   rtol=1e-5, atol=1e-6)


class TestFuseResidualLN:
    """fuse_residual_ln: Add->LayerNormalization becomes one contrib
    SkipLayerNormalization carrying both the normed and pre-norm-sum
    edges; numerics preserved on both lowering paths."""

    def test_vit_graph_fuses_and_matches(self):
        from smelter_tpu.models import vit

        g, tm, shape = vit.build(batch=2, image_size=32, patch=8, dim=64,
                                 depth=2, heads=2)
        x = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
        before = outputs_of(g, x)
        run_passes(g)
        n = sum(1 for nd in g.nodes
                if nd.op_type == "SkipLayerNormalization")
        assert n == 4  # 2 per block (post-attn, post-mlp); first LN unfused
        np.testing.assert_allclose(outputs_of(g, x), before,
                                   rtol=1e-4, atol=1e-5)
        # Pallas kernel path (interpret off-TPU) — same numerics
        got = st.CompiledModel(g, st.Config(fused_layernorm=True))(x)[0]
        np.testing.assert_allclose(got, before, rtol=1e-4, atol=1e-5)

    def test_sum_edge_still_feeds_consumers(self):
        """The Add output consumed by a later node must keep its value via
        the fused node's output 3."""
        rng = np.random.default_rng(1)
        D = 8
        b = GraphBuilder("t", opset=17)
        xi = b.input("x", (2, 3, D))
        yi = b.input("y", (2, 3, D))
        s = b.node("Add", [xi, yi])
        ln = b.node("LayerNormalization", [s, b.init(np.ones(D, np.float32)),
                                           b.init(np.zeros(D, np.float32))],
                    axis=-1, epsilon=1e-5)
        out = b.node("Add", [ln, s])  # second consumer of the sum edge
        g = b.finish([out])
        x = rng.standard_normal((2, 3, D)).astype(np.float32)
        y = rng.standard_normal((2, 3, D)).astype(np.float32)
        want = outputs_of(g, x, y)
        from smelter_tpu.passes.fuse_attention import fuse_residual_ln
        assert fuse_residual_ln(g) == 1
        np.testing.assert_allclose(outputs_of(g, x, y), want,
                                   rtol=1e-5, atol=1e-6)

    def test_broadcast_add_not_fused(self):
        """Add with a broadcast operand (e.g. bias) must stay unfused: the
        sum output would not be the full-rank residual carry."""
        b = GraphBuilder("t", opset=17)
        xi = b.input("x", (2, 3, 8))
        yi = b.input("y", (8,))  # broadcast operand
        s = b.node("Add", [xi, yi])
        ln = b.node("LayerNormalization",
                    [s, b.init(np.ones(8, np.float32)),
                     b.init(np.zeros(8, np.float32))], axis=-1)
        g = b.finish([ln])
        from smelter_tpu.passes.fuse_attention import fuse_residual_ln
        assert fuse_residual_ln(g) == 0


class TestStemSpaceToDepth:
    """stem_space_to_depth: stride-2 small-C_in conv becomes S2D(2) +
    stride-1 conv with 4x the input channels — arithmetic-identical."""

    def _graph(self, k, p, cin=3, strides=(2, 2), group=1, h=32):
        rng = np.random.default_rng(0)
        b = GraphBuilder("stem", opset=17)
        x = b.input("x", (2, cin, h, h))
        w = rng.standard_normal((8, cin // group, k, k)).astype(np.float32)
        bias = rng.standard_normal(8).astype(np.float32)
        y = b.conv(x, w, bias, strides=strides, pads=(p, p, p, p),
                   group=group)
        y = b.node("Relu", [y])
        return b.finish([y])

    @pytest.mark.parametrize("k,p", [(7, 3), (3, 1), (5, 2), (4, 1)])
    def test_rewrites_and_matches(self, rng, k, p):
        from smelter_tpu.passes.stem_s2d import stem_space_to_depth

        g = self._graph(k, p)
        x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
        want = outputs_of(g, x)
        assert stem_space_to_depth(g) == 1
        conv = next(n for n in g.nodes if n.op_type == "Conv")
        assert conv.attrs["strides"] == [1, 1]
        assert any(n.op_type == "SpaceToDepth" for n in g.nodes)
        np.testing.assert_allclose(outputs_of(g, x), want,
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize(
        "kwargs", [dict(k=7, p=3, cin=8),          # C_in too large
                   dict(k=7, p=3, strides=(1, 1)),  # not stride 2
                   dict(k=4, p=3, cin=4, group=4),  # grouped
                   dict(k=7, p=3, h=31)])           # odd spatial size
    def test_skips(self, kwargs):
        from smelter_tpu.passes.stem_s2d import stem_space_to_depth

        assert stem_space_to_depth(self._graph(**kwargs)) == 0

    def test_opt_in_on_resnet(self, rng):
        """OFF in the default pipeline (probe34c: no on-chip win); fires
        and preserves numerics when invoked explicitly."""
        from smelter_tpu.models import resnet50
        from smelter_tpu.passes.stem_s2d import stem_space_to_depth

        g, _tm, shape = resnet50.build(batch=2, image_size=64)
        x = rng.standard_normal(shape).astype(np.float32)
        want = outputs_of(g, x)
        run_passes(g)
        assert sum(1 for n in g.nodes if n.op_type == "SpaceToDepth") == 0
        assert stem_space_to_depth(g) == 1
        np.testing.assert_allclose(outputs_of(g, x), want,
                                   rtol=1e-4, atol=1e-5)


class TestFuseTransposePairs:
    def test_convnext_transposes_collapse_with_parity(self, rng):
        """torch-exported permutes + layout_nhwc conversions leave exact
        inverse Transpose pairs at runtime (ConvNeXt: 88 post-layout).
        fuse_transpose_pairs composes/cancels them (88 -> ~10) without
        touching numerics (probe62 measured ~0.7 ms/block of transpose
        glue on chip)."""
        import copy

        import smelter_tpu as st
        from smelter_tpu.models import ZOO

        g, _tm, shape = ZOO["convnext"](batch=1, image_size=224)
        g_ref = copy.deepcopy(g)
        m_ref = st.compile(g_ref, st.Config(compute_dtype="float32"),
                           optimize=False, layout="nchw")
        m = st.compile(g, st.Config(compute_dtype="float32"))
        n_t = sum(1 for nd in m.graph.nodes if nd.op_type == "Transpose")
        assert n_t <= 16, n_t
        x = rng.standard_normal(shape).astype(np.float32) * 0.5
        want = np.asarray(m_ref(x)[0])
        got = np.asarray(m(x)[0])
        rel = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
        assert rel < 1e-3, rel

    def test_identity_pair_preserves_graph_output_edge(self, rng):
        from smelter_tpu.ir.build import GraphBuilder
        from smelter_tpu.passes.pass_manager import get_pass

        bld = GraphBuilder("g", opset=13)
        x = bld.input("x", (1, 3, 4, 5))
        t1 = bld.node("Transpose", [x], perm=[0, 2, 3, 1])
        t2 = bld.node("Transpose", [t1], perm=[0, 3, 1, 2])
        g = bld.finish([t2])
        n = get_pass("fuse_transpose_pairs")(g)
        assert n >= 1
        import smelter_tpu as st

        xv = rng.standard_normal((1, 3, 4, 5)).astype(np.float32)
        out = st.CompiledModel(g, st.Config(compute_dtype="float32"))(xv)[0]
        np.testing.assert_array_equal(np.asarray(out), xv)


class TestDwConvLnBarrier:
    """dwconv_ln_barrier: OptimizationBarrier after depthwise convs
    feeding LayerNorm (the probe86 fusion-seam remediation). Must be
    numerics-preserving and fire only on dw->(glue)->LN chains."""

    def _block_graph(self):
        import torch

        from smelter_tpu.frontend.torch_export import export_torch

        class Block(torch.nn.Module):
            def __init__(self, c=16):
                super().__init__()
                self.dw = torch.nn.Conv2d(c, c, 7, padding=3, groups=c)
                self.ln = torch.nn.LayerNorm(c)
                self.fc = torch.nn.Linear(c, c)

            def forward(self, x):
                h = self.dw(x).permute(0, 2, 3, 1)
                return x + self.fc(self.ln(h)).permute(0, 3, 1, 2)

        bm = Block().eval()
        xt = torch.randn(2, 16, 8, 8)
        return export_torch(bm, (xt,)), xt.numpy()

    def test_inserts_and_preserves(self):
        import smelter_tpu as st
        from smelter_tpu.passes.pass_manager import run_passes
        from smelter_tpu.runtime.generate import _shallow_clone

        g, x = self._block_graph()
        run_passes(g)
        before = st.CompiledModel(_shallow_clone(g), st.Config())(x)[0]
        n = run_passes(g, ["dwconv_ln_barrier"])
        bars = [nn for nn in g.nodes
                if nn.op_type == "OptimizationBarrier"]
        assert len(bars) == 1
        after = st.CompiledModel(g, st.Config())(x)[0]
        np.testing.assert_allclose(np.asarray(after), np.asarray(before),
                                   atol=1e-6)

    def test_skips_dense_conv_and_non_ln(self):
        from smelter_tpu.ir.build import GraphBuilder
        from smelter_tpu.passes.pass_manager import run_passes

        rng = np.random.default_rng(0)
        b = GraphBuilder("m", opset=17)
        x = b.input("x", (2, 8, 8, 8))
        # dense conv -> relu: no barrier
        y = b.node("Conv", [x, b.init(
            rng.standard_normal((8, 8, 3, 3)).astype(np.float32))],
            pads=[1, 1, 1, 1])
        y = b.node("Relu", [y])
        # depthwise conv -> relu (no LN): no barrier either
        y = b.node("Conv", [y, b.init(
            rng.standard_normal((8, 1, 3, 3)).astype(np.float32))],
            group=8, pads=[1, 1, 1, 1])
        y = b.node("Relu", [y])
        b.output(y, (2, 8, 8, 8))
        run_passes(b.graph, ["dwconv_ln_barrier"])
        assert not [n for n in b.graph.nodes
                    if n.op_type == "OptimizationBarrier"]
