"""pixel_conv_regions pass: numerics-preserving rewrite of small-C_out
3x3 convs to the pixel-major Pallas kernel with NHCW trunk regions
(passes/pixel_regions.py). Kernel runs in interpret mode on CPU."""

import copy

import numpy as np
import pytest

import smelter_tpu as st
import smelter_tpu.passes.pixel_regions  # noqa: F401 (pass registration)
from smelter_tpu.ir.build import GraphBuilder
from smelter_tpu.passes.pass_manager import get_pass


def _dense_block_graph(b=1, nf=16, gc=16, hw=128, blocks=2):
    """ESRGAN-style dense blocks (2 x 4 convs meets the >= 8-conv region
    gate): convs + LeakyRelu + concats + residuals."""
    rng = np.random.default_rng(0)
    bld = GraphBuilder("db", opset=13)
    x0 = bld.input("x", (b, nf, hw, hw))
    scale = bld.init(np.asarray(0.2, np.float32))
    x = x0
    for _ in range(blocks):
        feats, outs = x, []
        for j in range(4):
            cin = nf + j * gc
            cout = gc if j < 3 else nf
            w = bld.init((rng.standard_normal((cout, cin, 3, 3)) /
                          (3 * np.sqrt(cin))).astype(np.float32))
            bias = bld.init(rng.standard_normal((cout,))
                            .astype(np.float32) * .1)
            y = bld.node("Conv", [feats, w, bias], kernel_shape=[3, 3],
                         strides=[1, 1], pads=[1, 1, 1, 1])
            if j < 3:
                y = bld.node("LeakyRelu", [y], alpha=0.2)
                outs.append(y)
                feats = bld.node("Concat", [x] + outs, axis=1)
        x = bld.node("Add", [x, bld.node("Mul", [y, scale])])
    return bld.finish([x]), (b, nf, hw, hw)


class TestPixelRegions:
    def test_fires_and_preserves_numerics(self):
        g, shape = _dense_block_graph()
        x = np.random.default_rng(1).standard_normal(shape).astype(
            np.float32)
        want = np.asarray(st.CompiledModel(copy.deepcopy(g), st.Config())(x)[0])
        n = get_pass("pixel_conv_regions")(g)
        assert n == 8  # all eight convs taken
        ops = [nd.op_type for nd in g.nodes]
        assert ops.count("PixelConv") == 8
        assert "Conv" not in ops
        assert "LeakyRelu" not in ops  # fused into the kernel epilogue
        # one entry transpose (memoized across x's uses) + one exit
        assert ops.count("Transpose") == 2
        # concats follow the trunk into NHCW with the axis remapped
        assert all(nd.attr("axis") == 2 for nd in g.find_nodes("Concat"))
        got = np.asarray(st.CompiledModel(g, st.Config())(x)[0])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_gate_skips_isolated_small_maps(self):
        # a lone eligible conv at W=128 is skipped: boundary transposes
        # cost more than the per-conv win (probe44)
        rng = np.random.default_rng(4)
        bld = GraphBuilder("g", opset=13)
        x = bld.input("x", (1, 16, 8, 128))
        w = bld.init(rng.standard_normal((16, 16, 3, 3)).astype(np.float32))
        bld.node("Conv", [x, w], kernel_shape=[3, 3], strides=[1, 1],
                 pads=[1, 1, 1, 1])
        g = bld.finish()
        assert get_pass("pixel_conv_regions")(g) == 0

    def test_gate_skips_unaligned(self):
        # W=120 not a lane multiple; C_in=12 not a sublane multiple
        rng = np.random.default_rng(0)
        bld = GraphBuilder("g", opset=13)
        x = bld.input("x", (1, 12, 16, 120))
        w = bld.init(rng.standard_normal((8, 12, 3, 3)).astype(np.float32))
        bld.node("Conv", [x, w], kernel_shape=[3, 3], strides=[1, 1],
                 pads=[1, 1, 1, 1])
        g = bld.finish()
        assert get_pass("pixel_conv_regions")(g) == 0

    def test_relu_fusion_and_missing_bias(self):
        rng = np.random.default_rng(2)
        bld = GraphBuilder("g", opset=13)
        # single conv: kept only on W >= 384 maps (trunk gate)
        x = bld.input("x", (1, 16, 8, 512))
        w = bld.init((rng.standard_normal((16, 16, 3, 3)) / 12)
                     .astype(np.float32))
        y = bld.node("Conv", [x, w], kernel_shape=[3, 3], strides=[1, 1],
                     pads=[1, 1, 1, 1])
        y = bld.node("Relu", [y])
        g = bld.finish([y])
        xv = rng.standard_normal((1, 16, 8, 512)).astype(np.float32)
        want = np.asarray(st.CompiledModel(copy.deepcopy(g), st.Config())(xv)[0])
        assert get_pass("pixel_conv_regions")(g) == 1
        node = next(g.find_nodes("PixelConv"))
        assert node.attr("alpha") == 0.0 and len(node.inputs) == 3
        got = np.asarray(st.CompiledModel(g, st.Config())(xv)[0])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_default_pipeline_parity_esrgan_shape(self):
        # through st.compile (full default pipeline incl. layout_nhwc after)
        g, shape = _dense_block_graph(nf=16, gc=16, hw=128)
        x = np.random.default_rng(3).standard_normal(shape).astype(
            np.float32)
        want = np.asarray(
            st.CompiledModel(copy.deepcopy(g), st.Config())(x)[0])
        m = st.compile(copy.deepcopy(g), st.Config())
        assert any(nd.op_type == "PixelConv" for nd in m.graph.nodes)
        got = np.asarray(m(x)[0])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_nearest_upsample_rides_the_trunk(self):
        # dense block (4 convs) -> nearest 2x -> conv: the resize joins the
        # NHCW region (PixelNearestUp) and the tail conv connects to it
        rng = np.random.default_rng(5)
        bld = GraphBuilder("g", opset=13)
        x = bld.input("x", (1, 16, 16, 128))
        feats, outs = x, []
        for j in range(8):
            cin, cout = (16 + j * 16 if j <= 3 else 16), 16
            w = bld.init((rng.standard_normal((cout, cin, 3, 3)) /
                          (3 * np.sqrt(cin))).astype(np.float32))
            y = bld.node("Conv", [feats, w], kernel_shape=[3, 3],
                         strides=[1, 1], pads=[1, 1, 1, 1])
            y = bld.node("LeakyRelu", [y], alpha=0.2)
            if j < 3:
                outs.append(y)
                feats = bld.node("Concat", [x] + outs, axis=1)
            else:
                feats = y
        roi = bld.init(np.zeros((0,), np.float32), "roi")
        sc = bld.init(np.array([1, 1, 2, 2], np.float32), "sc")
        up = bld.node("Resize", [y, roi, sc], mode="nearest",
                      coordinate_transformation_mode="asymmetric",
                      nearest_mode="floor")
        w5 = bld.init((rng.standard_normal((16, 16, 3, 3)) / 12)
                      .astype(np.float32))
        out = bld.node("Conv", [up, w5], kernel_shape=[3, 3],
                       strides=[1, 1], pads=[1, 1, 1, 1])
        g = bld.finish([out])
        import copy
        xv = rng.standard_normal((1, 16, 16, 128)).astype(np.float32)
        want = np.asarray(st.CompiledModel(copy.deepcopy(g), st.Config())(xv)[0])
        get_pass("pixel_conv_regions")(g)
        ops = [nd.op_type for nd in g.nodes]
        assert ops.count("PixelConv") == 9  # tail conv joins via the resize
        assert ops.count("PixelNearestUp") == 1
        assert "Resize" not in ops
        assert ops.count("Transpose") == 2  # one entry, one exit
        got = np.asarray(st.CompiledModel(g, st.Config())(xv)[0])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
