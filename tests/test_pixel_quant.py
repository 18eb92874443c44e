"""quantize_pixel_regions (quant/pixel_quant.py): calibrated int8 rewrite
of NHCW pixel-conv regions, and the quant='int8-pixel' compile path.
Kernels run in interpret mode on CPU. Covers region formation, requant
routing, dequant twins, per-(edge, scale) entry quantization for shared
entries across disjoint regions, and exclusion of requant=0 outputs from
the region scale."""

import copy

import numpy as np
import pytest

import smelter_tpu as st
import smelter_tpu.passes.pixel_regions  # noqa: F401 (pass registration)
from smelter_tpu.ir.build import GraphBuilder
from smelter_tpu.passes.pass_manager import get_pass
from smelter_tpu.quant import calibrate, quantize_pixel_regions


def _dense_block_graph(b=1, nf=16, gc=16, hw=128, blocks=2):
    """ESRGAN-style dense blocks (same shape as test_pixel_regions)."""
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


def _trunk_graph(bld, x, rng, n_convs=8, nf=16):
    """A plain chain of n_convs 3x3 convs + LeakyRelu on (*, nf, H, W).
    Weights carry a variance-preserving gain (1/0.72 undoes LeakyRelu's
    std shrink) so activation magnitudes stay stationary along the chain —
    the regime real SR trunks live in, and the one the shared REGION scale
    is designed for (a contracting chain would starve deep layers of int8
    levels by construction)."""
    y = x
    for _ in range(n_convs):
        w = bld.init((rng.standard_normal((nf, nf, 3, 3)) /
                      (3 * np.sqrt(nf) * 0.72)).astype(np.float32))
        y = bld.node("Conv", [y, w], kernel_shape=[3, 3], strides=[1, 1],
                     pads=[1, 1, 1, 1])
        y = bld.node("LeakyRelu", [y], alpha=0.2)
    return y


class TestPixelQuantRewrite:
    def test_dense_block_parity_and_structure(self):
        g, shape = _dense_block_graph()
        x = np.random.default_rng(1).standard_normal(shape).astype(
            np.float32) * 0.5
        want = np.asarray(
            st.CompiledModel(copy.deepcopy(g), st.Config())(x)[0])
        assert get_pass("pixel_conv_regions")(g) == 8
        amax = calibrate(g, [(x,)])
        assert quantize_pixel_regions(g, amax) == 8
        ops = [nd.op_type for nd in g.nodes]
        assert ops.count("PixelConvQ") == 8 and "PixelConv" not in ops
        # concat-feeding convs requantize in-register (3 per block); the
        # block-final convs feed only the float residual Mul -> requant=0,
        # returning floats directly with no dequant roundtrip
        qnodes = list(g.find_nodes("PixelConvQ"))
        req = [nd.attr("requant", 0) for nd in qnodes]
        assert sum(req) == 6 and len(req) == 8
        assert ops.count("DequantizeLinear") == 0
        # one memoized entry QuantizeLinear per region entry edge
        assert ops.count("QuantizeLinear") >= 1
        assert g.metadata["quant"] == "int8-pixel"
        got = np.asarray(st.CompiledModel(g, st.Config())(x)[0])
        # int8 grid: compare with a quantization-sized tolerance
        err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
        assert err < 0.05, err

    def test_compile_path_int8_pixel(self):
        g, shape = _dense_block_graph()
        x = np.random.default_rng(2).standard_normal(shape).astype(
            np.float32) * 0.5
        want = np.asarray(
            st.CompiledModel(copy.deepcopy(g), st.Config())(x)[0])
        m = st.compile(copy.deepcopy(g), st.Config(), quant="int8-pixel",
                       calibration_data=[(x,)])
        assert any(nd.op_type == "PixelConvQ" for nd in m.graph.nodes)
        got = np.asarray(m(x)[0])
        err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
        assert err < 0.05, err

    def test_compile_path_requires_calibration_data(self):
        g, _ = _dense_block_graph()
        with pytest.raises(ValueError, match="calibration_data"):
            st.compile(g, st.Config(), quant="int8-pixel")

    def test_shared_entry_two_regions_distinct_scales(self):
        """ADVICE r2 (medium): one float edge feeding two DISJOINT pixel
        regions with very different activation ranges must be quantized
        once per region scale — a single shared QuantizeLinear would make
        one branch come back wrong by s2/s1."""
        rng = np.random.default_rng(3)
        bld = GraphBuilder("g", opset=13)
        x = bld.input("x", (1, 16, 16, 128))
        # two independent 8-conv trunks off the same entry edge; scale one
        # branch's weights up so the branches calibrate to different amax
        y1 = _trunk_graph(bld, x, rng, n_convs=8)
        y2 = x
        for i in range(8):
            w = bld.init((rng.standard_normal((16, 16, 3, 3)) /
                          (3 * np.sqrt(16) * 0.72) * (2.0 if i == 0 else 1.0))
                         .astype(np.float32))
            y2 = bld.node("Conv", [y2, w], kernel_shape=[3, 3],
                          strides=[1, 1], pads=[1, 1, 1, 1])
            y2 = bld.node("LeakyRelu", [y2], alpha=0.2)
        out = bld.node("Add", [y1, y2])
        g = bld.finish([out])
        xv = rng.standard_normal((1, 16, 16, 128)).astype(np.float32) * 0.5
        want = np.asarray(
            st.CompiledModel(copy.deepcopy(g), st.Config())(xv)[0])
        assert get_pass("pixel_conv_regions")(g) == 16
        amax = calibrate(g, [(xv,)])
        assert quantize_pixel_regions(g, amax) == 16
        # the shared entry edge (the region-entry transpose output) must be
        # quantized once PER region: two QuantizeLinear nodes with distinct
        # scales over the same float input edge
        qls = [nd for nd in g.find_nodes("QuantizeLinear")]
        by_src: dict[str, list] = {}
        for nd in qls:
            by_src.setdefault(nd.inputs[0], []).append(nd)
        shared = [nds for nds in by_src.values() if len(nds) == 2]
        assert shared, "entry edge was not twinned per region"
        s0, s1 = (float(g.initializers[nd.inputs[1]]) for nd in shared[0])
        assert s0 != s1
        got = np.asarray(st.CompiledModel(g, st.Config())(xv)[0])
        # 8-deep int8 chain with a 2x entry-grid mismatch: inherent noise
        # ~8%; WITHOUT per-(edge, scale) twinning the branch comes back
        # wrong by s2/s1=2x (err ~1.0), so 0.12 cleanly discriminates.
        err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
        assert err < 0.12, err

    def test_requant0_output_excluded_from_scale(self):
        """ADVICE r2 (low): the final conv's float output (requant=0) never
        lives on the int8 grid — a huge amax there must not coarsen the
        region scale, and a MISSING amax there must not skip the region."""
        rng = np.random.default_rng(4)
        bld = GraphBuilder("g", opset=13)
        x = bld.input("x", (1, 16, 16, 128))
        y = _trunk_graph(bld, x, rng, n_convs=8)
        g = bld.finish([y])
        xv = rng.standard_normal((1, 16, 16, 128)).astype(np.float32) * 0.5
        assert get_pass("pixel_conv_regions")(g) == 8
        amax = calibrate(g, [(xv,)])
        # find the final PixelConv's output edge (graph output side)
        final_out = None
        for nd in g.nodes:
            if nd.op_type == "PixelConv":
                consumers = [m for m in g.nodes
                             if nd.outputs[0] in m.inputs]
                if all(m.op_type not in ("PixelConv", "Concat",
                                         "PixelNearestUp")
                       for m in consumers):
                    final_out = nd.outputs[0]
        assert final_out is not None
        base = copy.deepcopy(g)
        base_amax = dict(amax)

        # (a) huge amax on the requant=0 output must not change the scale
        g1 = copy.deepcopy(base)
        a1 = dict(base_amax)
        a1[final_out] = 1e6
        assert quantize_pixel_regions(g1, a1) == 8
        g2 = copy.deepcopy(base)
        assert quantize_pixel_regions(g2, dict(base_amax)) == 8
        s1 = sorted(float(g1.initializers[nd.inputs[1]])
                    for nd in g1.find_nodes("QuantizeLinear"))
        s2 = sorted(float(g2.initializers[nd.inputs[1]])
                    for nd in g2.find_nodes("QuantizeLinear"))
        np.testing.assert_allclose(s1, s2)

        # (b) missing amax on the requant=0 output must not skip the region
        g3 = copy.deepcopy(base)
        a3 = dict(base_amax)
        a3.pop(final_out)
        assert quantize_pixel_regions(g3, a3) == 8

        # (c) missing amax on an INTERIOR edge must skip (never guess)
        g4 = copy.deepcopy(base)
        interior = next(nd.inputs[0] for nd in g4.nodes
                        if nd.op_type == "PixelConv"
                        and nd.inputs[0] in {m.outputs[0] for m in g4.nodes})
        a4 = dict(base_amax)
        a4.pop(interior)
        assert quantize_pixel_regions(g4, a4) == 0

    def test_dequant_twin_for_mixed_consumers(self):
        """A conv output consumed by BOTH a region conv (int8 chain) and a
        float op (residual Add) requantizes in-register and the float
        consumer reads a DequantizeLinear twin on the same int8 grid."""
        rng = np.random.default_rng(5)
        bld = GraphBuilder("g", opset=13)
        x = bld.input("x", (1, 16, 16, 128))
        mid = _trunk_graph(bld, x, rng, n_convs=4)
        tail = _trunk_graph(bld, mid, rng, n_convs=4)
        out = bld.node("Add", [mid, tail])  # mid: conv + float consumer
        g = bld.finish([out])
        xv = rng.standard_normal((1, 16, 16, 128)).astype(np.float32) * 0.5
        want = np.asarray(
            st.CompiledModel(copy.deepcopy(g), st.Config())(xv)[0])
        assert get_pass("pixel_conv_regions")(g) == 8
        amax = calibrate(g, [(xv,)])
        assert quantize_pixel_regions(g, amax) == 8
        ops = [nd.op_type for nd in g.nodes]
        assert ops.count("DequantizeLinear") == 1
        dq = next(g.find_nodes("DequantizeLinear"))
        add = next(g.find_nodes("Add"))
        assert dq.outputs[0] in add.inputs
        got = np.asarray(st.CompiledModel(g, st.Config())(xv)[0])
        err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
        assert err < 0.05, err

    def test_uncalibrated_graph_noop(self):
        g, shape = _dense_block_graph()
        get_pass("pixel_conv_regions")(g)
        before = [nd.op_type for nd in g.nodes]
        assert quantize_pixel_regions(g, {}) == 0
        assert [nd.op_type for nd in g.nodes] == before
