"""Full-int8 static quantization tests: calibration, graph rewrite,
per-layer error bounds, int8 chaining, percentile clipping."""

import numpy as np
import pytest

import smelter_tpu as st
from smelter_tpu.ir.build import GraphBuilder
from smelter_tpu.models import resnet50
from smelter_tpu.passes.pass_manager import run_passes
from smelter_tpu.quant import calibrate, quantize_static


def small_conv_graph(rng, layers=1):
    b = GraphBuilder("sq", opset=13)
    x = b.input("x", (2, 8, 16, 16))
    h = x
    cin = 8
    for i in range(layers):
        h = b.conv(h, rng.standard_normal((16, cin, 3, 3)).astype(np.float32) * 0.1,
                   pads=(1, 1, 1, 1))
        h = b.node("Relu", [h])
        cin = 16
    return b.finish([h])


class TestStaticQuant:
    def test_single_layer_error_bound(self, rng):
        g = small_conv_graph(rng, 1)
        calib = [(rng.standard_normal((2, 8, 16, 16)).astype(np.float32),)]
        amax = calibrate(g, calib)
        before = st.CompiledModel(g)(calib[0][0])[0]
        n = quantize_static(g, amax, min_elements=1)
        assert n == 1
        after = st.CompiledModel(g)(calib[0][0])[0]
        rel = np.abs(after - before).max() / np.abs(before).max()
        assert rel < 0.03, rel

    def test_chained_convs_stay_int8(self, rng):
        g = small_conv_graph(rng, 3)
        calib = [(rng.standard_normal((2, 8, 16, 16)).astype(np.float32),)]
        amax = calibrate(g, calib)
        quantize_static(g, amax, min_elements=1)
        ops = [n.op_type for n in g.nodes]
        # exactly one QuantizeLinear (entry) and one DequantizeLinear (exit)
        assert ops.count("QuantizeLinear") == 1
        assert ops.count("DequantizeLinear") == 1
        assert ops.count("QLinearConv") == 3

    def test_resnet_structure_and_bounded_error(self):
        g, tm, shape = resnet50.build(2, 64, layers=(1, 1, 1, 1), width=32,
                                      num_classes=50)
        run_passes(g)
        rng = np.random.default_rng(0)
        calib = [(rng.standard_normal(shape).astype(np.float32),)
                 for _ in range(2)]
        amax = calibrate(g, calib, percentile=99.9)
        before = st.CompiledModel(g)(calib[0][0])[0]
        n = quantize_static(g, amax)
        assert n >= 15
        assert g.metadata["quant"] == "int8-static"
        after = st.CompiledModel(g)(calib[0][0])[0]
        # random-weight nets compound per-layer int8 noise; the gate here is
        # structural correctness + a sane bound (real pretrained nets with
        # tight BN statistics land ~1% — docs/DESIGN.md)
        rel = np.abs(after - before).max() / np.abs(before).max()
        assert rel < 0.35, rel
        corr = np.corrcoef(after.ravel(), before.ravel())[0, 1]
        assert corr > 0.99, corr

    def test_serialization_roundtrip(self, rng):
        g = small_conv_graph(rng, 2)
        calib = [(rng.standard_normal((2, 8, 16, 16)).astype(np.float32),)]
        amax = calibrate(g, calib)
        quantize_static(g, amax, min_elements=1)
        g2 = st.import_model(st.export_model(g))
        x = calib[0][0]
        np.testing.assert_allclose(st.CompiledModel(g2)(x)[0],
                                   st.CompiledModel(g)(x)[0], rtol=1e-5)


class TestApiStaticQuant:
    def test_compile_int8_static(self, rng):
        g = small_conv_graph(rng, 2)
        calib = [(rng.standard_normal((2, 8, 16, 16)).astype(np.float32),)]
        before = st.CompiledModel(st.import_model(st.export_model(g)))(calib[0][0])[0]
        m = st.compile(g, quant="int8-static", layout="nchw",
                       calibration_data=calib)
        assert m.graph.metadata["quant"] == "int8-static"
        after = m(calib[0][0])[0]
        rel = np.abs(after - before).max() / np.abs(before).max()
        assert rel < 0.05, rel

    def test_compile_int8_static_without_calib_raises(self, rng):
        g = small_conv_graph(rng, 1)
        with pytest.raises(ValueError, match="calibration_data"):
            st.compile(g, quant="int8-static")


class TestInt8ResidualCarry:
    """_requantize_carries: a float residual fork (edge feeding both a
    QuantizeLinear and a later Add) is rewired so the carry rides int8
    (probe34d/e: ~2 ms of bf16 HBM traffic on ResNet-50 b128)."""

    def _residual_graph(self, rng):
        b = GraphBuilder("res", opset=13)
        x = b.input("x", (2, 8, 16, 16))
        w1 = rng.standard_normal((8, 8, 3, 3)).astype(np.float32) * 0.1
        w2 = rng.standard_normal((8, 8, 3, 3)).astype(np.float32) * 0.1
        h = b.conv(x, w1, pads=(1, 1, 1, 1))
        h = b.node("Relu", [h])            # carry edge: forks to conv + add
        c = b.conv(h, w2, pads=(1, 1, 1, 1))
        y = b.node("Add", [c, h])
        y = b.node("Relu", [y])
        return b.finish([y])

    def test_rewires_and_bounded_error(self, rng):
        g = self._residual_graph(rng)
        calib = [(rng.standard_normal((2, 8, 16, 16)).astype(np.float32),)]
        amax = calibrate(g, calib)
        before = st.CompiledModel(g)(calib[0][0])[0]
        quantize_static(g, amax, min_elements=1)
        adds = [n for n in g.nodes if n.op_type == "Add"]
        assert any("_c8" in i for n in adds for i in n.inputs), \
            [n.inputs for n in adds]
        after = st.CompiledModel(g)(calib[0][0])[0]
        rel = np.abs(after - before).max() / np.abs(before).max()
        assert rel < 0.06, rel

    def test_opt_out_keeps_float_carry(self, rng):
        g = self._residual_graph(rng)
        calib = [(rng.standard_normal((2, 8, 16, 16)).astype(np.float32),)]
        amax = calibrate(g, calib)
        quantize_static(g, amax, min_elements=1, int8_carry=False)
        adds = [n for n in g.nodes if n.op_type == "Add"]
        assert not any("_c8" in i for n in adds for i in n.inputs)
