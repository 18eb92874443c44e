"""Top-level API tests: st.compile / st.serve from a file path."""

import numpy as np
import pytest

import smelter_tpu as st
from smelter_tpu.models import mobilenet_v2


class TestApi:
    def test_compile_from_path_with_quant(self, tmp_path):
        g, tm, shape = mobilenet_v2.build(1, 96, width_mult=0.35, num_classes=10)
        p = tmp_path / "m.onnx"
        st.save_model(g, p)
        import torch
        m = st.compile(p, quant="int8")
        assert sum(1 for _ in m.graph.find_nodes("BatchNormalization")) == 0
        assert m.graph.metadata["quant"] == "int8"
        x = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
        got = m(x)[0]
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        assert (got.argmax(1) == want.argmax(1)).all()

    def test_serve_from_path(self, tmp_path):
        g, tm, shape = mobilenet_v2.build(1, 96, width_mult=0.35, num_classes=10)
        p = tmp_path / "m.onnx"
        st.save_model(g, p)
        srv = st.serve(p, max_batch=4)
        try:
            x = np.random.default_rng(1).standard_normal(shape[1:]).astype(np.float32)
            out = srv.infer(x)[0]
            assert out.shape == (10,)
        finally:
            srv.shutdown()


class TestInputRescale:
    def test_forced_bilinear_input_scale(self):
        """Reference parity: Configuration.inputConstraint forceInputScale
        (ONNXGraph.swift:222-240) — oversized inputs are resized into the
        graph's expected spatial dims before the body."""
        from smelter_tpu.models import mobilenet_v2

        g, tm, shape = mobilenet_v2.build(1, 96, width_mult=0.35, num_classes=10)
        m = st.CompiledModel(g, st.Config(input_scale="bilinear",
                                          input_size=(96, 96)))
        big = np.random.default_rng(0).standard_normal((1, 3, 192, 192)).astype(np.float32)
        out = m(big)[0]
        assert out.shape == (1, 10)
        # equivalent to resizing first, then running the plain model
        import jax
        small = np.asarray(jax.image.resize(big, (1, 3, 96, 96), "bilinear"))
        want = st.CompiledModel(g)(small)[0]
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)

    def test_lanczos_scale_runs(self):
        from smelter_tpu.models import mobilenet_v2

        g, tm, shape = mobilenet_v2.build(1, 96, width_mult=0.35, num_classes=10)
        m = st.CompiledModel(g, st.Config(input_scale="lanczos", input_size=(96, 96)))
        big = np.zeros((1, 3, 128, 128), np.float32)
        assert m(big)[0].shape == (1, 10)


class TestInt8ConvMode:
    def test_conv_only_quant(self):
        from smelter_tpu.models import vit

        g, tm, shape = vit.build(1, 32, patch=8, dim=64, depth=2, heads=4,
                                 num_classes=10)
        m = st.compile(g, quant="int8-conv", layout="nchw")
        # patch-embed conv quantized, transformer matmul weights untouched
        dq_feeds = {n.inputs[0] for n in m.graph.find_nodes("DequantizeLinear")}
        assert len(dq_feeds) == 1  # only the conv weight
        assert m.graph.metadata["quant"] == "int8-conv"
        x = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
        import torch
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        assert (m(x)[0].argmax(1) == want.argmax(1)).all()


class TestNormalize:
    def test_uint8_input_normalized_on_device(self):
        from smelter_tpu.models import mobilenet_v2
        from smelter_tpu.utils import dtypes as dt
        from smelter_tpu.ir.graph import TensorType

        g, tm, shape = mobilenet_v2.build(1, 96, width_mult=0.35, num_classes=10)
        # same graph, uint8-typed input
        g.inputs[0].type = TensorType(dt.UINT8, g.inputs[0].type.shape)
        mean = (0.485, 0.456, 0.406)
        std = (0.229, 0.224, 0.225)
        m = st.CompiledModel(g, st.Config(normalize=(mean, std)))
        img = np.random.default_rng(0).integers(0, 256, shape, dtype=np.uint8)
        got = m(img)[0]
        xf = (img.astype(np.float32) / 255.0
              - np.asarray(mean, np.float32).reshape(1, 3, 1, 1)) \
            / np.asarray(std, np.float32).reshape(1, 3, 1, 1)
        import torch
        with torch.no_grad():
            want = tm(torch.from_numpy(xf)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestInputValidation:
    def test_wrong_arity_clear_error(self):
        from smelter_tpu.models import mobilenet_v2

        g, _, shape = mobilenet_v2.build(1, 96, width_mult=0.35, num_classes=10)
        m = st.CompiledModel(g)
        with pytest.raises(TypeError, match="expects 1 input"):
            m(np.zeros(shape, np.float32), np.zeros((1,), np.float32))
        with pytest.raises(TypeError, match="expects 1 input"):
            m()
