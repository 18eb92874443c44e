"""Whole-model differential tests: zoo models (scaled for CPU CI) through
export -> protobuf roundtrip -> compile -> run, vs the torch reference
(SURVEY.md §4b strategy; the five BASELINE.json configs)."""

import numpy as np
import pytest
import torch

import smelter_tpu as st
from smelter_tpu.models import esrgan, mobilenet_v2, resnet50, unet, vit


def check_model(g, tm, shape, atol=1e-5, rtol=1e-4):
    g = st.import_model(st.export_model(g))  # exercise serialization
    m = st.CompiledModel(g)
    x = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
    got = m(x)[0]
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=atol, rtol=rtol)
    return got, want


class TestZooParity:
    def test_mobilenet_v2(self):
        g, tm, shape = mobilenet_v2.build(1, 96, width_mult=0.35, num_classes=10)
        check_model(g, tm, shape, atol=1e-4)

    def test_resnet(self):
        g, tm, shape = resnet50.build(1, 64, layers=(1, 1, 1, 1), width=16,
                                      num_classes=10)
        check_model(g, tm, shape, atol=1e-4)

    def test_unet(self):
        g, tm, shape = unet.build(1, 64, base=8, num_classes=3)
        check_model(g, tm, shape, atol=1e-4)

    def test_esrgan(self):
        g, tm, shape = esrgan.build(1, 24, nf=16, nb=1, scale=4)
        got, _ = check_model(g, tm, shape, atol=1e-4)
        assert got.shape == (1, 3, 96, 96)  # 4x upsampled

    def test_vit(self):
        g, tm, shape = vit.build(1, 32, patch=8, dim=64, depth=2, heads=4,
                                 num_classes=10)
        check_model(g, tm, shape, atol=1e-4)

    def test_batched(self):
        g, tm, shape = resnet50.build(4, 64, layers=(1, 1, 1, 1), width=16,
                                      num_classes=10)
        check_model(g, tm, shape, atol=1e-4)


class TestModelStructure:
    def test_mobilenet_has_depthwise(self):
        g, _, _ = mobilenet_v2.build(1, 96, width_mult=0.35)
        assert any(n.attr("group", 1) > 1 for n in g.find_nodes("Conv"))

    def test_unet_has_concat_upsample(self):
        g, _, _ = unet.build(1, 64, base=8)
        assert sum(1 for _ in g.find_nodes("Concat")) == 4
        assert sum(1 for _ in g.find_nodes("Resize")) == 4

    def test_vit_has_attention_ops(self):
        g, _, _ = vit.build(1, 32, patch=8, dim=64, depth=2, heads=4)
        assert sum(1 for _ in g.find_nodes("MatMul")) >= 2 * 4  # qk, av + mlp
        assert sum(1 for _ in g.find_nodes("Softmax")) == 2
        assert sum(1 for _ in g.find_nodes("LayerNormalization")) == 5


class TestComputeDtypePolicy:
    def test_no_f32_promotion_under_bf16(self):
        """Regression guard for the probe5 finding: f32 params entering
        Concat/Add must not promote downstream activations to f32."""
        import jax.numpy as jnp
        from smelter_tpu.runtime.executor import Executor

        g, tm, shape = vit.build(1, 32, patch=8, dim=64, depth=1, heads=4,
                                 num_classes=10)
        ex = Executor(g, st.Config(compute_dtype="bfloat16"))
        types = ex.infer_value_types()
        # every float activation after the patch embed should be bf16
        from smelter_tpu.utils import dtypes as dt
        f32_edges = [n for n, t in types.items()
                     if t.dtype == dt.FLOAT and n not in g.initializers
                     and len(t.shape) >= 3]
        assert not f32_edges, f"f32 activations leaked: {f32_edges[:5]}"


class TestMultiOutput:
    def test_multi_output_model(self):
        """The reference rejects multi-output graphs (ONNXGraph.swift:178-180);
        we support them end to end."""
        import torch.nn as nn

        class TwoHeads(nn.Module):
            def __init__(self):
                super().__init__()
                self.backbone = nn.Conv2d(3, 8, 3, padding=1)
                self.head_a = nn.Conv2d(8, 4, 1)
                self.head_b = nn.Conv2d(8, 2, 1)

            def forward(self, x):
                h = torch.relu(self.backbone(x))
                return self.head_a(h), self.head_b(h)

        from smelter_tpu.frontend.torch_export import export_torch

        torch.manual_seed(0)
        tm = TwoHeads().eval()
        x = np.random.default_rng(0).standard_normal((1, 3, 16, 16)).astype(np.float32)
        g = export_torch(tm, torch.from_numpy(x), "two")
        g = st.import_model(st.export_model(g))
        assert len(g.outputs) == 2
        outs = st.CompiledModel(g)(x)
        with torch.no_grad():
            wa, wb = tm(torch.from_numpy(x))
        np.testing.assert_allclose(outs[0], wa.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(outs[1], wb.numpy(), rtol=1e-4, atol=1e-5)


class TestRetinaFPN:
    def test_parity_and_structure(self):
        from smelter_tpu.models import retina_fpn

        g, tm, shape = retina_fpn.build(1, 64, num_classes=5, width=8)
        g = st.import_model(st.export_model(g))
        assert len(g.outputs) == 6  # 3 levels x (cls, box)
        m = st.CompiledModel(g)
        x = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
        outs = m(x)
        with torch.no_grad():
            wants = tm(torch.from_numpy(x))
        for got, want in zip(outs, wants):
            np.testing.assert_allclose(got, want.numpy(), rtol=1e-3, atol=1e-4)

    def test_full_pipeline_int8(self):
        from smelter_tpu.models import retina_fpn

        g, tm, shape = retina_fpn.build(1, 64, num_classes=5, width=8)
        m = st.compile(g, quant="int8")
        x = np.random.default_rng(1).standard_normal(shape).astype(np.float32)
        outs = m(x)
        with torch.no_grad():
            wants = tm(torch.from_numpy(x))
        # box deltas on the finest level track the reference
        got = outs[1]
        want = wants[1].numpy()
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 0.1, rel


class TestMobileNetV3:
    def test_se_blocks_full_pipeline(self):
        """SE squeeze (ReduceMean keepdims) stays NHWC — no layout barriers
        inside the network (2 boundary transposes only)."""
        from smelter_tpu.models import mobilenet_v3

        g, tm, shape = mobilenet_v3.build(1, 96, width=0.5, num_classes=10)
        x = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        got = st.CompiledModel(g)(x)[0]
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
        m = st.compile(st.import_model(st.export_model(g)), quant="int8")
        assert sum(1 for _ in m.graph.find_nodes("Transpose")) == 2
        assert (m(x)[0].argmax(1) == want.argmax(1)).all()


class TestTextLSTM:
    @pytest.mark.parametrize("bidi", [False, True])
    def test_parity(self, bidi):
        from smelter_tpu.models import text_lstm

        g, tm, shape = text_lstm.build(seq_len=12, batch=3, vocab=50, dim=16,
                                       hidden=24, num_classes=4,
                                       bidirectional=bidi)
        g = st.import_model(st.export_model(g))
        tokens = np.random.default_rng(0).integers(0, 50, shape).astype(np.int64)
        got = st.CompiledModel(g)(tokens)[0]
        with torch.no_grad():
            want = tm(torch.from_numpy(tokens)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestAudioKWS:
    def test_parity(self):
        """Raw PCM in, logits out: frontend (STFT/mel on-graph) + DS-CNN vs
        the torch.stft reference."""
        from smelter_tpu.models import audio_kws

        g, tm, shape = audio_kws.build(batch=2, samples=4000, channels=16,
                                       blocks=2)
        g = st.import_model(st.export_model(g))
        x = (np.random.default_rng(0).standard_normal(shape) * 0.1).astype(np.float32)
        got = st.CompiledModel(g)(x)[0]
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_full_pipeline_int8(self):
        """Frontend constants fold (windows/mel eaten), conv stack survives
        BN fusion + NHWC layout + int8 weight quantization."""
        from smelter_tpu.models import audio_kws

        g, tm, shape = audio_kws.build(batch=1, samples=4000, channels=16,
                                       blocks=2)
        x = (np.random.default_rng(1).standard_normal(shape) * 0.1).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        m = st.compile(g, quant="int8")
        assert not any(n.op_type in ("HannWindow", "MelWeightMatrix")
                       for n in m.graph.nodes), "frontend constants should fold"
        got = m(x)[0]
        assert (got.argmax(1) == want.argmax(1)).all()
        corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
        assert corr > 0.999, corr


class TestSpeechEncoder:
    def test_parity(self):
        """Whisper-style conv-subsample + pre-LN transformer over log-mel
        frames, through the fx exporter (rank-3 Conv + MHA + GELU)."""
        from smelter_tpu.models import speech_encoder

        g, tm, shape = speech_encoder.build(batch=2, frames=50, dim=64,
                                            heads=4, depth=2)
        g = st.import_model(st.export_model(g))
        x = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
        got = st.CompiledModel(g)(x)[0]
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        assert got.shape == (2, 25, 64)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_bf16_pipeline(self):
        from smelter_tpu.models import speech_encoder

        g, tm, shape = speech_encoder.build(batch=1, frames=50, dim=64,
                                            heads=4, depth=2)
        x = np.random.default_rng(1).standard_normal(shape).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        m = st.compile(g, st.Config(compute_dtype="bfloat16"))
        got = m(x)[0].astype(np.float32)
        corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
        assert corr > 0.999, corr


class TestConvNeXt:
    def test_parity_and_structure(self):
        from smelter_tpu.models import convnext

        g, tm, shape = convnext.build(batch=1, image_size=64, num_classes=10,
                                      dims=(32, 64), depths=(2, 2))
        ops = {n.op_type for n in g.nodes}
        assert "LayerNormalization" in ops and "Gelu" in ops
        # depthwise 7x7: a Conv with group == channels
        assert any(n.op_type == "Conv" and n.attr("group", 1) > 1
                   for n in g.nodes)
        check_model(g, tm, shape, atol=1e-4)

    def test_int8_pipeline(self):
        import smelter_tpu as st
        from smelter_tpu.models import convnext

        g, tm, shape = convnext.build(batch=1, image_size=64, num_classes=10,
                                      dims=(32, 64), depths=(2, 2))
        m = st.compile(g, quant="int8")
        x = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
        got = m(x)[0]
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        assert np.argmax(got) == np.argmax(want)
