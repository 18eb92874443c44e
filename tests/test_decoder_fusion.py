"""Decoder-chain rewrite tests (passes/decoder_fusion.py): concat-conv
weight splitting and nearest-2x subpixel fusion, each asserted
numerics-preserving against the unrewritten graph, plus end-to-end parity
on the ESRGAN and U-Net zoo models whose hot paths they target."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import pytest

import smelter_tpu as st
from smelter_tpu.frontend.torch_export import export_torch
from smelter_tpu.passes import decoder_fusion
from smelter_tpu.passes.pass_manager import run_passes


def outputs_of(g, *x):
    return st.CompiledModel(g)(*x)[0]


def clone(g):
    return st.import_model(st.export_model(g))


def rewrite(g, *names):
    return run_passes(clone(g), list(names) + ["dce"])


class TestSplitConcatConv:
    def _check(self, tm, shapes, want_concats=0, **conv_counts):
        rng = np.random.default_rng(0)
        xs = [rng.standard_normal(s).astype(np.float32) for s in shapes]
        g = export_torch(tm, tuple(torch.from_numpy(x) for x in xs), "t")
        before = outputs_of(g, *xs)
        g2 = rewrite(g, "split_concat_conv")
        after = outputs_of(g2, *xs)
        assert sum(1 for _ in g2.find_nodes("Concat")) == want_concats
        np.testing.assert_allclose(after, before, rtol=1e-4, atol=1e-5)
        return g2

    def test_two_way(self):
        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.c = nn.Conv2d(12, 8, 3, padding=1)

            def forward(self, a, b):
                return self.c(torch.cat([a, b], 1))

        torch.manual_seed(0)
        g2 = self._check(M().eval(), [(2, 4, 8, 8), (2, 8, 8, 8)])
        assert sum(1 for _ in g2.find_nodes("Conv")) == 2
        assert sum(1 for _ in g2.find_nodes("Sum")) == 1

    def test_five_way_strided(self):
        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.c = nn.Conv2d(20, 6, 3, stride=2, padding=1)

            def forward(self, a, b, c, d, e):
                return self.c(torch.cat([a, b, c, d, e], 1))

        torch.manual_seed(1)
        g2 = self._check(M().eval(), [(1, 4, 9, 9)] * 5)
        assert sum(1 for _ in g2.find_nodes("Conv")) == 5

    def test_concat_with_other_consumer_kept(self):
        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.c = nn.Conv2d(8, 4, 1)

            def forward(self, a, b):
                cat = torch.cat([a, b], 1)
                return self.c(cat) + cat.sum()

        torch.manual_seed(2)
        self._check(M().eval(), [(1, 4, 4, 4), (1, 4, 4, 4)],
                    want_concats=1)

    def test_grouped_conv_untouched(self):
        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.c = nn.Conv2d(8, 8, 3, padding=1, groups=2)

            def forward(self, a, b):
                return self.c(torch.cat([a, b], 1))

        torch.manual_seed(3)
        self._check(M().eval(), [(1, 4, 6, 6), (1, 4, 6, 6)],
                    want_concats=1)


class TestSubpixelUpsampleConv:
    @pytest.fixture(autouse=True)
    def _ungate(self, monkeypatch):
        # the C_in>=128 perf gate (measured on v5e, tpu_probe19/20) would
        # skip these tiny unit graphs; lift it so the transform itself is
        # exercised. test_small_channels_gated covers the gate.
        monkeypatch.setattr(decoder_fusion, "_SUBPIXEL_MIN_CIN", 0)

    def _check(self, tm, shape, resizes_left=0):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(shape).astype(np.float32)
        g = export_torch(tm, torch.from_numpy(x), "t")
        before = outputs_of(g, x)
        g2 = rewrite(g, "subpixel_upsample_conv")
        after = outputs_of(g2, x)
        n_rs = sum(1 for _ in g2.find_nodes("Resize")) + sum(
            1 for _ in g2.find_nodes("Upsample"))
        assert n_rs == resizes_left
        np.testing.assert_allclose(after, before, rtol=1e-4, atol=1e-5)
        return g2

    def test_nearest_conv3x3(self):
        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.c = nn.Conv2d(6, 10, 3, padding=1)

            def forward(self, x):
                return self.c(F.interpolate(x, scale_factor=2,
                                            mode="nearest"))

        torch.manual_seed(0)
        g2 = self._check(M().eval(), (2, 6, 7, 9))
        assert sum(1 for _ in g2.find_nodes("Conv")) == 4
        assert sum(1 for _ in g2.find_nodes("DepthToSpace")) == 1

    def test_nearest_conv3x3_nobias(self):
        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.c = nn.Conv2d(4, 4, 3, padding=1, bias=False)

            def forward(self, x):
                return self.c(F.interpolate(x, scale_factor=2,
                                            mode="nearest"))

        torch.manual_seed(1)
        self._check(M().eval(), (1, 4, 5, 5))

    def test_nearest_conv1x1_reordered(self):
        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.c = nn.Conv2d(6, 3, 1)

            def forward(self, x):
                return self.c(F.interpolate(x, scale_factor=2,
                                            mode="nearest"))

        torch.manual_seed(2)
        # resize survives but now follows the conv (runs at low res)
        g2 = self._check(M().eval(), (1, 6, 8, 8), resizes_left=1)
        conv = next(g2.find_nodes("Conv"))
        rs = next(g2.find_nodes("Resize"))
        assert rs.inputs[0] == conv.outputs[0]

    def test_bilinear_untouched(self):
        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.c = nn.Conv2d(4, 4, 3, padding=1)

            def forward(self, x):
                return self.c(F.interpolate(x, scale_factor=2,
                                            mode="bilinear",
                                            align_corners=True))

        torch.manual_seed(3)
        self._check(M().eval(), (1, 4, 6, 6), resizes_left=1)

    def test_small_channels_gated(self, monkeypatch):
        # below the measured break-even C_in the pass must leave the
        # graph alone (broadcast-upsample + fused conv wins on TPU)
        monkeypatch.setattr(decoder_fusion, "_SUBPIXEL_MIN_CIN", 128)

        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.c = nn.Conv2d(6, 10, 3, padding=1)

            def forward(self, x):
                return self.c(F.interpolate(x, scale_factor=2,
                                            mode="nearest"))

        torch.manual_seed(0)
        g2 = self._check(M().eval(), (2, 6, 7, 9), resizes_left=1)
        assert sum(1 for _ in g2.find_nodes("DepthToSpace")) == 0

    def test_strided_conv_untouched(self):
        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.c = nn.Conv2d(4, 4, 3, stride=2, padding=1)

            def forward(self, x):
                return self.c(F.interpolate(x, scale_factor=2,
                                            mode="nearest"))

        torch.manual_seed(4)
        self._check(M().eval(), (1, 4, 6, 6), resizes_left=1)


class TestEndToEnd:
    # split_concat_conv is opt-in (tpu_probe22/23: the split parts'
    # small C_in pads worse on the MXU than the fused concat GEMM), so
    # the split assertions run it via an explicit pipeline.
    _SPLIT_PIPELINE = ["eliminate_nops", "fold_constants", "fuse_pad_conv",
                       "fuse_bn_conv", "split_concat_conv",
                       "subpixel_upsample_conv", "fold_constants",
                       "eliminate_nops", "dce"]

    def test_esrgan_split_pipeline(self, monkeypatch):
        from smelter_tpu.models import esrgan

        # lift the C_in perf gate so the subpixel tail fires on this
        # shrunk (nf=16) fixture; at real nf=64 the gate keeps the
        # broadcast-upsample form, which probe20 measured faster there
        monkeypatch.setattr(decoder_fusion, "_SUBPIXEL_MIN_CIN", 0)
        g, tm, shape = esrgan.build(batch=1, image_size=16, nf=16, nb=1)
        rng = np.random.default_rng(0)
        x = rng.standard_normal(shape).astype(np.float32)
        before = outputs_of(clone(g), x)
        g2 = run_passes(clone(g), self._SPLIT_PIPELINE)
        # every dense-block concat is split away; the nearest-2x tail convs
        # are subpixel-decomposed (leaving only the two interleave concats
        # that feed DepthToSpace)
        assert sum(1 for _ in g2.find_nodes("Resize")) == 0
        assert sum(1 for _ in g2.find_nodes("DepthToSpace")) == 2
        cats = list(g2.find_nodes("Concat"))
        assert len(cats) == 2 and all(
            c.outputs[0].endswith("_spcat") for c in cats)
        after = outputs_of(g2, x)
        np.testing.assert_allclose(after, before, rtol=1e-3, atol=1e-4)

    def test_esrgan_default_pipeline_keeps_concats(self):
        from smelter_tpu.models import esrgan

        g, tm, shape = esrgan.build(batch=1, image_size=16, nf=16, nb=1)
        n_cat = sum(1 for _ in g.find_nodes("Concat"))
        g2 = run_passes(clone(g))
        # default pipeline must NOT split dense-block concats (probe22:
        # the split costs ESRGAN ~19% on v5e)
        assert sum(1 for _ in g2.find_nodes("Concat")) == n_cat
        rng = np.random.default_rng(0)
        x = rng.standard_normal(shape).astype(np.float32)
        np.testing.assert_allclose(outputs_of(g2, x), outputs_of(clone(g), x),
                                   rtol=1e-3, atol=1e-4)

    def test_unet_split_pipeline(self):
        from smelter_tpu.models import unet

        g, tm, shape = unet.build(batch=1, image_size=32)
        rng = np.random.default_rng(0)
        x = rng.standard_normal(shape).astype(np.float32)
        before = outputs_of(clone(g), x)
        g2 = run_passes(clone(g), self._SPLIT_PIPELINE)
        # decoder concats split; bilinear upsamples must survive
        assert sum(1 for _ in g2.find_nodes("Concat")) == 0
        assert sum(1 for _ in g2.find_nodes("Resize")) == 4
        after = outputs_of(g2, x)
        np.testing.assert_allclose(after, before, rtol=1e-3, atol=1e-4)
