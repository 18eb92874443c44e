"""MXU output-pixel packing tests (passes/mxu_packing.py): the
Conv3x3/s1/p1 -> Conv4x4/s2 + DepthToSpace rewrite must be
numerics-preserving, and its perf gates (C_out, stride, padding, odd
spatial extents) must leave non-qualifying convs untouched."""

import numpy as np
import torch
import torch.nn as nn

import smelter_tpu as st
from smelter_tpu.frontend.torch_export import export_torch
from smelter_tpu.passes import mxu_packing
from smelter_tpu.passes.pass_manager import run_passes


def outputs_of(g, *x):
    return st.CompiledModel(g)(*x)[0]


def clone(g):
    return st.import_model(st.export_model(g))


def _rewrite(g):
    return run_passes(clone(g), ["pack_conv_output", "dce"])


def _check(tm, shape, packed):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float32)
    g = export_torch(tm, torch.from_numpy(x), "t")
    before = outputs_of(g, x)
    g2 = _rewrite(g)
    n_d2s = sum(1 for _ in g2.find_nodes("DepthToSpace"))
    assert n_d2s == packed
    after = outputs_of(g2, x)
    np.testing.assert_allclose(after, before, rtol=1e-4, atol=1e-5)
    return g2


class _ConvNet(nn.Module):
    def __init__(self, c_in, c_out, bias=True, stride=1, k=3, pad=1):
        super().__init__()
        self.c = nn.Conv2d(c_in, c_out, k, stride=stride, padding=pad,
                           bias=bias)

    def forward(self, x):
        return self.c(x)


class TestPackConvOutput:
    def test_packed_numerics(self):
        torch.manual_seed(0)
        g2 = _check(_ConvNet(8, 16).eval(), (2, 8, 8, 12), packed=1)
        conv = next(g2.find_nodes("Conv"))
        assert list(conv.attr("kernel_shape")) == [4, 4]
        assert list(conv.attr("strides")) == [2, 2]

    def test_packed_no_bias(self):
        torch.manual_seed(1)
        _check(_ConvNet(4, 32, bias=False).eval(), (1, 4, 6, 6), packed=1)

    def test_chain_then_relu(self):
        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.a = nn.Conv2d(4, 8, 3, padding=1)
                self.b = nn.Conv2d(8, 16, 3, padding=1)

            def forward(self, x):
                return torch.relu(self.b(torch.relu(self.a(x))))

        torch.manual_seed(2)
        _check(M().eval(), (1, 4, 10, 10), packed=2)

    def test_large_cout_gated(self):
        # probe23: packing regresses at C_out=64 (0.69-0.92x) — gate holds
        torch.manual_seed(3)
        _check(_ConvNet(8, 64).eval(), (1, 8, 8, 8), packed=0)

    def test_strided_untouched(self):
        torch.manual_seed(4)
        _check(_ConvNet(4, 8, stride=2).eval(), (1, 4, 8, 8), packed=0)

    def test_odd_spatial_untouched(self):
        torch.manual_seed(5)
        _check(_ConvNet(4, 8).eval(), (1, 4, 7, 9), packed=0)

    def test_1x1_untouched(self):
        torch.manual_seed(6)
        _check(_ConvNet(4, 8, k=1, pad=0).eval(), (1, 4, 8, 8), packed=0)

    def test_gate_override(self, monkeypatch):
        monkeypatch.setattr(mxu_packing, "_PACK_MAX_COUT", 64)
        torch.manual_seed(7)
        _check(_ConvNet(8, 64).eval(), (1, 8, 8, 8), packed=1)
