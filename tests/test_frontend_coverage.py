"""Exporter module coverage: every supported nn.Module type through
export -> engine vs torch."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import smelter_tpu as st
from smelter_tpu.frontend.torch_export import export_torch

CASES = [
    ("conv_transpose", nn.Sequential(nn.ConvTranspose2d(3, 6, 3, stride=2,
                                       output_padding=1)), (1, 3, 8, 8)),
    ("groupnorm", nn.Sequential(nn.Conv2d(3, 8, 1), nn.GroupNorm(4, 8)), (1, 3, 6, 6)),
    ("instancenorm", nn.Sequential(nn.Conv2d(3, 8, 1), nn.InstanceNorm2d(8, affine=True)), (1, 3, 6, 6)),
    ("prelu", nn.Sequential(nn.Conv2d(3, 4, 1), nn.PReLU(4)), (1, 3, 5, 5)),
    ("elu", nn.ELU(alpha=0.7), (2, 7)),
    ("hardswish", nn.Hardswish(), (2, 7)),
    ("hardsigmoid", nn.Hardsigmoid(), (2, 7)),
    ("softmax_mod", nn.Softmax(dim=-1), (2, 9)),
    ("avgpool_ceil", nn.AvgPool2d(3, 2, 1, ceil_mode=True), (1, 2, 9, 9)),
    ("maxpool_dil", nn.MaxPool2d(3, 2, 1, dilation=1), (1, 2, 9, 9)),
    ("pixelshuffle", nn.Sequential(nn.Conv2d(3, 8, 1), nn.PixelShuffle(2)), (1, 3, 4, 4)),
    ("upsample_nearest", nn.Upsample(scale_factor=2, mode="nearest"), (1, 2, 4, 4)),
    ("upsample_bilinear", nn.Upsample(scale_factor=2, mode="bilinear", align_corners=False), (1, 2, 4, 4)),
    ("zeropad", nn.Sequential(nn.ZeroPad2d((1, 2, 3, 0)), nn.Conv2d(2, 2, 1)), (1, 2, 4, 4)),
    ("silu", nn.SiLU(), (3, 6)),
    ("gelu_tanh", nn.GELU(approximate="tanh"), (3, 6)),
    ("leaky", nn.LeakyReLU(0.3), (3, 6)),
    ("selu", nn.SELU(), (3, 6)),
    ("embedding", None, None),  # special-cased below
    ("layernorm", nn.Sequential(nn.Linear(8, 8), nn.LayerNorm(8)), (2, 8)),
    ("adaptive_pool_div", nn.AdaptiveAvgPool2d(2), (1, 3, 8, 8)),
]


@pytest.mark.parametrize("name,mod,shape", CASES, ids=[c[0] for c in CASES])
def test_module_exports(name, mod, shape, rng):
    torch.manual_seed(0)
    if name == "embedding":
        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.emb = nn.Embedding(10, 6)

            def forward(self, idx):
                return self.emb(idx)

        m = M().eval()
        idx = torch.from_numpy(np.array([[1, 3, 7]], np.int64))
        g = export_torch(m, idx, name)
        got = st.CompiledModel(g)(idx.numpy())[0]
        with torch.no_grad():
            want = m(idx).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        return
    m = (mod if isinstance(mod, nn.Module) else mod).eval()
    x = torch.randn(*shape)
    g = export_torch(m, x, name)
    g = st.import_model(st.export_model(g))
    got = st.CompiledModel(g)(x.numpy())[0]
    with torch.no_grad():
        want = m(x).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestFunctionalForms:
    def test_functional_conv_ln_bn(self, rng):
        """A model written entirely with functional calls + raw parameters."""
        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.w = nn.Parameter(torch.randn(8, 3, 3, 3) * 0.1)
                self.b = nn.Parameter(torch.zeros(8))
                self.rm = nn.Parameter(torch.randn(8) * 0.1)
                self.rv = nn.Parameter(torch.rand(8) + 0.5)
                self.g = nn.Parameter(torch.ones(8))
                self.be = nn.Parameter(torch.zeros(8))
                self.ln_w = nn.Parameter(torch.ones(6))
                self.ln_b = nn.Parameter(torch.zeros(6))

            def forward(self, x):
                import torch.nn.functional as F
                h = F.conv2d(x, self.w, self.b, stride=1, padding=1)
                h = F.batch_norm(h, self.rm, self.rv, self.g, self.be)
                h = F.relu(h)
                h = h.mean(dim=(2, 3))          # (B, 8)
                h = h[:, :6]
                return F.layer_norm(h, (6,), self.ln_w, self.ln_b)

        torch.manual_seed(0)
        m = M().eval()
        x = torch.randn(2, 3, 8, 8)
        from smelter_tpu.frontend.torch_export import export_torch
        g = export_torch(m, x, "fn_forms")
        got = st.CompiledModel(g)(x.numpy())[0]
        with torch.no_grad():
            want = m(x).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestModernAttention:
    def test_sdpa_and_einsum(self, rng):
        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.qkv = nn.Linear(32, 96)

            def forward(self, x):  # (B, N, 32)
                import torch.nn.functional as F
                b, n, _ = x.shape
                qkv = self.qkv(x).reshape(b, n, 3, 4, 8).permute(2, 0, 3, 1, 4)
                q, k, v = qkv[0], qkv[1], qkv[2]   # (B, H, N, hd)
                o = F.scaled_dot_product_attention(q, k, v)
                o = torch.einsum("bhnd->bnhd", o).reshape(b, n, 32)
                return o

        torch.manual_seed(0)
        m = M().eval()
        x = torch.randn(2, 6, 32)
        from smelter_tpu.frontend.torch_export import export_torch
        g = export_torch(m, x, "sdpa")
        assert sum(1 for _ in g.find_nodes("FusedAttention")) == 1
        got = st.CompiledModel(g)(x.numpy())[0]
        with torch.no_grad():
            want = m(x).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_sdpa_causal(self, rng):
        class M(nn.Module):
            def forward(self, q, k, v):
                import torch.nn.functional as F
                return F.scaled_dot_product_attention(q, k, v, is_causal=True)

        m = M().eval()
        q = torch.randn(1, 2, 8, 16)
        k = torch.randn(1, 2, 8, 16)
        v = torch.randn(1, 2, 8, 16)
        from smelter_tpu.frontend.torch_export import export_torch
        g = export_torch(m, (q, k, v), "causal")
        got = st.CompiledModel(g)(q.numpy(), k.numpy(), v.numpy())[0]
        with torch.no_grad():
            want = m(q, k, v).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_sdpa_with_additive_mask(self, rng):
        class M(nn.Module):
            def forward(self, q, k, v, mask):
                import torch.nn.functional as F
                return F.scaled_dot_product_attention(q, k, v, attn_mask=mask)

        m = M().eval()
        q = torch.randn(1, 2, 6, 16)
        k = torch.randn(1, 2, 6, 16)
        v = torch.randn(1, 2, 6, 16)
        mask = torch.where(torch.rand(6, 6) > 0.3,
                           torch.zeros(6, 6), torch.full((6, 6), -1e9))
        from smelter_tpu.frontend.torch_export import export_torch
        g = export_torch(m, (q, k, v, mask), "masked")
        got = st.CompiledModel(g)(q.numpy(), k.numpy(), v.numpy(), mask.numpy())[0]
        with torch.no_grad():
            want = m(q, k, v, mask).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestReduceMethods:
    def test_tensor_reduce_methods(self):
        """x.sum/mean/amax method forms (incl. dim-less full reduction)."""
        import torch.nn as nn

        class M(nn.Module):
            def forward(self, x):
                a, b, c = torch.chunk(x, 3, dim=1)  # 10 -> [4,4,2]
                return a.sum(1) + b.mean(1) + c.amax(1) + x.sum() * 0.01

        m = M().eval()
        x = torch.randn(2, 10)
        g = export_torch(m, x, name="rm", opset=17)
        got = st.CompiledModel(g)(x.numpy())[0]
        np.testing.assert_allclose(got, m(x).detach().numpy(),
                                   rtol=1e-4, atol=1e-5)

    def test_dimmed_max_rejected(self):
        import torch.nn as nn

        from smelter_tpu.ir.errors import NotSupportedError

        class M(nn.Module):
            def forward(self, x):
                return x.max(1)[0]

        with pytest.raises(NotSupportedError, match="tuple"):
            export_torch(M().eval(), torch.randn(2, 5), name="m", opset=17)
