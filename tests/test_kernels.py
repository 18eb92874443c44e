"""Pallas kernel tests — interpret mode on CPU vs jnp reference
implementations (SURVEY.md §4d strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smelter_tpu.kernels.dequant_matmul import (
    dequant_matmul,
    dequant_matmul_reference,
)
from smelter_tpu.quant import quantize_array


class TestDequantMatmul:
    @pytest.mark.parametrize("m,k,n", [
        (8, 128, 128),          # single tile
        (256, 512, 384),        # multi-tile all dims
        (100, 200, 300),        # unaligned sizes (masking/padding path)
        (1, 128, 256),          # single row (batch-1 gemm)
    ])
    def test_matches_reference(self, rng, m, k, n):
        x = rng.standard_normal((m, k)).astype(np.float32)
        w = rng.standard_normal((k, n)).astype(np.float32)
        q, s = quantize_array(w, axis=1)
        s = s.reshape(-1)
        got = dequant_matmul(jnp.asarray(x), jnp.asarray(q), jnp.asarray(s),
                             block_m=128, block_n=128, block_k=128,
                             interpret=True)
        want = dequant_matmul_reference(jnp.asarray(x), jnp.asarray(q), jnp.asarray(s))
        # rtol accounts for differing K-accumulation tile order vs XLA
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_bf16_activations(self, rng):
        x = rng.standard_normal((64, 256)).astype(np.float32)
        w = rng.standard_normal((256, 128)).astype(np.float32)
        q, s = quantize_array(w, axis=1)
        xb = jnp.asarray(x, jnp.bfloat16)
        got = dequant_matmul(xb, jnp.asarray(q), jnp.asarray(s.reshape(-1)),
                             interpret=True)
        assert got.dtype == jnp.bfloat16
        # The kernel is *more* accurate than the reference (int8->bf16 upcast
        # is exact; the reference rounds the dequantized f32 weight to bf16
        # before the dot) — compare both to the exact f32 result.
        exact = x @ (q.astype(np.float32) * s[None, :])
        err = np.abs(np.asarray(got, np.float32) - exact).max()
        assert err / np.abs(exact).max() < 0.02, err

    def test_quantization_error_small(self, rng):
        """End-to-end: int8 kernel output close to full-fp32 matmul."""
        x = rng.standard_normal((32, 512)).astype(np.float32)
        w = rng.standard_normal((512, 64)).astype(np.float32)
        q, s = quantize_array(w, axis=1)
        got = np.asarray(dequant_matmul(
            jnp.asarray(x), jnp.asarray(q), jnp.asarray(s.reshape(-1)),
            interpret=True))
        exact = x @ w
        rel = np.abs(got - exact).max() / np.abs(exact).max()
        assert rel < 0.02, rel


class TestInt8Matmul:
    @pytest.mark.parametrize("m,k,n", [
        (32, 128, 128),         # single tile
        (256, 512, 384),        # multi-tile all dims
        (100, 200, 300),        # unaligned sizes (masking/padding path)
        (1, 128, 256),          # single row (batch-1 gemm)
    ])
    def test_exact_integer_parity(self, rng, m, k, n):
        """The int8 MXU kernel's i32 accumulation must match the jnp
        integer reference exactly (no float reassociation involved)."""
        from smelter_tpu.kernels.int8_matmul import (
            int8_matmul, int8_matmul_reference)

        x_q = rng.integers(-127, 128, (m, k)).astype(np.int8)
        w_q = rng.integers(-127, 128, (k, n)).astype(np.int8)
        sr = (rng.random((m, 1)).astype(np.float32) + 0.5) / 100
        sc = (rng.random(n).astype(np.float32) + 0.5) / 100
        got = int8_matmul(jnp.asarray(x_q), jnp.asarray(w_q), jnp.asarray(sr),
                          jnp.asarray(sc), block_m=128, block_n=128,
                          block_k=128, out_dtype=jnp.float32, interpret=True)
        want = int8_matmul_reference(jnp.asarray(x_q), jnp.asarray(w_q),
                                     jnp.asarray(sr), jnp.asarray(sc),
                                     out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def test_dequant_matmul_int8_accuracy(self, rng):
        """Full dynamic path (quantize_rows + kernel) vs exact fp32 matmul:
        error bounded by the combined activation+weight quant noise."""
        from smelter_tpu.kernels.int8_matmul import dequant_matmul_int8

        x = rng.standard_normal((64, 512)).astype(np.float32)
        w = rng.standard_normal((512, 128)).astype(np.float32)
        q, s = quantize_array(w, axis=1)
        got = np.asarray(dequant_matmul_int8(
            jnp.asarray(x), jnp.asarray(q), jnp.asarray(s.reshape(-1)),
            out_dtype=jnp.float32, interpret=True))
        exact = x @ w
        rel = np.abs(got - exact).max() / np.abs(exact).max()
        assert rel < 0.03, rel

    def test_quantize_rows(self, rng):
        from smelter_tpu.kernels.int8_matmul import quantize_rows

        x = rng.standard_normal((16, 256)).astype(np.float32) * 3
        q, s = quantize_rows(jnp.asarray(x))
        assert q.dtype == jnp.int8 and s.shape == (16, 1)
        back = np.asarray(q, np.float32) * np.asarray(s)
        assert np.abs(back - x).max() <= np.asarray(s).max() * 0.51


class TestDequantConv:
    @pytest.mark.parametrize("h,w,cin,cout,k,pad", [
        (8, 8, 128, 128, 3, 1),      # single row-tile, SAME
        (14, 14, 128, 256, 3, 1),    # multi row-tile
        (10, 10, 128, 128, 1, 0),    # 1x1
        (12, 12, 128, 128, 5, 2),    # 5x5
        (11, 9, 128, 128, 3, 0),     # odd sizes, VALID
        (28, 28, 128, 128, 3, 1),    # W+halo=30: unaligned-W pad path
    ])
    def test_matches_reference(self, rng, h, w, cin, cout, k, pad):
        from smelter_tpu.kernels.dequant_conv import (
            dequant_conv, dequant_conv_reference)
        from smelter_tpu.quant import quantize_array
        import jax.numpy as jnp

        x = rng.standard_normal((2, h, w, cin)).astype(np.float32)
        wf = rng.standard_normal((cout, cin, k, k)).astype(np.float32) * 0.1
        q, s = quantize_array(wf, axis=0)
        q_hwio = np.ascontiguousarray(q.transpose(2, 3, 1, 0))
        sc = s.reshape(-1)
        pads = ((pad, pad), (pad, pad))
        got = dequant_conv(jnp.asarray(x), jnp.asarray(q_hwio), jnp.asarray(sc),
                           pads=pads, interpret=True)
        want = dequant_conv_reference(jnp.asarray(x), jnp.asarray(q_hwio),
                                      jnp.asarray(sc), pads=pads)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_bf16_activations(self, rng):
        from smelter_tpu.kernels.dequant_conv import (
            dequant_conv, dequant_conv_reference)
        from smelter_tpu.quant import quantize_array
        import jax.numpy as jnp

        x = rng.standard_normal((1, 8, 8, 128)).astype(np.float32)
        wf = rng.standard_normal((128, 128, 3, 3)).astype(np.float32) * 0.1
        q, s = quantize_array(wf, axis=0)
        q_hwio = np.ascontiguousarray(q.transpose(2, 3, 1, 0))
        xb = jnp.asarray(x, jnp.bfloat16)
        got = dequant_conv(xb, jnp.asarray(q_hwio), jnp.asarray(s.reshape(-1)),
                           pads=((1, 1), (1, 1)), interpret=True)
        assert got.dtype == jnp.bfloat16
        exact = np.asarray(dequant_conv_reference(
            jnp.asarray(x), jnp.asarray(q_hwio), jnp.asarray(s.reshape(-1)),
            pads=((1, 1), (1, 1))))
        rel = np.abs(np.asarray(got, np.float32) - exact).max() / np.abs(exact).max()
        assert rel < 0.05, rel


class TestFusedLayerNorm:
    @pytest.mark.parametrize("m,d", [(64, 128), (100, 256), (8, 768)])
    def test_matches_reference(self, rng, m, d):
        from smelter_tpu.kernels.layer_norm import (
            fused_layer_norm, layer_norm_reference)

        x = rng.standard_normal((m, d)).astype(np.float32) * 3 + 1
        g = rng.standard_normal(d).astype(np.float32)
        b = rng.standard_normal(d).astype(np.float32)
        got = fused_layer_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b),
                               interpret=True)
        want = layer_norm_reference(jnp.asarray(x), jnp.asarray(g),
                                    jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_unaligned_d_falls_back(self, rng):
        from smelter_tpu.kernels.layer_norm import fused_layer_norm

        x = rng.standard_normal((4, 100)).astype(np.float32)
        g = np.ones(100, np.float32)
        b = np.zeros(100, np.float32)
        got = np.asarray(fused_layer_norm(jnp.asarray(x), jnp.asarray(g),
                                          jnp.asarray(b), interpret=True))
        assert abs(got.mean()) < 1e-5 and abs(got.std() - 1) < 1e-2

    def test_3d_and_bf16(self, rng):
        from smelter_tpu.kernels.layer_norm import (
            fused_layer_norm, layer_norm_reference)

        x = jnp.asarray(rng.standard_normal((2, 16, 256)).astype(np.float32),
                        jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal(256).astype(np.float32))
        b = jnp.zeros(256, jnp.float32)
        got = fused_layer_norm(x, g, b, interpret=True)
        assert got.dtype == jnp.bfloat16 and got.shape == x.shape
        want = layer_norm_reference(x, g, b)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=2e-2, atol=2e-2)


class TestShortAttention:
    @pytest.mark.parametrize("b,h,n,hd", [
        (2, 4, 64, 64),      # aligned N
        (2, 3, 197, 64),     # ViT shape: padded N, odd head count
        (1, 2, 30, 32),      # small everything
    ])
    def test_matches_reference(self, rng, b, h, n, hd):
        from smelter_tpu.kernels.attention_short import (
            short_attention, short_attention_reference)

        q = rng.standard_normal((b, h, n, hd)).astype(np.float32)
        k = rng.standard_normal((b, h, n, hd)).astype(np.float32)
        v = rng.standard_normal((b, h, n, hd)).astype(np.float32)
        scale = hd ** -0.5
        got = short_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              scale=scale, interpret=True)
        want = short_attention_reference(jnp.asarray(q), jnp.asarray(k),
                                         jnp.asarray(v), scale=scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_vit_engine_path(self, rng):
        """use_pallas routes FusedAttention through the short-N kernel
        (interpret mode) with parity against the XLA path."""
        import functools
        import smelter_tpu as st
        import smelter_tpu.kernels.attention_short as sa
        from smelter_tpu.models import vit
        from smelter_tpu.passes.pass_manager import run_passes

        g, _tm, shape = vit.build(1, 32, patch=8, dim=64, depth=2, heads=4,
                                  num_classes=10)
        x = rng.standard_normal(shape).astype(np.float32)
        # stop before fuse_qkv_attention: this test targets the plain
        # FusedAttention -> short_attention kernel route
        run_passes(g, ["fold_constants", "fuse_attention", "dce"])
        assert sum(1 for _ in g.find_nodes("FusedAttention")) == 2
        want = st.CompiledModel(g)(x)[0]
        orig = sa.short_attention
        sa.short_attention = functools.partial(orig, interpret=True)
        try:
            got = st.CompiledModel(g, st.Config(use_pallas=True))(x)[0]
        finally:
            sa.short_attention = orig
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


class TestResidualLayerNorm:
    @pytest.mark.parametrize("m,d", [(64, 128), (16, 768)])
    def test_matches_composite(self, rng, m, d):
        from smelter_tpu.kernels.layer_norm import (
            layer_norm_reference, residual_layer_norm)

        x = jnp.asarray(rng.standard_normal((m, d)), jnp.bfloat16)
        sk = jnp.asarray(rng.standard_normal((m, d)), jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal(d).astype(np.float32))
        b = jnp.asarray(rng.standard_normal(d).astype(np.float32))
        s, y = residual_layer_norm(x, sk, g, b, interpret=True)
        want_s = (x.astype(jnp.float32) + sk.astype(jnp.float32)).astype(
            jnp.bfloat16)
        assert (np.asarray(s, np.float32)
                == np.asarray(want_s, np.float32)).all()
        want_y = layer_norm_reference(want_s, g, b)
        np.testing.assert_allclose(np.asarray(y, np.float32),
                                   np.asarray(want_y, np.float32),
                                   rtol=2e-2, atol=2e-2)

    def test_3d_and_unaligned_fallback(self, rng):
        from smelter_tpu.kernels.layer_norm import residual_layer_norm

        x = jnp.asarray(rng.standard_normal((2, 5, 100)).astype(np.float32))
        sk = jnp.asarray(rng.standard_normal((2, 5, 100)).astype(np.float32))
        g = jnp.ones(100, jnp.float32)
        b = jnp.zeros(100, jnp.float32)
        s, y = residual_layer_norm(x, sk, g, b, interpret=True)
        assert s.shape == y.shape == x.shape
        np.testing.assert_allclose(np.asarray(s), np.asarray(x + sk),
                                   rtol=1e-6, atol=1e-6)
        assert abs(np.asarray(y).mean()) < 1e-5
