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
