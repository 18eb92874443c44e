"""Whole-block ViT attention kernel (kernels/vit_block.py): interpret-
mode parity vs the jnp reference across geometries, including the exact
ViT-B/16 head shape (VERDICT r2 item 4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from smelter_tpu.kernels.vit_block import (
    vit_attention_block, vit_attention_block_reference)


def _mk(rng, B, N, D, H, dtype=jnp.bfloat16):
    x = jnp.asarray(rng.standard_normal((B, N, D)) * 0.5,
                    jnp.float32).astype(dtype)
    g = jnp.asarray(rng.standard_normal(D) * 0.1 + 1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((D, 3 * D)) / np.sqrt(D),
                       jnp.float32).astype(dtype)
    bqkv = jnp.asarray(rng.standard_normal(3 * D) * 0.02, jnp.float32)
    wp = jnp.asarray(rng.standard_normal((D, D)) / np.sqrt(D),
                     jnp.float32).astype(dtype)
    bp = jnp.asarray(rng.standard_normal(D) * 0.02, jnp.float32)
    return x, g, b, wqkv, bqkv, wp, bp


class TestVitBlockKernel:
    @pytest.mark.parametrize("B,N,D,H", [
        (2, 197, 128, 4),    # odd sequence length (CLS token)
        (1, 64, 128, 2),     # single image, tiny
        (2, 50, 192, 6),     # hd=32
    ])
    def test_parity(self, rng, B, N, D, H):
        args = _mk(rng, B, N, D, H)
        got = np.asarray(vit_attention_block(*args, heads=H,
                                             interpret=True), np.float32)
        want = np.asarray(vit_attention_block_reference(*args, heads=H),
                          np.float32)
        rel = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
        assert rel < 3e-2, rel

    def test_vit_b16_geometry_small_batch(self, rng):
        # the exact ViT-B/16 block shape, batch kept small for CPU interpret
        args = _mk(rng, 1, 197, 768, 12)
        got = np.asarray(vit_attention_block(*args, heads=12,
                                             interpret=True), np.float32)
        want = np.asarray(vit_attention_block_reference(*args, heads=12),
                          np.float32)
        rel = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
        assert rel < 3e-2, rel

    def test_f32(self, rng):
        args = _mk(rng, 2, 33, 64, 2, dtype=jnp.float32)
        got = np.asarray(vit_attention_block(*args, heads=2, interpret=True))
        want = np.asarray(vit_attention_block_reference(*args, heads=2))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
