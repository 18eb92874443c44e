"""Flash-attention Pallas kernel tests (interpret mode) vs reference."""

import numpy as np
import pytest
import jax.numpy as jnp

from smelter_tpu.kernels.flash_attention import (
    flash_attention,
    flash_attention_reference,
)


class TestFlashAttention:
    @pytest.mark.parametrize("b,h,n,d", [
        (1, 2, 128, 64),     # single KV tile
        (2, 4, 384, 64),     # multi-tile
        (1, 2, 200, 64),     # unaligned sequence (mask path)
        (1, 1, 8, 128),      # tiny sequence
    ])
    def test_matches_reference(self, rng, b, h, n, d):
        q = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
        scale = 1.0 / np.sqrt(d)
        got = flash_attention(q, k, v, scale=scale, block_q=128, block_kv=128,
                              interpret=True)
        want = flash_attention_reference(q, k, v, scale=scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_bf16(self, rng):
        q = jnp.asarray(rng.standard_normal((1, 2, 256, 64)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((1, 2, 256, 64)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((1, 2, 256, 64)), jnp.bfloat16)
        got = flash_attention(q, k, v, scale=0.125, interpret=True)
        want = flash_attention_reference(q, k, v, scale=0.125)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=5e-2, atol=5e-2)

    def test_extreme_logits_stable(self, rng):
        """Streaming softmax must not overflow with large logits."""
        q = jnp.asarray(rng.standard_normal((1, 1, 128, 64)).astype(np.float32)) * 30
        k = jnp.asarray(rng.standard_normal((1, 1, 128, 64)).astype(np.float32)) * 30
        v = jnp.asarray(rng.standard_normal((1, 1, 128, 64)).astype(np.float32))
        got = np.asarray(flash_attention(q, k, v, scale=1.0, interpret=True))
        assert np.isfinite(got).all()
        want = np.asarray(flash_attention_reference(q, k, v, scale=1.0))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


class TestRingAttentionRDMA:
    def test_matches_reference_on_ring(self, rng):
        """Pallas RDMA ring (interpret mode) vs full attention on the
        virtual mesh — the hand-scheduled multi-chip kernel."""
        import jax
        from jax.sharding import Mesh
        from smelter_tpu.kernels.ring_attention_rdma import (
            sequence_sharded_attention_rdma)

        n_dev = 4
        devices = jax.devices()[:n_dev]
        b, h, n, d = 1, 2, 8 * n_dev * 4, 128
        q = np.asarray(rng.standard_normal((b, h, n, d)), np.float32)
        k = np.asarray(rng.standard_normal((b, h, n, d)), np.float32)
        v = np.asarray(rng.standard_normal((b, h, n, d)), np.float32)
        mesh = Mesh(np.asarray(devices), ("sp",))
        got = np.asarray(sequence_sharded_attention_rdma(
            q, k, v, mesh, scale=float(1 / np.sqrt(d))))
        want = np.asarray(flash_attention_reference(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            scale=float(1 / np.sqrt(d))))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_two_device_ring(self, rng):
        import jax
        from jax.sharding import Mesh
        from smelter_tpu.kernels.ring_attention_rdma import (
            sequence_sharded_attention_rdma)

        mesh = Mesh(np.asarray(jax.devices()[:2]), ("sp",))
        q = np.asarray(rng.standard_normal((1, 1, 32, 128)), np.float32)
        k = np.asarray(rng.standard_normal((1, 1, 32, 128)), np.float32)
        v = np.asarray(rng.standard_normal((1, 1, 32, 128)), np.float32)
        got = np.asarray(sequence_sharded_attention_rdma(q, k, v, mesh, scale=0.1))
        want = np.asarray(flash_attention_reference(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=0.1))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestAutoFlash:
    def test_long_seq_uses_flash_by_default(self, rng):
        """FusedAttention auto-selects the flash kernel at seq>=2048 even
        without use_pallas (XLA materializes O(N^2) there — probe9)."""
        import smelter_tpu as st
        from smelter_tpu.ir.build import GraphBuilder

        b = GraphBuilder("attn", opset=13)
        q = b.input("q", (1, 2, 2048, 64))
        k = b.input("k", (1, 2, 2048, 64))
        v = b.input("v", (1, 2, 2048, 64))
        y = b.node("FusedAttention", [q, k, v], scale=0.125)
        g = b.finish([y])
        qn = rng.standard_normal((1, 2, 2048, 64)).astype(np.float32)
        kn = rng.standard_normal((1, 2, 2048, 64)).astype(np.float32)
        vn = rng.standard_normal((1, 2, 2048, 64)).astype(np.float32)
        got = st.CompiledModel(g)(qn, kn, vn)[0]  # interpret-mode flash on CPU
        want = np.asarray(flash_attention_reference(
            jnp.asarray(qn), jnp.asarray(kn), jnp.asarray(vn), scale=0.125))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
