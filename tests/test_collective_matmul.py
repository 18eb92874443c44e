"""Collective matmul kernels (kernels/collective_matmul.py): hand-
scheduled all-gather-GEMM / reduce-scatter-GEMM for the TP linear path,
parity-tested against the SPMD partitioner's program on the virtual
8-device mesh (VERDICT r2 item 6 / SURVEY.md §5.8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smelter_tpu.kernels.collective_matmul import (
    tp_allgather_matmul, tp_reducescatter_matmul)


def _mesh(n=8, axis="tp"):
    return Mesh(np.asarray(jax.devices()[:n]), (axis,))


def _partitioner_ag(x, w, mesh, axis="tp"):
    """The program the SPMD partitioner emits for the same sharding:
    blocking all-gather of M-sharded x, device-local matmul."""
    xs = jax.device_put(x, NamedSharding(mesh, P(axis, None)))
    ws = jax.device_put(w, NamedSharding(mesh, P(None, axis)))
    fn = jax.jit(lambda a, b: a @ b,
                 out_shardings=NamedSharding(mesh, P(None, axis)))
    return fn(xs, ws)


def _partitioner_rs(x, w, mesh, axis="tp"):
    xs = jax.device_put(x, NamedSharding(mesh, P(None, axis)))
    ws = jax.device_put(w, NamedSharding(mesh, P(axis, None)))
    fn = jax.jit(lambda a, b: a @ b,
                 out_shardings=NamedSharding(mesh, P(axis, None)))
    return fn(xs, ws)


class TestAllGatherMatmul:
    @pytest.mark.parametrize("n", [2, 4, 8])
    def test_parity_vs_partitioner(self, rng, n):
        mesh = _mesh(n)
        m, k, nn = 8 * n, 64, 32 * n
        x = rng.standard_normal((m, k)).astype(np.float32)
        w = rng.standard_normal((k, nn)).astype(np.float32)
        got = np.asarray(tp_allgather_matmul(x, w, mesh))
        want = np.asarray(_partitioner_ag(x, w, mesh))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got, x @ w, rtol=1e-4, atol=1e-4)

    def test_output_sharding(self, rng):
        mesh = _mesh(8)
        x = rng.standard_normal((64, 32)).astype(np.float32)
        w = rng.standard_normal((32, 128)).astype(np.float32)
        out = tp_allgather_matmul(x, w, mesh)
        assert out.shape == (64, 128)
        assert out.sharding.spec == P(None, "tp")

    def test_bf16(self, rng):
        mesh = _mesh(4)
        x = rng.standard_normal((64, 64)).astype(np.float32)
        w = rng.standard_normal((64, 64)).astype(np.float32) * 0.1
        got = np.asarray(
            tp_allgather_matmul(x.astype(jnp.bfloat16),
                                w.astype(jnp.bfloat16), mesh)
        ).astype(np.float32)
        want = (x.astype(jnp.bfloat16).astype(np.float32)
                @ w.astype(jnp.bfloat16).astype(np.float32))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


class TestReduceScatterMatmul:
    @pytest.mark.parametrize("n", [2, 4, 8])
    def test_parity_vs_partitioner(self, rng, n):
        mesh = _mesh(n)
        m, k, nn = 8 * n, 16 * n, 32
        x = rng.standard_normal((m, k)).astype(np.float32)
        w = rng.standard_normal((k, nn)).astype(np.float32)
        got = np.asarray(tp_reducescatter_matmul(x, w, mesh))
        want = np.asarray(_partitioner_rs(x, w, mesh))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(got, x @ w, rtol=1e-4, atol=1e-4)

    def test_output_sharding(self, rng):
        mesh = _mesh(8)
        x = rng.standard_normal((64, 64)).astype(np.float32)
        w = rng.standard_normal((64, 32)).astype(np.float32)
        out = tp_reducescatter_matmul(x, w, mesh)
        assert out.shape == (64, 32)
        # PartitionSpec normalizes trailing None away
        assert out.sharding.spec in (P("tp"), P("tp", None))


class TestMegatronPair:
    def test_column_then_row_parallel_mlp(self, rng):
        """The canonical TP MLP: all-gather-GEMM (column-parallel up-proj)
        feeding reduce-scatter-GEMM (row-parallel down-proj), end to end
        on the ring kernels."""
        mesh = _mesh(4)
        m, d, h = 32, 64, 128
        x = rng.standard_normal((m, d)).astype(np.float32) * 0.3
        w1 = rng.standard_normal((d, h)).astype(np.float32) * 0.3
        w2 = rng.standard_normal((h, d)).astype(np.float32) * 0.3
        up = tp_allgather_matmul(x, w1, mesh)           # (m, h) N-sharded
        act = jax.nn.gelu(up)                           # elementwise, local
        down = tp_reducescatter_matmul(act, w2, mesh)   # (m, d) M-sharded
        want = np.asarray(jax.nn.gelu(x @ w1)) @ w2
        np.testing.assert_allclose(np.asarray(down), want,
                                   rtol=1e-4, atol=1e-4)
