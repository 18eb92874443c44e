"""Flash-attention Pallas kernel (inference, non-causal, optional scale).

The ViT config's attention path (BASELINE.json:11) under Config.use_pallas.
Standard streaming-softmax formulation: for each query tile, sweep KV tiles
keeping running max/sum and a rescaled accumulator in VMEM — O(N) memory,
one pass over K/V, MXU-shaped (tiles padded to lane width).

Grid: (batch*heads, Nq/TQ, Nk/TK) with the KV sweep innermost (Pallas
revisiting pattern keeps m/l/acc resident across the sweep).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
            n_kv: int, kv_total: int, bkv: int, scale: float, out_dtype):
    kv_i = pl.program_id(2)

    @pl.when(kv_i == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)          # (TQ, D)
    k = k_ref[0].astype(jnp.float32)          # (TK, D)
    v = v_ref[0].astype(jnp.float32)          # (TK, D)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale

    if kv_total % bkv != 0:
        # Out-of-range KV tail: -inf the logits AND zero V — p=0 alone is
        # not enough, 0 * NaN(undefined OOB V) = NaN.
        rem = kv_total - kv_i * bkv
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < rem, s, -jnp.inf)
        vrow = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        v = jnp.where(vrow < rem, v, jnp.zeros_like(v))

    m_prev = m_ref[:]                          # (TQ, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                     # (TQ, TK)
    alpha = jnp.exp(m_prev - m_new)            # (TQ, 1)
    l_new = alpha * l_ref[:] + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p, v, preferred_element_type=jnp.float32)
    m_ref[:] = m_new
    l_ref[:] = l_new

    @pl.when(kv_i == n_kv - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv",
                                             "interpret"))
def _flash_attention_impl(
    q: jax.Array,  # (B, H, N, D)
    k: jax.Array,  # (B, H, N, D)
    v: jax.Array,  # (B, H, N, D)
    *,
    scale: float = 1.0,
    block_q: int = 256,
    block_kv: int = 256,
    interpret: bool = False,
) -> jax.Array:
    b, h, nq, d = q.shape
    nk = k.shape[2]
    bh = b * h
    q3 = q.reshape(bh, nq, d)
    k3 = k.reshape(bh, nk, d)
    v3 = v.reshape(bh, nk, d)

    bq = min(block_q, _cdiv(nq, 8) * 8)
    bkv = min(block_kv, _cdiv(nk, 128) * 128)
    grid = (bh, _cdiv(nq, bq), _cdiv(nk, bkv))
    kernel = functools.partial(
        _kernel, n_kv=grid[2], kv_total=nk, bkv=bkv, scale=scale,
        out_dtype=q.dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda g, i, j: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, d), lambda g, i, j: (g, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, d), lambda g, i, j: (g, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda g, i, j: (g, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),   # running max
            pltpu.VMEM((bq, 1), jnp.float32),   # running sum
            pltpu.VMEM((bq, d), jnp.float32),   # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * nq * nk * d,
            bytes_accessed=(q3.size + k3.size + v3.size) * q.dtype.itemsize
            + q3.size * q.dtype.itemsize,
            transcendentals=bh * nq * nk,
        ),
        interpret=interpret,
    )(q3, k3, v3)
    return out.reshape(b, h, nq, d)


def flash_attention_reference(q, k, v, scale: float = 1.0):
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


def flash_attention(q, k, v, *, scale: float = 1.0, block_q: int = 256,
                    block_kv: int = 256, interpret: bool | None = None):
    """Public entry: auto-selects interpret mode on CPU backends."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _flash_attention_impl(q, k, v, scale=scale, block_q=block_q,
                                 block_kv=block_kv, interpret=interpret)
