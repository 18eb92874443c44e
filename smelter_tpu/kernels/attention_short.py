"""Fused short-sequence attention Pallas kernel (ViT-class shapes).

probe14: at ViT-B shapes (B=128, H=12, N=197, hd=64) XLA's
dot_product_attention runs ~1.39 ms/layer while the matmul flops bound is
~0.1 ms — it materializes the (B,H,N,N) score tensor (119 MB bf16) in HBM
three times over (scores, softmax, probs). The flash kernel
(kernels/flash_attention.py) targets long sequences and loses here
(small tiles, probe8). This kernel covers the short-N regime: for a group
of G heads per grid step the whole (N x N) score matrix lives in VMEM —
QK^T, masked softmax, and AV run back-to-back with zero HBM traffic for
the scores.

Layout: q/k/v (B, H, N, hd) -> (B*H, Npad, hd) with N padded to a sublane
multiple; padded KEY columns are masked to -inf before the softmax
(padded query rows compute garbage and are sliced off by the wrapper —
their softmax stays finite because the pad is zeros, not uninitialized).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int,
            g: int):
    npad = q_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 1)
    neg = jnp.float32(-1e30)
    for h in range(g):
        q = q_ref[h]
        k = k_ref[h]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if n_valid < npad:
            s = jnp.where(col < n_valid, s, neg)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o_ref[h] = jnp.dot(p.astype(v_ref.dtype), v_ref[h],
                           preferred_element_type=jnp.float32
                           ).astype(o_ref.dtype)


def short_attention(q, k, v, *, scale: float, group: int = 8,
                    interpret: bool | None = None):
    """Fused attention for (B, H, N, hd) with short N (scores fit VMEM).
    Returns (B, H, N, hd)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, N, hd = q.shape
    npad = _round_up(N, 8)
    pad = [(0, 0), (0, 0), (0, npad - N), (0, 0)]
    qp = jnp.pad(q, pad).reshape(B * H, npad, hd)
    kp = jnp.pad(k, pad).reshape(B * H, npad, hd)
    vp = jnp.pad(v, pad).reshape(B * H, npad, hd)

    g = group
    while (B * H) % g != 0:
        g //= 2
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, n_valid=N, g=g),
        grid=((B * H) // g,),
        in_specs=[pl.BlockSpec((g, npad, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((g, npad, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, npad, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * npad * npad * hd,
            bytes_accessed=4 * B * H * npad * hd * q.dtype.itemsize,
            transcendentals=B * H * npad * npad,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(B, H, npad, hd)[:, :, :N]


def short_attention_reference(q, k, v, *, scale: float):
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p,
                      v.astype(jnp.float32)).astype(q.dtype)
