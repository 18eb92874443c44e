"""Fused LayerNorm Pallas kernel (single HBM pass).

probe14: XLA lowers the engine's LayerNorm (f32 mean/var + normalize) on
ViT-B shapes (25216 x 768 bf16) at ~3x its bandwidth bound — the reduce
and the normalize don't fuse into one pass. This kernel reads each row
tile once, computes mean/var on the VPU in f32, and writes the normalized
tile — one read + one write, the HBM floor.

Scope: normalization over the trailing axis (the transformer case; the
lowering flattens leading dims). Requires D % 128 == 0; the public entry
falls back to the jnp composite otherwise and auto-interprets off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _kernel(x_ref, g_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    y = (xc * jax.lax.rsqrt(var + eps) * g_ref[:].astype(jnp.float32)
         + b_ref[:].astype(jnp.float32))
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_m", "interpret"))
def _layer_norm_impl(x, gamma, beta, *, eps: float = 1e-5,
                     block_m: int = 512, interpret: bool = False):
    M, D = x.shape
    bm = min(block_m, M)
    grid = (_cdiv(M, bm),)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * M * D,
            bytes_accessed=2 * M * D * x.dtype.itemsize + 8 * D,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, gamma.reshape(1, D), beta.reshape(1, D))


def fused_layer_norm(x, gamma, beta, *, eps: float = 1e-5,
                     interpret: bool | None = None):
    """LayerNorm over the trailing axis of any-rank x (leading dims
    flattened). Falls back to the jnp composite when D is lane-unaligned."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    D = x.shape[-1]
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    if D % 128 != 0 or m % 8 != 0:
        return layer_norm_reference(x, gamma, beta, eps=eps)
    y = _layer_norm_impl(x.reshape(m, D), gamma, beta, eps=eps,
                         interpret=interpret)
    return y.reshape(lead + (D,))


def layer_norm_reference(x, gamma, beta, *, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32)
    return (y + beta.astype(jnp.float32)).astype(x.dtype)


def _res_kernel(x_ref, s_ref, g_ref, b_ref, sum_ref, o_ref, *, eps: float):
    # sum in f32, rounded to the carry dtype BEFORE normalizing — bit-parity
    # with the composite (bf16 residual stream), one HBM pass for add + LN.
    s32 = x_ref[:].astype(jnp.float32) + s_ref[:].astype(jnp.float32)
    carry = s32.astype(sum_ref.dtype)
    sum_ref[:] = carry
    x = carry.astype(jnp.float32)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    y = (xc * jax.lax.rsqrt(var + eps) * g_ref[:].astype(jnp.float32)
         + b_ref[:].astype(jnp.float32))
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_m", "interpret"))
def _residual_layer_norm_impl(x, skip, gamma, beta, *, eps: float = 1e-5,
                              block_m: int = 512, interpret: bool = False):
    M, D = x.shape
    bm = min(block_m, M)
    grid = (_cdiv(M, bm),)
    return pl.pallas_call(
        functools.partial(_res_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, D), x.dtype),  # pre-norm sum
            jax.ShapeDtypeStruct((M, D), x.dtype),  # normalized
        ],
        cost_estimate=pl.CostEstimate(
            flops=9 * M * D,
            bytes_accessed=4 * M * D * x.dtype.itemsize + 8 * D,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, skip, gamma.reshape(1, D), beta.reshape(1, D))


def residual_layer_norm(x, skip, gamma, beta, *, eps: float = 1e-5,
                        interpret: bool | None = None):
    """(sum, LayerNorm(sum)) over the trailing axis — the transformer
    residual+LN block in ONE HBM pass (probe17's fusion-barrier fix: the
    standalone LN kernel forced XLA to materialize the residual add
    separately; absorbing the add removes the barrier). Falls back to the
    jnp composite when lane-unaligned."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    D = x.shape[-1]
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    if D % 128 != 0 or m % 8 != 0 or x.shape != skip.shape:
        s = (x.astype(jnp.float32) + skip.astype(jnp.float32)).astype(x.dtype)
        return s, layer_norm_reference(s, gamma, beta, eps=eps)
    s, y = _residual_layer_norm_impl(x.reshape(m, D), skip.reshape(m, D),
                                     gamma, beta, eps=eps,
                                     interpret=interpret)
    return s.reshape(lead + (D,)), y.reshape(lead + (D,))
