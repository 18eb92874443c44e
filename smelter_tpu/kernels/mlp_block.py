"""Whole-block transformer MLP Pallas kernel (companion to vit_block.py).

x + FC2(gelu(FC1(LN(x)))) in one VMEM-resident pallas_call, grid over
batch, both FC weights revisit-cached in VMEM (~9.4 MB at ViT-B). The
attention block won 2.5x by eliminating XLA's fusion barriers (probe52);
the MLP's barriers are smaller (LN materializes once, gelu rides the
GEMM epilogue), so this kernel must EARN its default-on in probe54 —
wire only if it beats the XLA formulation end-to-end.

Reference scope: none — the reference is a CNN-only engine (SURVEY.md §5.7); this chases the BASELINE transformer configs."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mlp_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                o_ref, *, eps: float, approximate: bool, residual: bool,
                pre_ln: bool = True):
    # block may carry several images: fold them into one tall GEMM
    ips, n, d = x_ref.shape
    x = x_ref[...].reshape(ips * n, d).astype(jnp.float32)
    if pre_ln:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        xc = x - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        xn = (xc * jax.lax.rsqrt(var + eps)
              * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32))
        xn = xn.astype(x_ref.dtype)
    else:
        xn = x_ref[...].reshape(ips * n, d)  # post-LN: already normalized
    h = (jnp.dot(xn, w1_ref[...], preferred_element_type=jnp.float32)
         + b1_ref[0].astype(jnp.float32))
    # jax.nn.gelu's exact form uses erfc and Mosaic lowers neither erfc
    # nor erf; spell the exact form with the Abramowitz-Stegun 7.1.26
    # polynomial (|err| < 1.5e-7 — below bf16 resolution) over exp, which
    # does lower. The approximate form is the usual tanh formula.
    if approximate:
        h = 0.5 * h * (1.0 + jnp.tanh(
            0.7978845608028654 * (h + 0.044715 * h * h * h)))
    else:
        z = h * 0.7071067811865476
        az = jnp.abs(z)
        t = 1.0 / (1.0 + 0.3275911 * az)
        poly = t * (0.254829592 + t * (-0.284496736 + t * (
            1.421413741 + t * (-1.453152027 + t * 1.061405429))))
        erf_abs = 1.0 - poly * jnp.exp(-az * az)
        erf = jnp.sign(z) * erf_abs
        h = 0.5 * h * (1.0 + erf)
    h = h.astype(x_ref.dtype)
    y = (jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
         + b2_ref[0].astype(jnp.float32))
    out = (x + y) if residual else y
    o_ref[...] = out.reshape(ips, n, d).astype(o_ref.dtype)


def mlp_block(x, ln_g, ln_b, w1, b1, w2, b2, *, eps: float = 1e-5,
              approximate: bool = False, residual: bool = True,
              pre_ln: bool = True, images_per_step: int = 1,
              interpret: bool | None = None):
    """x (B, N, D); w1 (D, F); w2 (F, D). images_per_step folds several
    images into each grid step's GEMMs (taller M amortizes the MXU
    pipeline; VMEM-bounded by the f32 hidden (ips*N, F) tile)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N, D = x.shape
    F = w1.shape[1]
    ips = max(1, min(images_per_step, B))
    while B % ips:
        ips -= 1
    kernel = functools.partial(_mlp_kernel, eps=eps,
                               approximate=approximate, residual=residual,
                               pre_ln=pre_ln)
    return pl.pallas_call(
        kernel,
        grid=(B // ips,),
        in_specs=[
            pl.BlockSpec((ips, N, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, F), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ips, N, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=B * 4 * N * D * F,
            bytes_accessed=2 * x.size * x.dtype.itemsize + 4 * D * F,
            transcendentals=B * N * F,
        ),
        interpret=interpret,
    )(x, ln_g.reshape(1, D), ln_b.reshape(1, D), w1, b1.reshape(1, F),
      w2, b2.reshape(1, D))


def mlp_block_reference(x, ln_g, ln_b, w1, b1, w2, b2, *, eps: float = 1e-5,
                        approximate: bool = False, residual: bool = True):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    xn = (xc * jax.lax.rsqrt(var + eps) * ln_g + ln_b).astype(x.dtype)
    h = (xn @ w1.astype(x.dtype)).astype(jnp.float32) + b1
    h = jax.nn.gelu(h, approximate=approximate).astype(x.dtype)
    y = (h @ w2.astype(x.dtype)).astype(jnp.float32) + b2
    return ((x.astype(jnp.float32) + y) if residual else y).astype(x.dtype)
