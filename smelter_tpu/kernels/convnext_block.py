"""Whole-ConvNeXt-block Pallas kernel.

probe62: at the stage-1 geometry (56x56, d=96, b64) the block's parts
cost 1.05 ms (dwconv 0.467 at ~81% of its VPU bound, LN 0.326 at 29% of
bandwidth, MLP 0.258) but the XLA-composed block costs 1.767 ms — the
0.7 ms overhead lives inside XLA's dwconv+LN scheduling (graph-level
transposes were already fused; fuse_transpose_pairs proved that).

One VMEM pass per image: depthwise 7x7 as 49 shifted MACs on a
zero-padded scratch (NHWC: taps broadcast per-channel over lanes, no
reshape), LN over lanes in-register, the inverted-bottleneck MLP as two
MXU GEMMs with exact gelu (erf polynomial), layer scale + residual.

Reference scope: none — the reference has no depthwise-7x7/LN blocks
(SURVEY.md §2 lists only plain conv/pool/norm converters); this chases
the ConvNeXt zoo row's roofline gap.

OFF by default until its interleaved e2e A/B wins (probe64) — the
MLP-block and cross-attention kernels both won microbenches and lost
end-to-end; this one must earn its default the same way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_kernel(x_ref, wd_ref, bd_ref, g_ref, b_ref, w1_ref, b1_ref,
                  w2_ref, b2_ref, gm_ref, o_ref, xp, *, hh: int, ww: int,
                  c: int, eps: float):
    # pad + depthwise 7x7 (49 shifted per-channel MACs on the VPU)
    xp[:] = jnp.zeros_like(xp)
    xp[3:3 + hh, 3:3 + ww, :] = x_ref[0]
    acc = jnp.zeros((hh, ww, c), jnp.float32)
    for t in range(49):
        dy, dx = t // 7, t % 7
        acc = acc + (xp[dy:dy + hh, dx:dx + ww, :].astype(jnp.float32)
                     * wd_ref[t].astype(jnp.float32))
    acc = acc + bd_ref[0].astype(jnp.float32)

    # LayerNorm over channels (lanes)
    mu = jnp.mean(acc, axis=-1, keepdims=True)
    xc = acc - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = (xc * jax.lax.rsqrt(var + eps)
          * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32))
    xn2 = xn.reshape(hh * ww, c).astype(x_ref.dtype)

    # inverted-bottleneck MLP with exact gelu (Mosaic lowers no erf/erfc)
    h = (jnp.dot(xn2, w1_ref[...], preferred_element_type=jnp.float32)
         + b1_ref[0].astype(jnp.float32))
    z = h * 0.7071067811865476
    az = jnp.abs(z)
    tt = 1.0 / (1.0 + 0.3275911 * az)
    poly = tt * (0.254829592 + tt * (-0.284496736 + tt * (
        1.421413741 + tt * (-1.453152027 + tt * 1.061405429))))
    erf = jnp.sign(z) * (1.0 - poly * jnp.exp(-az * az))
    h = (0.5 * h * (1.0 + erf)).astype(x_ref.dtype)
    y = (jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
         + b2_ref[0].astype(jnp.float32))

    # layer scale + residual
    y = y * gm_ref[0].astype(jnp.float32)
    out = y.reshape(hh, ww, c) + x_ref[0].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def convnext_block(x, dw_w, dw_b, ln_g, ln_b, w1, b1, w2, b2, gamma, *,
                   eps: float = 1e-6, interpret: bool | None = None):
    """x (B, H, W, C) NHWC; dw_w (7, 7, 1, C) HWIO depthwise; w1 (C, F);
    w2 (F, C); gamma (C,) layer scale. Returns x + gamma*MLP(LN(dw(x)))."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W, C = x.shape
    F = w1.shape[1]
    wd = dw_w.reshape(49, C)  # tap-major per-channel weights
    kernel = functools.partial(_block_kernel, hh=H, ww=W, c=C, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((49, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, F), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((H + 6, W + 6, C), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=B * (2 * H * W * C * 49 + 4 * H * W * C * F),
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=B * H * W * F,
        ),
        interpret=interpret,
    )(x, wd, dw_b.reshape(1, C), ln_g.reshape(1, C), ln_b.reshape(1, C),
      w1, b1.reshape(1, F), w2, b2.reshape(1, C), gamma.reshape(1, C))


def convnext_block_reference(x, dw_w, dw_b, ln_g, ln_b, w1, b1, w2, b2,
                             gamma, *, eps: float = 1e-6):
    y = jax.lax.conv_general_dilated(
        x, dw_w.astype(x.dtype), (1, 1), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1]).astype(jnp.float32) + dw_b
    mu = jnp.mean(y, -1, keepdims=True)
    xc = y - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    xn = (xc * jax.lax.rsqrt(var + eps) * ln_g + ln_b).astype(x.dtype)
    h = (xn @ w1.astype(x.dtype)).astype(jnp.float32) + b1
    h = jax.nn.gelu(h, approximate=False).astype(x.dtype)
    y2 = (h @ w2.astype(x.dtype)).astype(jnp.float32) + b2
    return (x.astype(jnp.float32) + y2 * gamma).astype(x.dtype)
