"""Fused dequant + KxK conv Pallas kernel (int8 weights, NHWC).

The remaining north-star hot op (BASELINE.json:5 "fused dequant+conv").
Implicit-GEMM formulation: for each (batch, row-tile, Cout-tile) grid cell,
DMA the halo'd input rows HBM->VMEM once, then accumulate the kh*kw shifted
(TH*W_out, Cin) x (Cin, TC) matmuls on the MXU, applying the per-output-
channel scale in the epilogue. Weights stream as int8 (4x less HBM traffic
than f32) and upcast in-register.

Scope (v1): stride 1, dilation 1, groups 1, NHWC activations, weights
pre-relaid to HWIO. The wrapper pre-pads the input (conv padding + row-tile
alignment) with jnp.pad and slices the output, so the kernel sees exact
tiles — no in-kernel masking.

XLA's native conv remains the default path (docs/DESIGN.md: measure, then
choose); this kernel exists for the shapes where weight bandwidth dominates
and as the foundation for fused epilogues XLA cannot express.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _kernel(x_hbm, w_ref, s_ref, o_ref, *, th: int, kh: int, kw: int,
            cin: int, w_out: int, out_dtype):
    n = pl.program_id(0)
    h = pl.program_id(1)

    def body(xs, sem):
        # Halo'd rows for this tile: [h*th, h*th + th + kh - 1)
        cp = pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(h * th, th + kh - 1)], xs, sem)
        cp.start()
        cp.wait()
        acc = jnp.zeros((th * w_out, o_ref.shape[-1]), jnp.float32)
        for i in range(kh):
            for j in range(kw):
                patch = xs[pl.ds(i, th), pl.ds(j, w_out), :]
                patch = patch.reshape(th * w_out, cin)
                acc += jnp.dot(
                    patch,
                    w_ref[i, j].astype(patch.dtype),
                    preferred_element_type=jnp.float32,
                )
        out = acc * s_ref[:].astype(jnp.float32)
        o_ref[0] = out.reshape(th, w_out, o_ref.shape[-1]).astype(out_dtype)

    pl.run_scoped(
        body,
        xs=pltpu.VMEM((th + kh - 1, x_hbm.shape[2], cin), x_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("pads", "tile_h", "block_cout",
                                             "interpret"))
def _dequant_conv_impl(
    x: jax.Array,       # (N, H, W, Cin)
    w_q: jax.Array,     # (kh, kw, Cin, Cout) int8 (HWIO)
    scales: jax.Array,  # (Cout,) float32
    *,
    pads: tuple[tuple[int, int], tuple[int, int]] = ((0, 0), (0, 0)),
    tile_h: int = 8,
    block_cout: int = 256,
    interpret: bool = False,
) -> jax.Array:
    n, h, w, cin = x.shape
    kh, kw, cin2, cout = w_q.shape
    assert cin == cin2 and scales.shape == (cout,)
    (ph0, ph1), (pw0, pw1) = pads
    h_out = h + ph0 + ph1 - kh + 1
    w_out = w + pw0 + pw1 - kw + 1

    th = min(tile_h, h_out)
    n_th = _cdiv(h_out, th)
    # Pad: conv padding + alignment so every row tile's halo read is in
    # bounds (padded height = n_th*th + kh - 1), and W padded to a sublane
    # multiple (8) — Mosaic rejects HBM->VMEM slices whose second-to-minor
    # extent is unaligned (probe11: W=30 at 28x28 failed to compile).
    extra_h = n_th * th + kh - 1 - (h + ph0 + ph1)
    w_pad_total = w + pw0 + pw1
    extra_w = _cdiv(w_pad_total, 8) * 8 - w_pad_total
    xp = jnp.pad(x, ((0, 0), (ph0, ph1 + max(0, extra_h)),
                     (pw0, pw1 + extra_w), (0, 0)))

    tc = min(block_cout, cout)
    n_tc = _cdiv(cout, tc)
    assert cout % n_tc == 0, "Cout must divide into equal tiles"
    tc = cout // n_tc

    kernel = functools.partial(
        _kernel, th=th, kh=kh, kw=kw, cin=cin, w_out=w_out, out_dtype=x.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(n, n_th, n_tc),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # full input, DMA'd manually
            pl.BlockSpec((kh, kw, cin, tc), lambda b, r, c: (0, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc), lambda b, r, c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w_out, tc),
                               lambda b, r, c: (b, r, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n_th * th, w_out, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h_out * w_out * cin * cout * kh * kw,
            bytes_accessed=int(xp.size * x.dtype.itemsize + w_q.size
                               + cout * 4
                               + n * h_out * w_out * cout * x.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, w_q, scales.reshape(1, cout))
    return out[:, :h_out]


def dequant_conv(x, w_q, scales, *, pads=((0, 0), (0, 0)), tile_h: int = 8,
                 block_cout: int = 256, interpret: bool | None = None):
    """Public entry (auto-interprets off-TPU). x NHWC float, w_q HWIO int8,
    per-Cout scales; stride 1 / dilation 1 / groups 1.

    Mosaic alignment envelope (measured on v5e, experiments/tpu_probe7.py):
    compiled kernels need Cout >= 128 lanes and (tile_h * W_out) % 8 == 0;
    outside it we fall back to the XLA composite rather than fail."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cout = w_q.shape[3]
    (ph0, ph1), (pw0, pw1) = pads
    w_out = x.shape[2] + pw0 + pw1 - w_q.shape[1] + 1
    aligned = cout % 128 == 0 and (min(tile_h, x.shape[1]) * w_out) % 8 == 0
    if not (aligned or interpret):
        return dequant_conv_reference(x, w_q, scales, pads=pads)
    return _dequant_conv_impl(x, w_q, scales, pads=tuple(map(tuple, pads)),
                              tile_h=tile_h, block_cout=block_cout,
                              interpret=interpret)


def dequant_conv_reference(x, w_q, scales, *, pads=((0, 0), (0, 0))):
    """jnp reference: dequantize then XLA conv (NHWC/HWIO)."""
    from jax import lax

    w = w_q.astype(jnp.float32) * scales.reshape(1, 1, 1, -1)
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), list(map(tuple, pads)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
