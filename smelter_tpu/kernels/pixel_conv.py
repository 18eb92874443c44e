"""Pixel-major direct 3x3 conv Pallas kernels (small-C_out decoders).

ESRGAN-class dense blocks run 3x3/s1/p1 convs with C_out in {32, 64}:
every channels-on-lanes formulation (XLA direct, pack_conv_output,
kernels/dequant_conv.py) pads C_out to 128 MXU lanes and tops out at
12-29 TF of the 219 peak (probe38). These kernels transpose the GEMM —
pixels on lanes, channels on sublanes:

    out[c_out, w] = W2[c_out, (dy, c_in)] x X3[(dy, c_in), w]

with the dx taps folded in output-space by lane rolls. Lane padding is
zero for any C_out (W is the lane dim — 128/256/512 on ESRGAN maps), and
the 3-row window X3 is a free sublane view of the [rows, C, W] block.

Two variants, selected by microbenchmark (experiments/tpu_probe40.py):
  pixel_conv_rowdot — activations in HBM as [B, H, C, W] ("NHCW"); per
    output row one [3*C_out, 3*C_in] x [3*C_in, W] MXU dot, dx taps
    combined by masked lane rolls of the [C_out, W] partials.
  pixel_conv_patch  — activations as [B, C, H*W] (flat NCHW); builds the
    full patch matrix P[9*C_in, R*W] in VMEM by 9 lane rolls of the
    halo'd block, then a single [C_out, 9*C_in] x [9*C_in, R*W] dot.

Both fuse the bias add + LeakyReLU epilogue (ESRGAN's per-conv tail) so
dense-block conv chains make one HBM pass per conv. Reference scope:
the reference's ConvolutionConverter (Converters.swift:187-338) with MPS
doing the scheduling; here the schedule IS the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _lane_iota(shape, axis=-1):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1
                                    if axis == -1 else axis)


# -- variant 1: per-row dots on [rows, C, W] blocks ------------------------


def _rowdot_kernel(x_hbm, w_ref, b_ref, o_ref, xs2, sems, *, rows: int,
                   cin: int, cout: int, width: int, h: int, alpha,
                   out_dtype):
    s = pl.program_id(0)
    nrb = h // rows
    total = x_hbm.shape[0] * nrb

    # Double-buffered halo'd row blocks (xs2/sems are pallas_call
    # scratch, persistent across grid steps): at step s the block was
    # prefetched during step s-1; issue step s+1 before computing.
    def copies(slot, step):
        b = step // nrb
        r0 = (step % nrb) * rows
        return (
            pltpu.make_async_copy(x_hbm.at[b, pl.ds(r0, rows)],
                                  xs2.at[slot, pl.ds(1, rows)],
                                  sems.at[slot, 0]),
            pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(jnp.maximum(r0 - 1, 0), 1)],
                xs2.at[slot, pl.ds(0, 1)], sems.at[slot, 1]),
            pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(jnp.minimum(r0 + rows, h - 1), 1)],
                xs2.at[slot, pl.ds(rows + 1, 1)], sems.at[slot, 2]),
        )

    cur = s % 2
    nxt = (s + 1) % 2

    @pl.when(s == 0)
    def _():
        for cp in copies(cur, s):
            cp.start()

    @pl.when(s + 1 < total)
    def _():
        for cp in copies(nxt, s + 1):
            cp.start()

    for cp in copies(cur, s):
        cp.wait()
    r0 = (s % nrb) * rows
    xs = xs2.at[cur]

    @pl.when(r0 == 0)
    def _():
        xs[0] = jnp.zeros((cin, width), xs2.dtype)

    @pl.when(r0 + rows == h)
    def _():
        xs[rows + 1] = jnp.zeros((cin, width), xs2.dtype)

    bias = b_ref[:].astype(jnp.float32)  # (cout, 1)
    for r in range(rows):
        x3 = xs[pl.ds(r, 3)].reshape(3 * cin, width)
        t = jnp.dot(w_ref[:].astype(x3.dtype), x3,
                    preferred_element_type=jnp.float32)
        # t rows [dx*cout:(dx+1)*cout]; out[w] = sum_dx t_dx[w + dx - 1]
        lane = _lane_iota((cout, width))
        left = pltpu.roll(t[0:cout], 1, 1)
        left = jnp.where(lane == 0, 0.0, left)
        right = pltpu.roll(t[2 * cout:3 * cout], width - 1, 1)
        right = jnp.where(lane == width - 1, 0.0, right)
        acc = t[cout:2 * cout] + left + right + bias
        if alpha is not None:
            acc = jnp.where(acc >= 0, acc, alpha * acc)
        o_ref[0, r] = acc.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("alpha", "rows", "interpret"))
def pixel_conv_rowdot(x, w, bias, *, alpha=None, rows: int = 8,
                      interpret: bool | None = None):
    """x: (B, H, C_in, W) NHCW; w: (C_out, C_in, 3, 3) OIHW; bias (C_out,).
    3x3 / stride 1 / pad 1. Returns (B, H, C_out, W). alpha: LeakyReLU
    slope fused into the epilogue (None = linear). interpret=None
    auto-selects interpret mode off-TPU (repo kernel convention)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, h, cin, width = x.shape
    cout = w.shape[0]
    rows = min(rows, h)
    assert h % rows == 0, "H must divide into row blocks"
    # W2[dx*cout + o, dy*cin + c] = w[o, c, dy, dx]
    w2 = jnp.transpose(w, (3, 0, 1, 2))          # (dx, o, c, dy)
    w2 = jnp.transpose(w2, (0, 1, 3, 2))         # (dx, o, dy, c)
    w2 = w2.reshape(3 * cout, 3 * cin)
    kernel = functools.partial(
        _rowdot_kernel, rows=rows, cin=cin, cout=cout, width=width, h=h,
        alpha=alpha, out_dtype=x.dtype)
    nrb = h // rows
    return pl.pallas_call(
        kernel,
        grid=(bsz * nrb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3 * cout, 3 * cin), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, cout, width),
                               lambda s, n=nrb: (s // n, s % n, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rows + 2, cin, width), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        out_shape=jax.ShapeDtypeStruct((bsz, h, cout, width), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * width * 9 * cin * cout,
            bytes_accessed=int(x.size * x.dtype.itemsize
                               + bsz * h * cout * width * x.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w2.astype(x.dtype), bias.reshape(cout, 1))


# -- int8 variant: int8 activations + weights on the int8 MXU --------------


def _rowdot_q_kernel(x_hbm, w_ref, s_ref, b_ref, o_ref, xs2, sems, *,
                     rows: int, cin: int, cout: int, width: int, h: int,
                     alpha, inv_sy: float, requant: bool):
    s = pl.program_id(0)
    nrb = h // rows
    total = x_hbm.shape[0] * nrb

    def copies(slot, step):
        b = step // nrb
        r0 = (step % nrb) * rows
        return (
            pltpu.make_async_copy(x_hbm.at[b, pl.ds(r0, rows)],
                                  xs2.at[slot, pl.ds(1, rows)],
                                  sems.at[slot, 0]),
            pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(jnp.maximum(r0 - 1, 0), 1)],
                xs2.at[slot, pl.ds(0, 1)], sems.at[slot, 1]),
            pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(jnp.minimum(r0 + rows, h - 1), 1)],
                xs2.at[slot, pl.ds(rows + 1, 1)], sems.at[slot, 2]),
        )

    cur = s % 2
    nxt = (s + 1) % 2

    @pl.when(s == 0)
    def _():
        for cp in copies(cur, s):
            cp.start()

    @pl.when(s + 1 < total)
    def _():
        for cp in copies(nxt, s + 1):
            cp.start()

    for cp in copies(cur, s):
        cp.wait()
    r0 = (s % nrb) * rows
    xs = xs2.at[cur]

    @pl.when(r0 == 0)
    def _():
        xs[0] = jnp.zeros((cin, width), xs2.dtype)

    @pl.when(r0 + rows == h)
    def _():
        xs[rows + 1] = jnp.zeros((cin, width), xs2.dtype)

    scale = s_ref[:].astype(jnp.float32)   # (cout, 1): sx * sw[o]
    bias = b_ref[:].astype(jnp.float32)    # (cout, 1)
    for r in range(rows):
        x3 = xs[pl.ds(r, 3)].reshape(3 * cin, width)
        t = jax.lax.dot_general(
            w_ref[:], x3, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        lane = _lane_iota((cout, width))
        left = pltpu.roll(t[0:cout], 1, 1)
        left = jnp.where(lane == 0, 0, left)
        right = pltpu.roll(t[2 * cout:3 * cout], width - 1, 1)
        right = jnp.where(lane == width - 1, 0, right)
        acc = ((t[cout:2 * cout] + left + right).astype(jnp.float32)
               * scale + bias)
        if alpha is not None:
            acc = jnp.where(acc >= 0, acc, alpha * acc)
        if requant:
            q = jnp.round(acc * inv_sy)
            o_ref[0, r] = jnp.clip(q, -127, 127).astype(jnp.int8)
        else:
            o_ref[0, r] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("alpha", "rows", "inv_sy",
                                             "requant", "out_dtype",
                                             "interpret"))
def pixel_conv_rowdot_q(x, w_q, scales, bias, *, alpha=None,
                        inv_sy: float = 1.0, requant: bool = True,
                        out_dtype=jnp.bfloat16, rows: int = 8,
                        interpret: bool | None = None):
    """int8-in/int8-out pixel conv: x (B, H, C_in, W) int8; w_q (C_out,
    C_in, 3, 3) int8; scales (C_out,) = sx * sw per output channel; bias
    (C_out,) float. The dot runs int8 x int8 -> int32 on the MXU (394
    TOP/s envelope) and the dequant -> bias -> LeakyReLU -> requant
    epilogue stays in-register — activations cross HBM as int8, halving
    the bandwidth of the bf16 kernel. requant=False returns out_dtype
    floats (for the last conv of a chain)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, h, cin, width = x.shape
    cout = w_q.shape[0]
    rows = min(rows, h)
    assert h % rows == 0, "H must divide into row blocks"
    w2 = jnp.transpose(w_q, (3, 0, 1, 2))
    w2 = jnp.transpose(w2, (0, 1, 3, 2)).reshape(3 * cout, 3 * cin)
    odt = jnp.int8 if requant else jnp.dtype(out_dtype)
    kernel = functools.partial(
        _rowdot_q_kernel, rows=rows, cin=cin, cout=cout, width=width, h=h,
        alpha=alpha, inv_sy=float(inv_sy), requant=requant)
    nrb = h // rows
    return pl.pallas_call(
        kernel,
        grid=(bsz * nrb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3 * cout, 3 * cin), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, cout, width),
                               lambda s, n=nrb: (s // n, s % n, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rows + 2, cin, width), jnp.int8),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        out_shape=jax.ShapeDtypeStruct((bsz, h, cout, width), odt),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * width * 9 * cin * cout,
            bytes_accessed=int(x.size + bsz * h * cout * width),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w2, scales.reshape(cout, 1).astype(jnp.float32),
      bias.reshape(cout, 1).astype(jnp.float32))


# -- variant 1b: one block-wide dot per row block --------------------------


def _blockdot_kernel(x_hbm, w_ref, b_ref, o_ref, *, rows: int, cin: int,
                     cout: int, width: int, h: int, alpha, out_dtype):
    b = pl.program_id(0)
    rb = pl.program_id(1)
    r0 = rb * rows
    rw = rows * width

    def body(xs, rhs, sem, sem_t, sem_b):
        cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(r0, rows)],
                                   xs.at[pl.ds(1, rows)], sem)
        cp.start()
        top = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(jnp.maximum(r0 - 1, 0), 1)],
            xs.at[pl.ds(0, 1)], sem_t)
        bot = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(jnp.minimum(r0 + rows, h - 1), 1)],
            xs.at[pl.ds(rows + 1, 1)], sem_b)
        top.start()
        bot.start()
        cp.wait()
        top.wait()
        bot.wait()

        @pl.when(r0 == 0)
        def _():
            xs[0] = jnp.zeros((cin, width), xs.dtype)

        @pl.when(r0 + rows == h)
        def _():
            xs[rows + 1] = jnp.zeros((cin, width), xs.dtype)

        # rhs[:, r*W:(r+1)*W] = rows [r, r+3) flattened — a sublane view
        for r in range(rows):
            rhs[:, r * width:(r + 1) * width] = (
                xs[pl.ds(r, 3)].reshape(3 * cin, width))
        t = jnp.dot(w_ref[:].astype(rhs.dtype), rhs[:],
                    preferred_element_type=jnp.float32)
        lane = _lane_iota((cout, rw))
        left = pltpu.roll(t[0:cout], 1, 1)
        left = jnp.where(lane % width == 0, 0.0, left)
        right = pltpu.roll(t[2 * cout:3 * cout], rw - 1, 1)
        right = jnp.where(lane % width == width - 1, 0.0, right)
        acc = t[cout:2 * cout] + left + right + b_ref[:].astype(jnp.float32)
        if alpha is not None:
            acc = jnp.where(acc >= 0, acc, alpha * acc)
        acc = acc.astype(out_dtype)
        for r in range(rows):
            o_ref[0, r] = acc[:, r * width:(r + 1) * width]

    pl.run_scoped(
        body,
        xs=pltpu.VMEM((rows + 2, cin, width), x_hbm.dtype),
        rhs=pltpu.VMEM((3 * cin, rw), x_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA(()),
        sem_t=pltpu.SemaphoreType.DMA(()),
        sem_b=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("alpha", "rows", "interpret"))
def pixel_conv_blockdot(x, w, bias, *, alpha=None, rows: int = 16,
                        interpret: bool | None = None):
    """Same contract as pixel_conv_rowdot but one [3*C_out, 3*C_in] x
    [3*C_in, rows*W] MXU dot per row block (fewer, bigger dots)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, h, cin, width = x.shape
    cout = w.shape[0]
    rows = min(rows, h)
    assert h % rows == 0, "H must divide into row blocks"
    w2 = jnp.transpose(w, (3, 0, 1, 2))
    w2 = jnp.transpose(w2, (0, 1, 3, 2)).reshape(3 * cout, 3 * cin)
    kernel = functools.partial(
        _blockdot_kernel, rows=rows, cin=cin, cout=cout, width=width, h=h,
        alpha=alpha, out_dtype=x.dtype)
    return pl.pallas_call(
        kernel,
        grid=(bsz, h // rows),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3 * cout, 3 * cin), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, cout, width),
                               lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, cout, width), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * width * 9 * cin * cout,
            bytes_accessed=int(x.size * x.dtype.itemsize
                               + bsz * h * cout * width * x.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w2.astype(x.dtype), bias.reshape(cout, 1))


# -- variant 2: one big patch dot on [C, H*W] blocks -----------------------


def _patch_kernel(x_hbm, w_ref, b_ref, o_ref, *, rows: int, cin: int,
                  cout: int, width: int, h: int, alpha, out_dtype):
    b = pl.program_id(0)
    rb = pl.program_id(1)
    r0 = rb * rows
    rw = rows * width

    def body(xs, patches, sem, sem_t, sem_b):
        cp = pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(r0 * width, rw)],
            xs.at[:, pl.ds(width, rw)], sem)
        cp.start()
        top = pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(jnp.maximum(r0 - 1, 0) * width, width)],
            xs.at[:, pl.ds(0, width)], sem_t)
        bot = pltpu.make_async_copy(
            x_hbm.at[b, :,
                     pl.ds(jnp.minimum(r0 + rows, h - 1) * width, width)],
            xs.at[:, pl.ds(width + rw, width)], sem_b)
        top.start()
        bot.start()
        cp.wait()
        top.wait()
        bot.wait()

        @pl.when(r0 == 0)
        def _():
            xs[:, pl.ds(0, width)] = jnp.zeros((cin, width), xs.dtype)

        @pl.when(r0 + rows == h)
        def _():
            xs[:, pl.ds(width + rw, width)] = jnp.zeros((cin, width),
                                                        xs.dtype)

        # P[(dy*3+dx)*cin + c, p] = xs[c, p + dy*width + dx - 1]
        lane = _lane_iota((cin, rw))
        full = xs[:]
        for dy in range(3):
            for dx in range(3):
                off = dy * width + dx - 1
                n_lanes = (rows + 2) * width
                tap = pltpu.roll(full, (-off) % n_lanes, 1)[:, :rw]
                if dx == 0:
                    tap = jnp.where(lane % width == 0, 0.0, tap)
                elif dx == 2:
                    tap = jnp.where(lane % width == width - 1, 0.0, tap)
                patches[pl.ds((dy * 3 + dx) * cin, cin)] = tap
        acc = jnp.dot(w_ref[:].astype(patches.dtype), patches[:],
                      preferred_element_type=jnp.float32)
        acc = acc + b_ref[:].astype(jnp.float32)
        if alpha is not None:
            acc = jnp.where(acc >= 0, acc, alpha * acc)
        o_ref[0] = acc.astype(out_dtype)

    pl.run_scoped(
        body,
        xs=pltpu.VMEM((cin, (rows + 2) * width), x_hbm.dtype),
        patches=pltpu.VMEM((9 * cin, rw), x_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA(()),
        sem_t=pltpu.SemaphoreType.DMA(()),
        sem_b=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("alpha", "rows", "width",
                                             "interpret"))
def pixel_conv_patch(x, w, bias, *, width: int, alpha=None, rows: int = 8,
                     interpret: bool | None = None):
    """x: (B, C_in, H*W) flat NCHW; w: (C_out, C_in, 3, 3); bias (C_out,).
    3x3 / stride 1 / pad 1 on an (H, W=width) map. Returns
    (B, C_out, H*W). interpret=None auto-selects interpret off-TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, cin, hw = x.shape
    h = hw // width
    cout = w.shape[0]
    rows = min(rows, h)
    assert h % rows == 0, "H must divide into row blocks"
    # W2[o, (dy*3+dx)*cin + c] = w[o, c, dy, dx]
    w2 = jnp.transpose(w, (0, 2, 3, 1)).reshape(cout, 9 * cin)
    kernel = functools.partial(
        _patch_kernel, rows=rows, cin=cin, cout=cout, width=width, h=h,
        alpha=alpha, out_dtype=x.dtype)
    return pl.pallas_call(
        kernel,
        grid=(bsz, h // rows),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((cout, 9 * cin), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cout, rows * width),
                               lambda b, r: (b, 0, r),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, cout, hw), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * hw * 9 * cin * cout,
            bytes_accessed=int(x.size * x.dtype.itemsize
                               + bsz * cout * hw * x.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w2.astype(x.dtype), bias.reshape(cout, 1))


# -- reference + public entry ----------------------------------------------


def pixel_conv_reference(x_nchw, w, bias, *, alpha=None):
    """jnp reference on plain NCHW: XLA conv + bias + LeakyReLU."""
    from jax import lax

    y = lax.conv_general_dilated(
        x_nchw, w.astype(x_nchw.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    y = y + bias.reshape(1, -1, 1, 1).astype(y.dtype)
    if alpha is not None:
        y = jnp.where(y >= 0, y, jnp.asarray(alpha, y.dtype) * y)
    return y
