"""Neural-net op lowerings: conv family, pooling, normalization, softmax,
resize/upsample, attention-adjacent ops.

Covers the reference's converter inventory (reference:
Sources/Smelter/Converters.swift — ConvolutionConverter :187-338, pooling
:578-695, softmax :697-714/:1213-1231, BN/IN/GN :730-827/:992-1054/
:1272-1300, Upsample :478-552) with ONNX-general semantics: all ranks,
any softmax axis (the reference requires axis==1, Converters.swift:704),
grouped/depthwise conv via XLA feature_group_count (the reference detects
depthwise by groups==outputChannels, Converters.swift:57-66).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ir.errors import NotSupportedError
from ..ir.graph import Node
from . import padding as P
from .registry import Ctx, register
from .resize_utils import resize_spatial


def _spatial_dim_numbers(rank: int):
    sp = "DHW"[3 - rank :] if rank <= 3 else None
    if sp is None:
        raise NotSupportedError(f"conv with {rank} spatial dims")
    return ("NC" + sp, "OI" + sp, "NC" + sp)


def _layout(node: Node) -> str:
    """Activation layout this node was rewritten to by the layout pass
    (passes/layout.py): "NCHW" (ONNX default) or "NHWC" (TPU-preferred,
    4-D only; conv weights pre-relaid to HWIO offline)."""
    return node.attr("data_layout", "NCHW")


def _conv_attrs(node: Node, rank: int):
    strides = tuple(node.attr("strides", [1] * rank))
    dilations = tuple(node.attr("dilations", [1] * rank))
    group = int(node.attr("group", 1))
    return strides, dilations, group


def _add_bias(y, b, layout: str = "NCHW"):
    # b: (C,)
    if layout == "NHWC":
        return y + b
    return y + b.reshape((1, -1) + (1,) * (y.ndim - 2))


@register("Conv")
def conv(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    w = ctx.get(node.inputs[1])
    layout = _layout(node)
    rank = x.ndim - 2
    strides, dilations, group = _conv_attrs(node, rank)
    if layout == "NHWC":
        # weight pre-relaid to HWIO by the layout pass
        kernel = tuple(w.shape[:2])
        in_spatial = tuple(x.shape[1:3])
        dn = ("NHWC", "HWIO", "NHWC")
    else:
        kernel = tuple(w.shape[2:])
        in_spatial = tuple(x.shape[2:])
        dn = _spatial_dim_numbers(rank)
    pads = P.resolve_pads(node, in_spatial, kernel, strides, dilations)
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=strides,
        padding=pads,
        rhs_dilation=dilations,
        dimension_numbers=dn,
        feature_group_count=group,
    )
    if len(node.inputs) > 2 and node.inputs[2]:
        y = _add_bias(y, ctx.get(node.inputs[2]).astype(y.dtype), layout)
    ctx.set(node.outputs[0], y)


@register("PixelConv")
def pixel_conv(ctx: Ctx, node: Node):
    """Pixel-major 3x3/s1/p1 conv on NHCW activations (inserted by
    passes/pixel_regions.py): the Pallas kernel puts W on the MXU lanes so
    small C_out pays no lane padding — 2.5x on ESRGAN RRDB trunks
    (kernels/pixel_conv.py, experiments/tpu_probe43.py). Optional fused
    LeakyRelu/Relu epilogue via the alpha attr."""
    from ..kernels.pixel_conv import pixel_conv_rowdot

    x = ctx.get(node.inputs[0])            # (B, H, C_in, W)
    w = ctx.get(node.inputs[1])            # (C_out, C_in, 3, 3)
    b = ctx.get(node.inputs[2])
    alpha = node.attrs.get("alpha")
    rows = 16 if x.shape[1] % 16 == 0 else 8
    y = pixel_conv_rowdot(x, w, b,
                          alpha=None if alpha is None else float(alpha),
                          rows=rows)
    ctx.set(node.outputs[0], y)


@register("PixelConvQ")
def pixel_conv_q(ctx: Ctx, node: Node):
    """int8 pixel-major 3x3/s1/p1 conv on NHCW int8 activations (inserted
    by quant/pixel_quant.py from calibrated scales): int8 x int8 -> int32
    on the MXU, dequant -> bias -> LeakyReLU -> requant epilogue
    in-register, activations cross HBM as int8 — half the bf16 trunk's
    bytes (kernels/pixel_conv.py::pixel_conv_rowdot_q, probe45: 1.37x over
    the bf16 kernel on an RRDB trunk). requant=0 returns floats (last conv
    of a chain). Inputs: x_q, w_q, scales (= s_x * s_w[c_out]), bias."""
    from ..kernels.pixel_conv import pixel_conv_rowdot_q

    x = ctx.get(node.inputs[0])            # (B, H, C_in, W) int8
    wq = ctx.get(node.inputs[1])           # (C_out, C_in, 3, 3) int8
    sc = ctx.get(node.inputs[2])           # (C_out,) f32
    b = ctx.get(node.inputs[3])
    alpha = node.attrs.get("alpha")
    cfg = ctx.config
    out_dtype = jnp.dtype(cfg.compute_dtype if cfg is not None
                          else "float32")
    rows = 16 if x.shape[1] % 16 == 0 else 8
    y = pixel_conv_rowdot_q(
        x, wq, sc, b,
        alpha=None if alpha is None else float(alpha),
        inv_sy=float(node.attr("inv_sy", 1.0)),
        requant=bool(node.attr("requant", 1)),
        out_dtype=out_dtype, rows=rows)
    ctx.set(node.outputs[0], y)


@register("PixelNearestUp")
def pixel_nearest_up(ctx: Ctx, node: Node):
    """Integer-scale nearest upsample on NHCW activations (inserted by
    passes/pixel_regions.py so ESRGAN-style trunks stay in the pixel-conv
    layout through their upsample tail). Broadcast-reshape on dims 1 (H)
    and 3 (W) — the fastest nearest formulation (probe20)."""
    x = ctx.get(node.inputs[0])                 # (B, H, C, W)
    sh = int(node.attr("sh", 2))
    sw = int(node.attr("sw", 2))
    b, h, c, w = x.shape
    y = jnp.broadcast_to(x.reshape(b, h, 1, c, w, 1),
                         (b, h, sh, c, w, sw))
    ctx.set(node.outputs[0], y.reshape(b, h * sh, c, w * sw))


@register("ConvTranspose")
def conv_transpose(ctx: Ctx, node: Node):
    """ONNX ConvTranspose: weight layout (C_in, C_out/group, *k).

    Lowered as an input-dilated forward conv with a spatially-flipped,
    transposed kernel — the standard XLA formulation; output size matches the
    reference's closed form (ONNXConvolutionPadding.swift:102-113). Under
    the NHWC layout pass, initializer weights are relaid to the flipped
    HWIO kernel OFFLINE (passes/layout.py::_convt_weight_nhwc, marked
    weight_prepped — same no-runtime-transpose guarantee as Conv); dynamic
    weights stay a layout barrier."""
    x = ctx.get(node.inputs[0])
    w = ctx.get(node.inputs[1])
    layout = _layout(node)
    nhwc = layout == "NHWC"
    prepped = bool(node.attr("weight_prepped", 0))  # layout pass relaid it
    rank = x.ndim - 2
    sp0 = 1 if nhwc else 2
    in_spatial = tuple(x.shape[sp0:sp0 + rank])
    strides, dilations, group = _conv_attrs(node, rank)
    kernel = tuple(w.shape[:rank]) if prepped else tuple(w.shape[2:])
    out_pad = tuple(node.attr("output_padding", [0] * rank))
    out_shape_attr = node.attr("output_shape")
    if out_shape_attr is not None:
        # ONNX: pads are derived from the requested output size —
        # total[i] = stride*(in-1) + output_padding + eff_kernel - out_size,
        # split per auto_pad (SAME_UPPER puts the extra at the start).
        osz = [int(v) for v in out_shape_attr][-rank:]
        auto_pad = node.attr("auto_pad", "NOTSET")
        auto_pad = auto_pad.decode() if isinstance(auto_pad, bytes) else auto_pad
        pads = []
        for i in range(rank):
            eff = P.effective_kernel(kernel[i], dilations[i])
            total = (strides[i] * (in_spatial[i] - 1) + out_pad[i]
                     + eff - osz[i])
            half = total // 2 if total >= 0 else -((-total) // 2)
            if auto_pad == "SAME_UPPER":
                pads.append((half, total - half))
            else:
                pads.append((total - half, half))
    else:
        pads = P.resolve_pads(node, in_spatial, kernel, strides,
                              dilations)

    if prepped:
        # the layout pass already built the flipped HWIO forward kernel
        # offline — zero runtime transform (parity with Conv's relayout)
        wt = w
        dn = ("NHWC", "HWIO", "NHWC")
    else:
        cin = w.shape[0]
        cout_per_g = w.shape[1]
        in_per_g = cin // group
        # (C_in, C_out/g, *k) -> (C_out, C_in/g, *k), flipped spatially.
        wt = w.reshape((group, in_per_g, cout_per_g) + kernel)
        wt = jnp.moveaxis(wt, 2, 1)  # (g, cout/g, in/g, *k)
        wt = wt.reshape((group * cout_per_g, in_per_g) + kernel)
        wt = jnp.flip(wt, axis=tuple(range(2, 2 + rank)))
        if nhwc:  # dynamic weight under NHWC: transform in-graph
            wt = jnp.transpose(wt, tuple(range(2, 2 + rank)) + (1, 0))
            dn = ("NHWC", "HWIO", "NHWC")
        else:
            dn = _spatial_dim_numbers(rank)

    conv_pads = []
    for i in range(rank):
        eff = P.effective_kernel(kernel[i], dilations[i])
        lo = eff - 1 - pads[i][0]
        hi = eff - 1 - pads[i][1] + out_pad[i]
        conv_pads.append((lo, hi))
    y = lax.conv_general_dilated(
        x,
        wt.astype(x.dtype),
        window_strides=(1,) * rank,
        padding=conv_pads,
        lhs_dilation=strides,
        rhs_dilation=dilations,
        dimension_numbers=dn,
        feature_group_count=group,
    )
    if len(node.inputs) > 2 and node.inputs[2]:
        y = _add_bias(y, ctx.get(node.inputs[2]).astype(y.dtype), layout)
    ctx.set(node.outputs[0], y)


@register("Gemm")
def gemm(ctx: Ctx, node: Node):
    a = ctx.get(node.inputs[0])
    b = ctx.get(node.inputs[1])
    alpha = node.attr("alpha", 1.0)
    beta = node.attr("beta", 1.0)
    if a.ndim > 2:
        # FC over feature maps: mirror the reference's Gemm-as-1x1-conv
        # behavior (Converters.swift:228-232) by flattening to (N, -1).
        a = a.reshape((a.shape[0], -1))
    if node.attr("transA", 0):
        a = a.T
    if node.attr("transB", 0):
        b = b.T
    y = jnp.dot(a, b.astype(a.dtype), preferred_element_type=jnp.float32).astype(a.dtype)
    if alpha != 1.0:
        y = y * jnp.asarray(alpha, y.dtype)
    if len(node.inputs) > 2 and node.inputs[2]:
        c = ctx.get(node.inputs[2]).astype(y.dtype)
        y = y + (c if beta == 1.0 else c * jnp.asarray(beta, y.dtype))
    ctx.set(node.outputs[0], y)


@register("MatMul")
def matmul(ctx: Ctx, node: Node):
    a = ctx.get(node.inputs[0])
    b = ctx.get(node.inputs[1])
    y = jnp.matmul(a, b.astype(a.dtype), preferred_element_type=jnp.float32).astype(a.dtype)
    ctx.set(node.outputs[0], y)


# -- pooling --------------------------------------------------------------


def _pool_prep(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    layout = _layout(node)
    rank = x.ndim - 2
    kernel = tuple(node.attr("kernel_shape"))
    strides = tuple(node.attr("strides", [1] * rank))
    dilations = tuple(node.attr("dilations", [1] * rank))
    sp0 = 1 if layout == "NHWC" else 2
    in_spatial = tuple(x.shape[sp0:sp0 + rank])
    pads = P.resolve_pads(node, in_spatial, kernel, strides, dilations)
    if node.attr("ceil_mode", 0):
        pads = [
            (lo, hi + P.pool_extra_ceil_pad(in_spatial[i], kernel[i], strides[i], dilations[i], lo, hi))
            for i, (lo, hi) in enumerate(pads)
        ]
    return x, rank, kernel, strides, dilations, pads, layout


def _pool_dims(rank, kernel, strides, dilations, pads, layout):
    """Full-rank window/stride/dilation/pad tuples for reduce_window."""
    if layout == "NHWC":
        return ((1,) + kernel + (1,), (1,) + strides + (1,),
                (1,) + dilations + (1,), [(0, 0)] + pads + [(0, 0)])
    return ((1, 1) + kernel, (1, 1) + strides,
            (1, 1) + dilations, [(0, 0), (0, 0)] + pads)


@register("MaxPool")
def max_pool(ctx: Ctx, node: Node):
    x, rank, kernel, strides, dilations, pads, layout = _pool_prep(ctx, node)
    if len(node.outputs) > 1 and node.outputs[1]:
        return _max_pool_with_indices(ctx, node, x, rank, kernel, strides,
                                      dilations, pads, layout)
    neg = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    neg = jnp.asarray(neg, x.dtype)  # keep init dtype == operand dtype (int8 pools)
    wd, ws, wdl, wp = _pool_dims(rank, kernel, strides, dilations, pads, layout)
    y = lax.reduce_window(x, neg, lax.max, window_dimensions=wd,
                          window_strides=ws, window_dilation=wdl, padding=wp)
    ctx.set(node.outputs[0], y)


def _nearest_expand(t, kernel):
    """Broadcast-reshape nearest upsample of the trailing spatial dims by
    integer factors `kernel` (the fastest nearest formulation, probe20)."""
    rank = len(kernel)
    lead = t.shape[:t.ndim - rank]
    sp = t.shape[t.ndim - rank:]
    t = t.reshape(lead + tuple(d for s in sp for d in (s, 1)))
    t = jnp.broadcast_to(
        t, lead + tuple(d for i, s in enumerate(sp)
                        for d in (s, kernel[i])))
    return t.reshape(lead + tuple(sp[i] * kernel[i] for i in range(rank)))


def _flat_spatial_pos(cov, full_spatial, idt):
    """Row-major flat index into `full_spatial` for every coordinate of the
    covered region `cov` (cov[i] <= full_spatial[i]); shape cov."""
    flat = jnp.arange(cov[0], dtype=idt)
    for i in range(1, len(cov)):
        flat = flat[..., None] * full_spatial[i] + jnp.arange(cov[i],
                                                              dtype=idt)
    return flat


def _max_pool_indices_nonoverlap(ctx: Ctx, node: Node, x, rank, kernel, neg):
    """kernel==stride, no pads (the SegNet encoder case): max via native
    reduce_window, indices via nearest-upsample compare + reduce_window min
    — no tap-stack strided slices, no argmax gather (probe37: the tap-stack
    form cost 11.4 ms where this one is reduce_window-bound)."""
    in_spatial = x.shape[2:]
    out_spatial = tuple(in_spatial[i] // kernel[i] for i in range(rank))
    cov = tuple(out_spatial[i] * kernel[i] for i in range(rank))
    xc = x[(slice(None), slice(None)) + tuple(slice(0, c) for c in cov)]
    wd = (1, 1) + tuple(kernel)
    y = lax.reduce_window(xc, neg, lax.max, window_dimensions=wd,
                          window_strides=wd, padding="VALID")
    idt = jax.dtypes.canonicalize_dtype(jnp.int64)
    big = jnp.asarray(jnp.iinfo(idt).max, idt)
    # first-max in row-major tap order == min flat position among maxima
    mask = xc == _nearest_expand(y, kernel)
    pos = _flat_spatial_pos(cov, in_spatial, idt)
    cand = jnp.where(mask, pos, big)
    spatial_idx = lax.reduce_window(cand, big, lax.min,
                                    window_dimensions=wd, window_strides=wd,
                                    padding="VALID")
    hw = 1
    for s in in_spatial:
        hw *= s
    n_idx = jnp.arange(x.shape[0], dtype=idt).reshape((-1, 1) + (1,) * rank)
    c_idx = jnp.arange(x.shape[1], dtype=idt).reshape((1, -1) + (1,) * rank)
    full = (n_idx * x.shape[1] + c_idx) * hw + spatial_idx
    ctx.set(node.outputs[0], y)
    ctx.set(node.outputs[1], full)


def _max_pool_with_indices(ctx: Ctx, node: Node, x, rank, kernel, strides,
                           dilations, pads, layout):
    """MaxPool's second output: int64 indices flattened into the input
    tensor (NCHW order, storage_order=0; ONNX MaxPool-12). Materializes
    the kernel-tap stack (prod(kernel) shifted strided slices) and argmaxes
    over taps — first-max tie-breaking in row-major tap order (matches
    torch's return_indices)."""
    import itertools

    if layout == "NHWC":
        raise NotSupportedError("MaxPool indices output under NHWC layout")
    if int(node.attr("storage_order", 0)):
        raise NotSupportedError("MaxPool indices with storage_order=1")
    neg = jnp.asarray(jnp.finfo(x.dtype).min
                      if jnp.issubdtype(x.dtype, jnp.floating)
                      else jnp.iinfo(x.dtype).min, x.dtype)
    if (tuple(strides) == tuple(kernel)
            and all(lo == 0 and hi == 0 for lo, hi in pads)
            and all(d == 1 for d in dilations)):
        return _max_pool_indices_nonoverlap(ctx, node, x, rank, kernel, neg)
    in_spatial = x.shape[2:]
    out_spatial = tuple(
        P.conv_out_size(in_spatial[i], kernel[i], strides[i], dilations[i],
                        pads[i][0], pads[i][1])
        for i in range(rank))
    xp = jnp.pad(x, [(0, 0), (0, 0)] + list(pads), constant_values=neg)

    vals, idxs = [], []
    for taps in itertools.product(*(range(k) for k in kernel)):
        # strided slice of the padded input for this kernel tap
        sl = [slice(None), slice(None)]
        glob = []  # per-dim global (unpadded) input coordinate of the tap
        for i in range(rank):
            start = taps[i] * dilations[i]
            stop = start + (out_spatial[i] - 1) * strides[i] + 1
            sl.append(slice(start, stop, strides[i]))
            coord = (jnp.arange(out_spatial[i]) * strides[i]
                     + start - pads[i][0])
            glob.append(coord)
        vals.append(xp[tuple(sl)])
        # flat spatial index (row-major over the input spatial dims)
        flat = glob[0]
        for i in range(1, rank):
            flat = flat[..., None] * in_spatial[i] + glob[i]
        idxs.append(flat)
    stack = jnp.stack(vals)                        # (T, N, C, *out)
    tap_flat = jnp.stack(idxs)                     # (T, *out) spatial index
    best = jnp.argmax(stack, axis=0)               # (N, C, *out) first max
    y = jnp.max(stack, axis=0)
    spatial_idx = jnp.take_along_axis(
        tap_flat.reshape((tap_flat.shape[0],) + (1, 1) + tuple(out_spatial)),
        best[None], axis=0)[0]
    # ONNX: index into the flattened [N, C, *spatial] tensor
    hw = 1
    for s in in_spatial:
        hw *= s
    n_idx = jnp.arange(x.shape[0]).reshape((-1, 1) + (1,) * rank)
    c_idx = jnp.arange(x.shape[1]).reshape((1, -1) + (1,) * rank)
    # int64 per ONNX; canonicalized to int32 when x64 is disabled
    idt = jax.dtypes.canonicalize_dtype(jnp.int64)
    full = ((n_idx * x.shape[1] + c_idx) * hw
            + spatial_idx.astype(idt)).astype(idt)
    ctx.set(node.outputs[0], y)
    ctx.set(node.outputs[1], full)


# MaxUnpool 2x2/s2 Pallas kernel gate (probe58/59). Module-level so the
# A/B probes can toggle it; default decided by measurement.
_UNPOOL_KERNEL = True


def _unpool2x2_kernel_ok(x_shape, out_shape, kernel, strides, pads,
                         rank: int) -> bool:
    """Eligibility for the Pallas 2x2/s2 MaxUnpool kernel. Besides the
    geometric match, the kernel computes landing parities on int32
    indices — a flat output index >= 2^31 would wrap and corrupt
    (idx // w_out) % 2 (w_out does not divide 2^32), so huge outputs
    keep the int64 dense path."""
    out_elems = 1
    for d in out_shape:
        out_elems *= int(d)
    return (list(strides) == list(kernel) == [2, 2] and not any(pads)
            and rank == 2 and _UNPOOL_KERNEL
            and tuple(out_shape[2:]) == (2 * x_shape[2], 2 * x_shape[3])
            and out_elems < 2 ** 31)

@register("MaxUnpool", since=9, static={2})
def max_unpool(ctx: Ctx, node: Node):
    """Inverse of MaxPool-with-indices (SegNet-style decoders): scatter X's
    values to the flat [N,C,*spatial] positions in I (the convention
    _max_pool_with_indices emits), zeros elsewhere. Output spatial dims
    from input[2] output_shape when given, else the closed-form inverse
    (x-1)*stride + kernel - pads."""
    x = ctx.get(node.inputs[0])
    idx = ctx.get(node.inputs[1])
    kernel = [int(k) for k in node.attr("kernel_shape")]
    rank = len(kernel)
    strides = [int(s) for s in node.attr("strides", [1] * rank)]
    pads = [int(p) for p in node.attr("pads", [0] * (2 * rank))]
    if len(node.inputs) > 2 and node.inputs[2]:
        out_shape = tuple(int(d) for d in
                          ctx.static(node.inputs[2]).reshape(-1))
    else:
        spatial = tuple(
            (x.shape[2 + i] - 1) * strides[i] + kernel[i]
            - pads[i] - pads[rank + i]
            for i in range(rank))
        out_shape = x.shape[:2] + spatial
    if _unpool2x2_kernel_ok(x.shape, out_shape, kernel, strides, pads,
                            rank):
        # Pallas kernel: parity-of-flat-index landing, in/out read once
        # (probe58: XLA's dense form ran the full-res SegNet unpool at
        # ~16x its traffic bound; probe59 measures the kernel e2e)
        from ..kernels.max_unpool import max_unpool2x2

        ctx.set(node.outputs[0], max_unpool2x2(x, idx.reshape(x.shape)))
        return
    if list(strides) == list(kernel) and not any(pads):
        # Non-overlapping windows (the SegNet case): each input value lands
        # at exactly one position of its k-window, so the scatter becomes
        # nearest-upsample x AND idx, then keep the position whose global
        # flat index equals idx — pure elementwise, no scatter, no one-hot
        # interleave transpose (probe37: the one-hot form cost 109 ms/pair
        # where this one is bandwidth-bound; a global flat scatter
        # serializes outright — SegNet b16 at 52 img/s).
        up_spatial = tuple(x.shape[2 + i] * kernel[i] for i in range(rank))
        idt = jax.dtypes.canonicalize_dtype(jnp.int64)
        xu = _nearest_expand(x, kernel)
        iu = _nearest_expand(idx.reshape(x.shape).astype(idt), kernel)
        hw = 1
        for s in out_shape[2:]:
            hw *= s
        pos = _flat_spatial_pos(up_spatial, out_shape[2:], idt)
        n_idx = jnp.arange(x.shape[0], dtype=idt).reshape(
            (-1, 1) + (1,) * rank)
        c_idx = jnp.arange(x.shape[1], dtype=idt).reshape(
            (1, -1) + (1,) * rank)
        gpos = (n_idx * x.shape[1] + c_idx) * hw + pos
        y = jnp.where(iu == gpos, xu, jnp.zeros((), x.dtype))
        # output_shape may ask for one extra (never-indexed) row/col per
        # dim (odd pre-pool sizes) — zero-pad; crop defensively if smaller
        pad_cfg = []
        crop = False
        for i in range(rank):
            d = out_shape[2 + i] - y.shape[2 + i]
            pad_cfg.append((0, max(0, d)))
            crop = crop or d < 0
        if any(p != (0, 0) for p in pad_cfg):
            y = jnp.pad(y, [(0, 0), (0, 0)] + pad_cfg)
        if crop:
            y = y[tuple(slice(None, out_shape[i]) for i in range(len(out_shape)))]
        ctx.set(node.outputs[0], y)
        return
    total = 1
    for d in out_shape:
        total *= d
    flat = jnp.zeros((total,), x.dtype).at[idx.reshape(-1)].set(x.reshape(-1))
    ctx.set(node.outputs[0], flat.reshape(out_shape))


def _window_counts(in_sizes, kernel, strides, dilations, pads) -> np.ndarray:
    """Per-output-window count of non-padding taps (separable per dim)."""
    per_dim = []
    for in_s, k, s, d, (lo, hi) in zip(in_sizes, kernel, strides, dilations, pads):
        out_s = P.conv_out_size(in_s, k, s, d, lo, hi)
        starts = np.arange(out_s) * s - lo
        taps = starts[:, None] + np.arange(k)[None, :] * d
        per_dim.append(((taps >= 0) & (taps < in_s)).sum(axis=1).astype(np.float64))
    counts = per_dim[0]
    for c in per_dim[1:]:
        counts = counts[..., None] * c
    return counts


@register("AveragePool")
def average_pool(ctx: Ctx, node: Node):
    x, rank, kernel, strides, dilations, pads, layout = _pool_prep(ctx, node)
    wd, ws, wdl, wp = _pool_dims(rank, kernel, strides, dilations, pads, layout)
    summed = lax.reduce_window(x, jnp.zeros((), x.dtype), lax.add,
                               window_dimensions=wd, window_strides=ws,
                               window_dilation=wdl, padding=wp)
    if node.attr("count_include_pad", 0):
        div = float(np.prod(kernel))
        y = summed / jnp.asarray(div, x.dtype)
    else:
        sp0 = 1 if layout == "NHWC" else 2
        counts = _window_counts(x.shape[sp0:sp0 + rank], kernel, strides, dilations, pads)
        cshape = (1,) + counts.shape + (1,) if layout == "NHWC" else (1, 1) + counts.shape
        y = summed / jnp.asarray(counts.reshape(cshape), x.dtype)
    ctx.set(node.outputs[0], y)


@register("LpPool")
def lp_pool(ctx: Ctx, node: Node):
    """y = (sum |x|^p over window)^(1/p) — reduce_window over |x|^p."""
    x, rank, kernel, strides, dilations, pads, layout = _pool_prep(ctx, node)
    p = int(node.attr("p", 2))
    wd, ws, wdl, wp = _pool_dims(rank, kernel, strides, dilations, pads, layout)
    xp = jnp.power(jnp.abs(x.astype(jnp.float32)), p)
    summed = lax.reduce_window(xp, jnp.zeros((), xp.dtype), lax.add,
                               window_dimensions=wd, window_strides=ws,
                               window_dilation=wdl, padding=wp)
    ctx.set(node.outputs[0], jnp.power(summed, 1.0 / p).astype(x.dtype))


@register("GlobalLpPool", since=2)
def global_lp_pool(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    p = int(node.attr("p", 2))
    axes = tuple(range(1, x.ndim - 1)) if _layout(node) == "NHWC" else tuple(range(2, x.ndim))
    s = jnp.sum(jnp.power(jnp.abs(x.astype(jnp.float32)), p),
                axis=axes, keepdims=True)
    ctx.set(node.outputs[0], jnp.power(s, 1.0 / p).astype(x.dtype))


@register("GlobalAveragePool")
def global_average_pool(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    axes = tuple(range(1, x.ndim - 1)) if _layout(node) == "NHWC" else tuple(range(2, x.ndim))
    ctx.set(node.outputs[0], jnp.mean(x, axis=axes, keepdims=True))


@register("GlobalMaxPool")
def global_max_pool(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    axes = tuple(range(1, x.ndim - 1)) if _layout(node) == "NHWC" else tuple(range(2, x.ndim))
    ctx.set(node.outputs[0], jnp.max(x, axis=axes, keepdims=True))


# -- normalization --------------------------------------------------------


@register("BatchNormalization")
def batch_norm(ctx: Ctx, node: Node):
    """Inference-style BN, parity with BNDataSource (Converters.swift:730-827)."""
    x = ctx.get(node.inputs[0])
    scale, bias, mean, var = (ctx.get(n).astype(jnp.float32) for n in node.inputs[1:5])
    eps = node.attr("epsilon", 1e-5)
    shape = (-1,) if _layout(node) == "NHWC" else (1, -1) + (1,) * (x.ndim - 2)
    inv = lax.rsqrt(var + eps) * scale
    y = x.astype(jnp.float32) * inv.reshape(shape) + (bias - mean * inv).reshape(shape)
    ctx.set(node.outputs[0], y.astype(x.dtype))


@register("InstanceNormalization")
def instance_norm(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    scale = ctx.get(node.inputs[1]).astype(jnp.float32)
    bias = ctx.get(node.inputs[2]).astype(jnp.float32)
    eps = node.attr("epsilon", 1e-5)
    nhwc = _layout(node) == "NHWC"
    axes = tuple(range(1, x.ndim - 1)) if nhwc else tuple(range(2, x.ndim))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.var(xf, axis=axes, keepdims=True)
    shape = (-1,) if nhwc else (1, -1) + (1,) * (x.ndim - 2)
    y = (xf - mean) * lax.rsqrt(var + eps) * scale.reshape(shape) + bias.reshape(shape)
    ctx.set(node.outputs[0], y.astype(x.dtype))


def _group_norm(x, num_groups: int, scale, bias, eps: float, layout: str = "NCHW"):
    xf = x.astype(jnp.float32)
    if layout == "NHWC":
        n, c = x.shape[0], x.shape[-1]
        spatial = x.shape[1:-1]
        xf = xf.reshape((n,) + spatial + (num_groups, c // num_groups))
        axes = tuple(range(1, xf.ndim - 2)) + (xf.ndim - 1,)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.var(xf, axis=axes, keepdims=True)
        y = ((xf - mean) * lax.rsqrt(var + eps)).reshape(x.shape)
        return y * scale + bias
    n, c = x.shape[:2]
    spatial = x.shape[2:]
    xf = xf.reshape((n, num_groups, c // num_groups) + spatial)
    axes = tuple(range(2, xf.ndim))
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.var(xf, axis=axes, keepdims=True)
    y = ((xf - mean) * lax.rsqrt(var + eps)).reshape(x.shape)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return y * scale.reshape(shape) + bias.reshape(shape)


# Official since opset 18; accepted at any opset (exporters emit it
# earlier, matching the Gelu policy).
@register("GroupNormalization")
def group_normalization(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    scale = ctx.get(node.inputs[1]).astype(jnp.float32)
    bias = ctx.get(node.inputs[2]).astype(jnp.float32)
    y = _group_norm(x, int(node.attr("num_groups")), scale, bias,
                    node.attr("epsilon", 1e-5), _layout(node))
    ctx.set(node.outputs[0], y.astype(x.dtype))


@register("custom_group_norm", static={1})
def custom_group_norm(ctx: Ctx, node: Node):
    """The reference's custom GroupNorm op: inputs [x, groups, gamma, beta]
    with groups/gamma/beta as tensors (Converters.swift:1272-1300,
    registered at ONNXGraph.swift:154)."""
    x = ctx.get(node.inputs[0])
    groups = int(ctx.static(node.inputs[1]).reshape(-1)[0])
    gamma = ctx.get(node.inputs[2]).astype(jnp.float32).reshape(-1)
    beta = ctx.get(node.inputs[3]).astype(jnp.float32).reshape(-1)
    y = _group_norm(x, groups, gamma, beta, node.attr("epsilon", 1e-5), _layout(node))
    ctx.set(node.outputs[0], y.astype(x.dtype))


@register("LayerNormalization", since=17)
def layer_norm(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    scale = ctx.get(node.inputs[1]).astype(jnp.float32)
    axis = node.attr("axis", -1)
    eps = node.attr("epsilon", 1e-5)
    if axis < 0:
        axis += x.ndim
    fln = getattr(ctx.config, "fused_layernorm", "auto") if ctx.config else "auto"
    use_pallas = bool(ctx.config is not None
                      and getattr(ctx.config, "use_pallas", False))
    engage = (fln is True or use_pallas
              or (fln == "auto" and jax.default_backend() == "tpu"))
    if engage and fln is not False and axis == x.ndim - 1 \
            and not any(node.outputs[1:]):
        from ..kernels.layer_norm import fused_layer_norm

        bias = (ctx.get(node.inputs[2])
                if len(node.inputs) > 2 and node.inputs[2]
                else jnp.zeros_like(scale))
        ctx.set(node.outputs[0],
                fused_layer_norm(x, scale, bias, eps=float(eps)))
        return
    axes = tuple(range(axis, x.ndim))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.var(xf, axis=axes, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps) * scale
    if len(node.inputs) > 2 and node.inputs[2]:
        y = y + ctx.get(node.inputs[2]).astype(jnp.float32)
    ctx.set(node.outputs[0], y.astype(x.dtype))
    for extra in node.outputs[1:]:
        if extra:
            raise NotSupportedError("LayerNormalization mean/invstd outputs")


@register("LRN")
def lrn(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    size = int(node.attr("size"))
    alpha = node.attr("alpha", 1e-4)
    beta = node.attr("beta", 0.75)
    bias = node.attr("bias", 1.0)
    sq = jnp.square(x.astype(jnp.float32))
    lo = (size - 1) // 2
    hi = size - 1 - lo
    acc = lax.reduce_window(
        sq, 0.0, lax.add,
        window_dimensions=(1, size) + (1,) * (x.ndim - 2),
        window_strides=(1,) * x.ndim,
        padding=[(0, 0), (lo, hi)] + [(0, 0)] * (x.ndim - 2),
    )
    y = x.astype(jnp.float32) / jnp.power(bias + (alpha / size) * acc, beta)
    ctx.set(node.outputs[0], y.astype(x.dtype))


# -- softmax --------------------------------------------------------------


def _coerce_axis(axis: int, ndim: int) -> int:
    return axis + ndim if axis < 0 else axis


@register("Softmax")
def softmax(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    if ctx.opset >= 13:
        axis = node.attr("axis", -1)
        y = jax.nn.softmax(x, axis=axis)
    else:
        # opset<13: softmax over coalesced dims [axis:] (2D-flatten semantics).
        axis = _coerce_axis(node.attr("axis", 1), x.ndim)
        flat = x.reshape(x.shape[:axis] + (-1,))
        y = jax.nn.softmax(flat, axis=-1).reshape(x.shape)
    ctx.set(node.outputs[0], y)


@register("LogSoftmax")
def log_softmax(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    if ctx.opset >= 13:
        y = jax.nn.log_softmax(x, axis=node.attr("axis", -1))
    else:
        axis = _coerce_axis(node.attr("axis", 1), x.ndim)
        flat = x.reshape(x.shape[:axis] + (-1,))
        y = jax.nn.log_softmax(flat, axis=-1).reshape(x.shape)
    ctx.set(node.outputs[0], y)


# -- resize / upsample ----------------------------------------------------


def _as_str(v) -> str:
    return v.decode() if isinstance(v, bytes) else str(v)


@register("Upsample", static={1})
def upsample(ctx: Ctx, node: Node):
    """Upsample-7 (scales attr) / Upsample-9 (scales input). The linear mode
    honors config.upsample_align_corners, defaulting to align_corners=True to
    match the reference's default (ONNXGraph.swift:20, Converters.swift:530)."""
    x = ctx.get(node.inputs[0])
    if len(node.inputs) > 1 and node.inputs[1]:
        scales = ctx.static(node.inputs[1]).astype(np.float64)
    else:
        scales = np.asarray(node.attr("scales"), np.float64)
    mode = _as_str(node.attr("mode", "nearest"))
    # scales keep ONNX's NCHW ordering even when activations are NHWC/NHCW
    axes = _spatial_axes(node, x.ndim)
    sc = scales[2:]
    out_sizes = tuple(int(np.floor(s * x.shape[a]))
                      for s, a in zip(sc, axes))
    align = True
    if ctx.config is not None:
        align = getattr(ctx.config, "upsample_align_corners", True)
    if mode == "nearest":
        y = resize_spatial(x, out_sizes, mode="nearest", coord_mode="asymmetric",
                           nearest_mode="floor", spatial_axes=axes)
    else:
        coord = "align_corners" if align else "asymmetric"
        y = resize_spatial(x, out_sizes, mode="linear", coord_mode=coord,
                           spatial_axes=axes)
    ctx.set(node.outputs[0], y)


def _spatial_axes(node: Node, ndim: int) -> tuple[int, ...]:
    """Spatial axes under the node's data_layout: NCHW contiguous from 2,
    NHWC from 1, NHCW (pixel-conv regions) = (1, 3) for rank 4."""
    layout = _layout(node)
    if layout == "NHWC":
        return tuple(range(1, ndim - 1))
    if layout == "NHCW":
        return (1, 3)
    return tuple(range(2, ndim))


@register("Resize", since=10, static={1, 2, 3})
def resize(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    mode = _as_str(node.attr("mode", "nearest"))
    coord = _as_str(node.attr("coordinate_transformation_mode", "half_pixel"))
    nearest_mode = _as_str(node.attr("nearest_mode", "round_prefer_floor"))

    axes = _spatial_axes(node, x.ndim)
    roi = None
    if coord == "tf_crop_and_resize":
        # roi input: [start_0..start_{r-1}, end_0..end_{r-1}] over ALL axes
        # (NCHW order); only the spatial entries matter here.
        if len(node.inputs) < 2 or not node.inputs[1]:
            raise NotSupportedError("Resize tf_crop_and_resize without roi")
        r = ctx.static(node.inputs[1]).astype(np.float64).reshape(-1)
        nfull = x.ndim
        n_spatial = nfull - 2
        roi = [(float(r[2 + i]), float(r[nfull + 2 + i]))
               for i in range(n_spatial)]
    out_sizes = None
    if len(node.inputs) > 3 and node.inputs[3]:
        sizes = ctx.static(node.inputs[3]).astype(np.int64)
        out_sizes = tuple(int(s) for s in sizes[2:])  # NCHW-ordered vector
    else:
        scales_in = node.inputs[2] if len(node.inputs) > 2 else node.inputs[1]
        scales = ctx.static(scales_in).astype(np.float64)
        if ctx.opset == 10:
            scales = ctx.static(node.inputs[1]).astype(np.float64)
        sc = scales[2:]  # NCHW-ordered vector
        if roi is not None:
            # ONNX: with tf_crop_and_resize, scales apply to the roi extent
            out_sizes = tuple(
                int(np.floor(s * (e - b) * x.shape[a]))
                for s, (b, e), a in zip(sc, roi, axes))
        else:
            out_sizes = tuple(int(np.floor(s * x.shape[a]))
                              for s, a in zip(sc, axes))
    y = resize_spatial(x, out_sizes, mode=mode, coord_mode=coord,
                       nearest_mode=nearest_mode, spatial_axes=axes, roi=roi,
                       extrapolation_value=float(
                           node.attr("extrapolation_value", 0.0)))
    ctx.set(node.outputs[0], y)


@register("DeformConv", since=19)
def deform_conv(ctx: Ctx, node: Node):
    """Deformable convolution v2 (ONNX opset 19 / torchvision layout):
    per-output-position learned offsets shift each kernel tap, values are
    bilinearly sampled (zeros outside), optional modulation mask.

    Lowered as: build the deformed im2col stack with 4-corner gathers
    (static shapes, dynamic indices), then contract with the weights in a
    single grouped einsum — the heavy math lands on the MXU, the gathers
    are the unavoidable bandwidth cost of the op.
    """
    x = ctx.get(node.inputs[0])            # (N, C, H, W)
    w = ctx.get(node.inputs[1])            # (O, C/g, kH, kW)
    offset = ctx.get(node.inputs[2])       # (N, og*2*kH*kW, oH, oW)
    bias = (ctx.get(node.inputs[3])
            if len(node.inputs) > 3 and node.inputs[3] else None)
    mask = (ctx.get(node.inputs[4])
            if len(node.inputs) > 4 and node.inputs[4] else None)
    if _layout(node) == "NHWC":
        raise NotSupportedError("DeformConv under NHWC layout")
    n, c, h, wid = x.shape
    o, cg, kh, kw = w.shape
    strides, dilations, group = _conv_attrs(node, 2)
    og = int(node.attr("offset_group", 1))
    pads = P.resolve_pads(node, (h, wid), (kh, kw), strides, dilations)
    oh = P.conv_out_size(h, kh, strides[0], dilations[0], *pads[0])
    ow = P.conv_out_size(wid, kw, strides[1], dilations[1], *pads[1])
    t = kh * kw

    # base tap positions (kh, kw, oh, ow)
    iy = jnp.arange(oh) * strides[0] - pads[0][0]
    ix = jnp.arange(ow) * strides[1] - pads[1][0]
    ay = jnp.arange(kh) * dilations[0]
    ax = jnp.arange(kw) * dilations[1]
    base_y = (iy[None, :] + ay[:, None]).astype(jnp.float32)  # (kh, oh)
    base_x = (ix[None, :] + ax[:, None]).astype(jnp.float32)  # (kw, ow)
    off = offset.astype(jnp.float32).reshape(n, og, kh, kw, 2, oh, ow)
    py = base_y[None, None, :, None, :, None] + off[:, :, :, :, 0]
    px = base_x[None, None, None, :, None, :] + off[:, :, :, :, 1]
    py = py.reshape(n, og, t, oh * ow)
    px = px.reshape(n, og, t, oh * ow)

    xg = x.reshape(n, og, c // og, h * wid)
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    dy = py - y0
    dx = px - x0
    s = jnp.zeros((n, og, c // og, t, oh * ow), jnp.float32)
    for cy, cx, cw in ((y0, x0, (1 - dy) * (1 - dx)),
                       (y0, x0 + 1, (1 - dy) * dx),
                       (y0 + 1, x0, dy * (1 - dx)),
                       (y0 + 1, x0 + 1, dy * dx)):
        inb = (cy >= 0) & (cy < h) & (cx >= 0) & (cx < wid)
        yi = jnp.clip(cy, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(cx, 0, wid - 1).astype(jnp.int32)
        flat = (yi * wid + xi).reshape(n, og, 1, -1)
        vals = jnp.take_along_axis(
            xg, jnp.broadcast_to(flat, (n, og, c // og, t * oh * ow)),
            axis=3).reshape(n, og, c // og, t, oh * ow)
        s = s + vals.astype(jnp.float32) * (cw * inb)[:, :, None]
    if mask is not None:
        m = mask.astype(jnp.float32).reshape(n, og, 1, t, oh * ow)
        s = s * m
    sg = s.reshape(n, group, c // group, t, oh * ow)
    wg = w.astype(jnp.float32).reshape(group, o // group, cg, t)
    y = jnp.einsum("ngcts,goct->ngos", sg, wg,
                   preferred_element_type=jnp.float32)
    y = y.reshape(n, o, oh, ow)
    if bias is not None:
        y = y + bias.astype(jnp.float32).reshape(1, -1, 1, 1)
    ctx.set(node.outputs[0], y.astype(x.dtype))


@register("AffineGrid", since=20, static={1})
def affine_grid(ctx: Ctx, node: Node):
    """Sampling grid from affine matrices (pairs with GridSample): theta
    (N,2,3) + size (N,C,H,W) -> (N,H,W,2), or the 3-D (N,3,4) form. The
    base grid is a host-side constant (size is static); only the tiny
    theta matmul is traced."""
    theta = ctx.get(node.inputs[0])
    size = [int(s) for s in np.asarray(ctx.static(node.inputs[1])).reshape(-1)]
    align = bool(node.attr("align_corners", 0))
    spatial = size[2:]
    rank = len(spatial)
    if theta.shape[-2:] != (rank, rank + 1):
        raise NotSupportedError(
            f"AffineGrid theta {theta.shape} vs size rank {rank}")

    def axis_coords(n):
        if align:
            return np.linspace(-1.0, 1.0, n) if n > 1 else np.zeros(n)
        return (2.0 * np.arange(n) + 1.0) / n - 1.0

    # base grid (spatial..., rank+1) with coords ordered (x, y[, z], 1) —
    # x varies along the LAST spatial dim (W), matching torch.affine_grid
    axes = [axis_coords(n) for n in spatial]
    mesh = np.meshgrid(*axes, indexing="ij")  # each (spatial...)
    base = np.stack(list(reversed(mesh)) + [np.ones(spatial)], axis=-1)
    base = jnp.asarray(base.astype(np.float32))
    # grid[n, ..., r] = sum_c base[..., c] * theta[n, r, c]
    grid = jnp.einsum("...c,nrc->n...r", base, theta.astype(jnp.float32))
    ctx.set(node.outputs[0], grid.astype(theta.dtype))


@register("GridSample", since=16)
def grid_sample(ctx: Ctx, node: Node):
    """Bilinear/nearest grid sampling (spatial transformer). x: (N,C,H,W)
    (or (N,H,W,C) under the NHWC layout pass — channels-last gathers are
    the TPU-friendlier form), grid: (N,Ho,Wo,2) with normalized coords in
    [-1,1]. Lowered to traced gathers + lerp — static shapes, dynamic
    indices."""
    x = ctx.get(node.inputs[0])
    grid = ctx.get(node.inputs[1])
    mode = _as_str(node.attr("mode", "bilinear"))
    if mode == "linear":
        mode = "bilinear"
    pad_mode = _as_str(node.attr("padding_mode", "zeros"))
    align = bool(node.attr("align_corners", 0))
    nhwc = _layout(node) == "NHWC"
    if nhwc:
        n, h, w, c = x.shape
    else:
        n, c, h, w = x.shape
    gx = grid[..., 0].astype(jnp.float32)  # (N, Ho, Wo)
    gy = grid[..., 1].astype(jnp.float32)
    if align:
        ix = (gx + 1) * 0.5 * (w - 1)
        iy = (gy + 1) * 0.5 * (h - 1)
    else:
        ix = ((gx + 1) * w - 1) * 0.5
        iy = ((gy + 1) * h - 1) * 0.5

    def reflect(coord, size):
        # Fold the continuous coordinate back into range by reflecting at
        # pixel centers (align_corners) or image edges (not): torch/ONNX
        # reflect_coordinates semantics, then clamp like torch does.
        if align:
            mn, span = 0.0, float(size - 1)
        else:
            mn, span = -0.5, float(size)
        if span <= 0:
            return jnp.zeros_like(coord)
        d = jnp.abs(coord - mn) % (2 * span)
        return jnp.clip(jnp.where(d >= span, 2 * span - d, d) + mn, 0, size - 1)

    if pad_mode == "reflection":
        ix = reflect(ix, w)
        iy = reflect(iy, h)
    elif pad_mode not in ("zeros", "border"):
        raise NotSupportedError(f"GridSample padding_mode {pad_mode!r}")

    def sample(iy_idx, ix_idx):
        iyc = jnp.clip(iy_idx, 0, h - 1)
        ixc = jnp.clip(ix_idx, 0, w - 1)
        if nhwc:
            flat = x.reshape(n, h * w, c)
            lin = (iyc * w + ixc).reshape(n, -1, 1)  # (N,Ho*Wo,1)
            vals = jnp.take_along_axis(
                flat, jnp.broadcast_to(lin, (n, lin.shape[1], c)), axis=1)
            vals = vals.reshape((n,) + iy_idx.shape[1:] + (c,))
        else:
            flat = x.reshape(n, c, h * w)
            lin = (iyc * w + ixc).reshape(n, 1, -1)  # (N,1,Ho*Wo)
            vals = jnp.take_along_axis(
                flat, jnp.broadcast_to(lin, (n, c, lin.shape[-1])), axis=2)
            vals = vals.reshape((n, c) + iy_idx.shape[1:])
        if pad_mode == "zeros":
            inb = ((iy_idx >= 0) & (iy_idx < h) & (ix_idx >= 0) & (ix_idx < w))
            inb = inb[..., None] if nhwc else inb[:, None]
            vals = vals * inb.astype(vals.dtype)
        return vals

    def chanx(t):  # broadcast a (N,Ho,Wo) weight across the channel axis
        return t[..., None] if nhwc else t[:, None]

    if mode == "nearest":
        y = sample(jnp.round(iy).astype(jnp.int32), jnp.round(ix).astype(jnp.int32))
    elif mode == "bilinear":
        x0 = jnp.floor(ix).astype(jnp.int32)
        y0 = jnp.floor(iy).astype(jnp.int32)
        wx = chanx(ix - x0).astype(x.dtype)
        wy = chanx(iy - y0).astype(x.dtype)
        v00 = sample(y0, x0)
        v01 = sample(y0, x0 + 1)
        v10 = sample(y0 + 1, x0)
        v11 = sample(y0 + 1, x0 + 1)
        y = (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
             + v10 * (1 - wx) * wy + v11 * wx * wy)
    else:
        raise NotSupportedError(f"GridSample mode {mode!r}")
    ctx.set(node.outputs[0], y.astype(x.dtype))
