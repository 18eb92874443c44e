"""ONNX Runtime `com.microsoft` contrib-op lowerings.

The reference supports only the standard ONNX domain (its converter table,
Sources/Smelter/ONNXGraph.swift:110-155, has no contrib entries) — but
real-world ONNX exports of transformers and diffusion models come through
`onnxruntime.transformers.optimizer`, which rewrites them into this contrib
vocabulary (Attention, SkipLayerNormalization, FastGelu, GroupNorm, ...).
Supporting it is what makes ORT-optimized BERT/GPT/LLaMA/Stable-Diffusion
files load directly, so it is part of "a user of the reference finds
everything they need" for the ONNX ecosystem at large.

Lowering philosophy: these are *pre-fused* ops, so each maps 1:1 onto the
fused formulations our own optimizer passes emit (passes/fuse_attention.py,
kernels/): attention goes through jax.nn.dot_product_attention (XLA's fused
TPU attention), the norm family reuses the f32-accumulation layernorm
recipe, and quantized matmuls keep weights integer in HBM with the
dequant fused into the epilogue — the same design as ops/quant_ops.py.

Registration is by op type: the registry (ops/registry.py) is name-keyed
and these names do not collide with the standard domain (node.domain is
carried through the IR for provenance).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ir.errors import NotSupportedError
from ..ir.graph import Node
from .registry import Ctx, register

_SQRT_2_OVER_PI = 0.7978845608028654


def _gelu_erf(x):
    xf = x.astype(jnp.float32)
    return (jax.nn.gelu(xf, approximate=False)).astype(x.dtype)


def _gelu_tanh(x):
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + jnp.tanh(_SQRT_2_OVER_PI * (xf + 0.044715 * xf ** 3)))
    return y.astype(x.dtype)


@register("FastGelu")
def fast_gelu(ctx: Ctx, node: Node):
    """tanh-approximated Gelu with optional fused bias add."""
    x = ctx.get(node.inputs[0])
    if len(node.inputs) > 1 and node.inputs[1]:
        x = x + ctx.get(node.inputs[1]).astype(x.dtype)
    ctx.set(node.outputs[0], _gelu_tanh(x))


@register("QuickGelu")
def quick_gelu(ctx: Ctx, node: Node):
    """x * sigmoid(alpha * x) (CLIP/SD text encoders)."""
    x = ctx.get(node.inputs[0])
    alpha = float(node.attr("alpha", 1.702))
    xf = x.astype(jnp.float32)
    ctx.set(node.outputs[0], (xf * jax.nn.sigmoid(alpha * xf)).astype(x.dtype))


@register("BiasGelu")
def bias_gelu(ctx: Ctx, node: Node):
    a = ctx.get(node.inputs[0])
    b = ctx.get(node.inputs[1]).astype(a.dtype)
    ctx.set(node.outputs[0], _gelu_erf(a + b))


@register("BiasAdd")
def bias_add(ctx: Ctx, node: Node):
    """X + bias (broadcast over last dim) + skip (SD UNet residual glue)."""
    x = ctx.get(node.inputs[0])
    bias = ctx.get(node.inputs[1]).astype(x.dtype)
    skip = ctx.get(node.inputs[2]).astype(x.dtype)
    ctx.set(node.outputs[0], x + bias + skip)


@register("BiasSplitGelu")
def bias_split_gelu(ctx: Ctx, node: Node):
    """(X + bias) split in half along the last dim; out = h1 * gelu(h2).

    The SD UNet geglu feed-forward as fused by the ORT diffusion optimizer.
    """
    x = ctx.get(node.inputs[0])
    bias = ctx.get(node.inputs[1]).astype(x.dtype)
    h = x + bias
    d = h.shape[-1] // 2
    ctx.set(node.outputs[0], h[..., :d] * _gelu_erf(h[..., d:]))


@register("FusedMatMul")
def fused_matmul(ctx: Ctx, node: Node):
    """MatMul with pre-transposes and an alpha scale folded in."""
    a = ctx.get(node.inputs[0])
    b = ctx.get(node.inputs[1])
    if node.attr("transBatchA", 0) or node.attr("transBatchB", 0):
        raise NotSupportedError("FusedMatMul transBatchA/transBatchB")
    if node.attr("transA", 0):
        a = jnp.swapaxes(a, -1, -2)
    if node.attr("transB", 0):
        b = jnp.swapaxes(b, -1, -2)
    y = jnp.matmul(a, b.astype(a.dtype),
                   preferred_element_type=jnp.float32)
    alpha = float(node.attr("alpha", 1.0))
    if alpha != 1.0:
        y = y * alpha
    ctx.set(node.outputs[0], y.astype(a.dtype))


# -- layer-norm family ----------------------------------------------------


def _last_axis_ln(x, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps) * gamma.astype(jnp.float32)
    if beta is not None:
        y = y + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def _rms_norm(x, gamma, eps, axis):
    xf = x.astype(jnp.float32)
    axes = tuple(range(axis, x.ndim))
    ms = jnp.mean(jnp.square(xf), axis=axes, keepdims=True)
    return (xf * lax.rsqrt(ms + eps) * gamma.astype(jnp.float32)).astype(x.dtype)


@register("SimplifiedLayerNormalization")
def simplified_layer_norm(ctx: Ctx, node: Node):
    """RMSNorm as fused by ORT (no mean subtraction, no beta)."""
    x = ctx.get(node.inputs[0])
    gamma = ctx.get(node.inputs[1])
    axis = int(node.attr("axis", -1))
    if axis < 0:
        axis += x.ndim
    ctx.set(node.outputs[0],
            _rms_norm(x, gamma, float(node.attr("epsilon", 1e-5)), axis))
    for extra in node.outputs[1:]:
        if extra:
            raise NotSupportedError("SimplifiedLayerNormalization inv_std_var output")


@register("SkipLayerNormalization")
def skip_layer_norm(ctx: Ctx, node: Node):
    """LayerNorm(input + skip [+ bias]) over the last axis.

    Output 3 (when requested) is the pre-norm sum, which ORT graphs feed
    into the next residual branch.
    """
    x = ctx.get(node.inputs[0])
    skip = ctx.get(node.inputs[1]).astype(x.dtype)
    gamma = ctx.get(node.inputs[2])
    beta = (ctx.get(node.inputs[3])
            if len(node.inputs) > 3 and node.inputs[3] else None)
    eps = float(node.attr("epsilon", 1e-12))
    for extra in node.outputs[1:3]:
        if extra:
            raise NotSupportedError("SkipLayerNormalization mean/inv_std outputs")
    has_bias = len(node.inputs) > 4 and bool(node.inputs[4])
    fln = getattr(ctx.config, "fused_layernorm", "auto") if ctx.config else "auto"
    use_pallas = bool(ctx.config is not None
                      and getattr(ctx.config, "use_pallas", False))
    if ((fln is True or use_pallas) and not has_bias
            and jnp.issubdtype(x.dtype, jnp.floating)
            and x.shape == skip.shape):
        from ..kernels.layer_norm import residual_layer_norm

        b = beta if beta is not None else jnp.zeros_like(gamma)
        h, y = residual_layer_norm(x, skip, gamma, b, eps=eps)
        ctx.set(node.outputs[0], y)
        if len(node.outputs) > 3 and node.outputs[3]:
            ctx.set(node.outputs[3], h)
        return
    h = x + skip
    if has_bias:
        h = h + ctx.get(node.inputs[4]).astype(x.dtype)
    ctx.set(node.outputs[0], _last_axis_ln(h, gamma, beta, eps))
    if len(node.outputs) > 3 and node.outputs[3]:
        ctx.set(node.outputs[3], h)


@register("SkipSimplifiedLayerNormalization")
def skip_simplified_layer_norm(ctx: Ctx, node: Node):
    """RMSNorm(input + skip [+ bias]) — the LLaMA residual+norm fusion."""
    x = ctx.get(node.inputs[0])
    skip = ctx.get(node.inputs[1]).astype(x.dtype)
    gamma = ctx.get(node.inputs[2])
    h = x + skip
    if len(node.inputs) > 3 and node.inputs[3]:
        h = h + ctx.get(node.inputs[3]).astype(x.dtype)
    eps = float(node.attr("epsilon", 1e-6))
    ctx.set(node.outputs[0], _rms_norm(h, gamma, eps, h.ndim - 1))
    if len(node.outputs) > 3 and node.outputs[3]:
        ctx.set(node.outputs[3], h)
    for extra in node.outputs[1:3]:
        if extra:
            raise NotSupportedError(
                "SkipSimplifiedLayerNormalization mean/inv_std outputs")


@register("GroupNorm")
def group_norm_contrib(ctx: Ctx, node: Node):
    """Contrib GroupNorm: channels-last activations, optional swish epilogue
    (the SD UNet norm as emitted by the ORT diffusion optimizer)."""
    _group_norm_impl(ctx, node, skip=None, bias=None)


@register("SkipGroupNorm")
def skip_group_norm(ctx: Ctx, node: Node):
    """GroupNorm(X + skip [+ bias]) with the pre-norm sum as output 2."""
    x = ctx.get(node.inputs[0])
    skip = ctx.get(node.inputs[3]).astype(x.dtype)
    bias = (ctx.get(node.inputs[4]).astype(x.dtype)
            if len(node.inputs) > 4 and node.inputs[4] else None)
    _group_norm_impl(ctx, node, skip=skip, bias=bias)


def _group_norm_impl(ctx: Ctx, node: Node, skip, bias):
    x = ctx.get(node.inputs[0])
    gamma = ctx.get(node.inputs[1]).astype(jnp.float32)
    beta = ctx.get(node.inputs[2]).astype(jnp.float32)
    groups = int(node.attr("groups"))
    eps = float(node.attr("epsilon", 1e-5))
    channels_last = int(node.attr("channels_last", 1))
    act = int(node.attr("activation", 0))
    h = x
    if skip is not None:
        h = h + skip
    if bias is not None:
        h = h + (bias if channels_last
                 else bias.reshape((1, -1) + (1,) * (x.ndim - 2)))
    pre = h
    if not channels_last:
        h = jnp.moveaxis(h, 1, -1)
    b, c = h.shape[0], h.shape[-1]
    spatial = h.shape[1:-1]
    hf = h.astype(jnp.float32).reshape((b, -1, groups, c // groups))
    mean = jnp.mean(hf, axis=(1, 3), keepdims=True)
    var = jnp.var(hf, axis=(1, 3), keepdims=True)
    y = ((hf - mean) * lax.rsqrt(var + eps)).reshape((b,) + spatial + (c,))
    y = y * gamma + beta
    if act:
        y = y * jax.nn.sigmoid(y)  # swish
    if not channels_last:
        y = jnp.moveaxis(y, -1, 1)
    ctx.set(node.outputs[0], y.astype(x.dtype))
    if len(node.outputs) > 1 and node.outputs[1]:
        ctx.set(node.outputs[1], pre)


@register("NhwcConv")
def nhwc_conv(ctx: Ctx, node: Node):
    """Conv with NHWC activations and OHWI ('Nhwc') weights."""
    from . import padding as P

    x = ctx.get(node.inputs[0])
    w = ctx.get(node.inputs[1])
    rank = x.ndim - 2
    strides = tuple(node.attr("strides", [1] * rank))
    dilations = tuple(node.attr("dilations", [1] * rank))
    group = int(node.attr("group", 1))
    kernel = tuple(w.shape[1:-1])
    pads = P.resolve_pads(node, tuple(x.shape[1:-1]), kernel, strides, dilations)
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=strides, padding=pads,
        rhs_dilation=dilations, dimension_numbers=("NHWC", "OHWI", "NHWC"),
        feature_group_count=group)
    if len(node.inputs) > 2 and node.inputs[2]:
        y = y + ctx.get(node.inputs[2]).astype(y.dtype)
    ctx.set(node.outputs[0], y)


# -- attention family ------------------------------------------------------


def _mask_index_bias(m, b, sq, t, filt):
    """Additive attention bias (B,1,Sq|1,T) f32 from ORT's mask_index forms:
    (B,) right-pad valid lengths, (2B,) [ends, starts], (B,T) raw keep mask,
    (B,Sq,T) per-query keep mask."""
    pos = jnp.arange(t)[None, :]
    if m.ndim == 1 and m.shape[0] == b:
        keep = pos < m[:, None]
        keep = keep[:, None, None, :]
    elif m.ndim == 1 and m.shape[0] == 2 * b:
        keep = (pos >= m[b:][:, None]) & (pos < m[:b][:, None])
        keep = keep[:, None, None, :]
    elif m.ndim == 2:
        keep = m.astype(bool)[:, None, None, :]
    elif m.ndim == 3:
        keep = m.astype(bool)[:, None, :, :]
    else:
        raise NotSupportedError(f"attention mask_index shape {m.shape}")
    return jnp.where(keep, 0.0, filt).astype(jnp.float32)


def _causal_bias(sq, t, filt):
    keep = jnp.tril(jnp.ones((sq, t), bool), k=t - sq)
    return jnp.where(keep, 0.0, filt).astype(jnp.float32)[None, None]


def _core_attention(q, k, v, bias, scale):
    """q/k/v in native (B, S, H, hd) layout; bias additive (B|1,H|1,Sq,T)."""
    if v.shape[-1] != q.shape[-1]:
        # unequal qkv_hidden_sizes: dot_product_attention requires matching
        # head dims, so run the (numerically f32) explicit formulation
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        if bias is not None:
            scores = scores + bias.astype(jnp.float32)
        p = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(q.dtype))
    # mixed q/k dtypes arise when K/V were dequantized mid-graph (int8 KV
    # caches emit f32) under a reduced compute dtype: promote — matching
    # jnp's promotion in the primitive-op decode path, so chunk/prefill
    # forms stay numerics-identical to the step form
    ct = jnp.promote_types(q.dtype, k.dtype)
    if bias is not None:
        bias = bias.astype(ct)
    return jax.nn.dot_product_attention(q.astype(ct), k.astype(ct),
                                        v.astype(ct), bias=bias,
                                        scale=scale)


def _attention_body(q, k, v, mask_index, attn_bias, past,
                    scale, unidirectional, filt):
    """Shared Attention/QAttention core. q/k/v are (B,S,H,hd) projections;
    past is (2,B,H,Sp,hd) or None. Returns (out (B,S,H*hdv), present)."""
    b, sq = q.shape[0], q.shape[1]
    if past is not None:
        pk = jnp.swapaxes(past[0], 1, 2).astype(k.dtype)  # (B,Sp,H,hd)
        pv = jnp.swapaxes(past[1], 1, 2).astype(v.dtype)
        k = jnp.concatenate([pk, k], axis=1)
        v = jnp.concatenate([pv, v], axis=1)
    t = k.shape[1]
    bias = None
    if mask_index is not None:
        bias = _mask_index_bias(mask_index, b, sq, t, filt)
    if unidirectional:
        cb = _causal_bias(sq, t, filt)
        bias = cb if bias is None else bias + cb
    if attn_bias is not None:
        ab = attn_bias.astype(jnp.float32)
        bias = ab if bias is None else bias + ab
    out = _core_attention(q, k, v, bias, scale)
    present = (jnp.stack([jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2)])
               if k.shape == v.shape else
               (jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2)))
    return out.reshape(b, sq, -1), present


@register("Attention")
def attention_contrib(ctx: Ctx, node: Node):
    """ORT fused Attention: input projection + multi-head attention.

    input (B,S,Din) @ weights (Din, qh+kh+vh) [+ bias] -> Q/K/V; supports
    mask_index (all 1-3D forms), additive attention_bias, past/present KV,
    unidirectional (causal), unequal qkv_hidden_sizes, and do_rotary
    (NeoX-style in-attention rotary with past-offset positions). Shared
    past/present buffers (past_present_share_buffer) are not supported —
    use the FusedGenerator KV-cache path for decode serving.
    """
    if int(node.attr("past_present_share_buffer", 0)):
        raise NotSupportedError("Attention past_present_share_buffer")
    x = ctx.get(node.inputs[0])
    w = ctx.get(node.inputs[1]).astype(x.dtype)
    h = int(node.attr("num_heads"))
    qkv = jnp.matmul(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    if len(node.inputs) > 2 and node.inputs[2]:
        qkv = qkv + ctx.get(node.inputs[2]).astype(x.dtype)
    sizes = node.attr("qkv_hidden_sizes")
    if sizes is None:
        d = qkv.shape[-1] // 3
        sizes = [d, d, d]
    qh, kh, vh = (int(s) for s in sizes)
    b, s = x.shape[0], x.shape[1]
    q = qkv[..., :qh].reshape(b, s, h, qh // h)
    k = qkv[..., qh:qh + kh].reshape(b, s, h, kh // h)
    v = qkv[..., qh + kh:].reshape(b, s, h, vh // h)
    mask = (ctx.get(node.inputs[3])
            if len(node.inputs) > 3 and node.inputs[3] else None)
    past = (ctx.get(node.inputs[4])
            if len(node.inputs) > 4 and node.inputs[4] else None)
    if int(node.attr("do_rotary", 0)):
        # NeoX-style in-attention rotary: base-10000 caches built at trace
        # time (static shapes), positions offset by the past length
        sp = int(past.shape[3]) if past is not None else 0
        hd = qh // h
        r = int(node.attr("rotary_embedding_dim", 0)) or hd
        inv = 1.0 / 10000.0 ** (np.arange(0, r, 2, dtype=np.float64) / r)
        ang = np.arange(sp + s, dtype=np.float64)[:, None] * inv[None]
        cos_c = jnp.asarray(np.cos(ang), jnp.float32)
        sin_c = jnp.asarray(np.sin(ang), jnp.float32)
        pos = (sp + jnp.arange(s, dtype=jnp.int32))[None, :] \
            + jnp.zeros((b, 1), jnp.int32)
        q = _apply_rotary(q, pos, cos_c, sin_c, 0, r)
        k = _apply_rotary(k, pos, cos_c, sin_c, 0, r)
    attn_bias = (ctx.get(node.inputs[5])
                 if len(node.inputs) > 5 and node.inputs[5] else None)
    scale = node.attr("scale")
    scale = float(scale) if scale is not None else (qh // h) ** -0.5
    filt = float(node.attr("mask_filter_value", -10000.0))
    out, present = _attention_body(
        q, k, v, mask, attn_bias, past, scale,
        int(node.attr("unidirectional", 0)), filt)
    ctx.set(node.outputs[0], out)
    if len(node.outputs) > 1 and node.outputs[1]:
        if isinstance(present, tuple):
            raise NotSupportedError(
                "Attention present output with unequal qkv_hidden_sizes")
        ctx.set(node.outputs[1], present)


@register("QAttention")
def q_attention(ctx: Ctx, node: Node):
    """Quantized fused Attention: int8 input/weight with scales and
    zero-points, dequantized into the same attention core (the dequant
    rides the projection matmul's epilogue under XLA fusion)."""
    xq = ctx.get(node.inputs[0])
    wq = ctx.get(node.inputs[1])
    bias = ctx.get(node.inputs[2]) if node.inputs[2] else None
    x_scale = ctx.get(node.inputs[3]).astype(jnp.float32)
    w_scale = ctx.get(node.inputs[4]).astype(jnp.float32)
    mask = (ctx.get(node.inputs[5])
            if len(node.inputs) > 5 and node.inputs[5] else None)
    x_zp = (ctx.get(node.inputs[6])
            if len(node.inputs) > 6 and node.inputs[6] else None)
    w_zp = (ctx.get(node.inputs[7])
            if len(node.inputs) > 7 and node.inputs[7] else None)
    past = (ctx.get(node.inputs[8])
            if len(node.inputs) > 8 and node.inputs[8] else None)
    h = int(node.attr("num_heads"))
    xf = xq.astype(jnp.float32)
    if x_zp is not None:
        xf = xf - x_zp.astype(jnp.float32)
    x = xf * x_scale
    wf = wq.astype(jnp.float32)
    if w_zp is not None:
        wf = wf - w_zp.astype(jnp.float32)
    w = wf * w_scale  # per-tensor or per-column (broadcasts on last axis)
    qkv = jnp.matmul(x, w, preferred_element_type=jnp.float32)
    if bias is not None:
        qkv = qkv + bias.astype(jnp.float32)
    d = qkv.shape[-1] // 3
    b, s = x.shape[0], x.shape[1]
    q = qkv[..., :d].reshape(b, s, h, d // h)
    k = qkv[..., d:2 * d].reshape(b, s, h, d // h)
    v = qkv[..., 2 * d:].reshape(b, s, h, d // h)
    scale = (d // h) ** -0.5
    out, present = _attention_body(
        q, k, v, mask, None, past, scale,
        int(node.attr("unidirectional", 0)), -10000.0)
    ctx.set(node.outputs[0], out.astype(jnp.float32))
    if len(node.outputs) > 1 and node.outputs[1]:
        ctx.set(node.outputs[1], present.astype(jnp.float32))


@register("MultiHeadAttention")
def multi_head_attention(ctx: Ctx, node: Node):
    """ORT MultiHeadAttention over already-projected Q/K/V.

    Supported input forms: 3-D query/key/value (B,S,D); packed QKV
    (B,S,H,3,hd) with empty key/value; BNSH key/value (B,H,S,hd); past_key/
    past_value concatenation with present outputs; (B,)/(B,T) key padding
    masks and additive attention_bias.
    """
    h = int(node.attr("num_heads"))
    filt = float(node.attr("mask_filter_value", -10000.0))
    query = ctx.get(node.inputs[0])
    key = (ctx.get(node.inputs[1])
           if len(node.inputs) > 1 and node.inputs[1] else None)
    value = (ctx.get(node.inputs[2])
             if len(node.inputs) > 2 and node.inputs[2] else None)
    bias = (ctx.get(node.inputs[3])
            if len(node.inputs) > 3 and node.inputs[3] else None)
    mask = (ctx.get(node.inputs[4])
            if len(node.inputs) > 4 and node.inputs[4] else None)
    attn_bias = (ctx.get(node.inputs[5])
                 if len(node.inputs) > 5 and node.inputs[5] else None)
    past_k = (ctx.get(node.inputs[6])
              if len(node.inputs) > 6 and node.inputs[6] else None)
    past_v = (ctx.get(node.inputs[7])
              if len(node.inputs) > 7 and node.inputs[7] else None)
    b, sq = query.shape[0], query.shape[1]
    if query.ndim == 5:  # packed (B,S,H,3,hd)
        if bias is not None:
            raise NotSupportedError("MultiHeadAttention bias with packed QKV")
        q, k, v = (query[:, :, :, i, :] for i in range(3))
    else:
        d = query.shape[-1]
        hd = d // h
        if bias is not None:
            bias = bias.astype(query.dtype)
        q = query
        if bias is not None:
            q = q + bias[:d]
        q = q.reshape(b, sq, h, hd)
        if key is not None and key.ndim == 5:  # packed KV (B,Skv,H,2,hd)
            if bias is not None:
                raise NotSupportedError("MultiHeadAttention bias with packed KV")
            k = key[:, :, :, 0, :]
            v = key[:, :, :, 1, :]
        elif key is None or value is None:
            raise NotSupportedError("MultiHeadAttention key/value missing")
        elif key.ndim == 4:  # BNSH (already transposed, no bias per ORT)
            k = jnp.swapaxes(key, 1, 2)
            v = jnp.swapaxes(value, 1, 2)
        else:
            k, v = key, value
            if bias is not None:
                k = k + bias[d:d + key.shape[-1]]
                v = v + bias[d + key.shape[-1]:]
            k = k.reshape(b, k.shape[1], h, -1)
            v = v.reshape(b, v.shape[1], h, -1)
    past = (jnp.stack([past_k, past_v])
            if past_k is not None and past_v is not None else None)
    scale = node.attr("scale")
    scale = float(scale) if scale is not None else q.shape[-1] ** -0.5
    out, present = _attention_body(
        q, k, v, mask, attn_bias, past, scale,
        int(node.attr("unidirectional", 0)), filt)
    ctx.set(node.outputs[0], out)
    if len(node.outputs) > 1 and node.outputs[1]:
        ctx.set(node.outputs[1], present[0])
    if len(node.outputs) > 2 and node.outputs[2]:
        ctx.set(node.outputs[2], present[1])


@register("GroupQueryAttention")
def group_query_attention(ctx: Ctx, node: Node):
    """GQA (LLaMA-family decoder attention): H query heads share H_kv
    key/value heads; always causal; optional fused rotary embedding.

    Supported: separate or packed (key/value empty) projections, seqlens_k
    key-length masking, rotary via cos/sin caches, grouped-head broadcast,
    local_window_size (Mistral-style sliding window: the last `window`
    keys including the current position are visible), and the ORT-genai
    serving pattern: past_key/past_value (B, H_kv, max_len, hd)
    SHARED-BUFFER caches with per-batch lengths — new rows are scattered
    at positions seqlens_k+1-S .. seqlens_k, rotary offsets follow, and
    present_key/present_value return the updated buffers (the functional
    analog of past_present_share_buffer=1; this is how an exported
    llama/phi decode graph runs unmodified). Growing-concat past
    (share_buffer=0) is intentionally not modeled — static shapes only.
    """
    h = int(node.attr("num_heads"))
    h_kv = int(node.attr("kv_num_heads"))
    window = int(node.attr("local_window_size", -1))
    query = ctx.get(node.inputs[0])
    key = (ctx.get(node.inputs[1])
           if len(node.inputs) > 1 and node.inputs[1] else None)
    value = (ctx.get(node.inputs[2])
             if len(node.inputs) > 2 and node.inputs[2] else None)
    past_k = (ctx.get(node.inputs[3])
              if len(node.inputs) > 3 and node.inputs[3] else None)
    past_v = (ctx.get(node.inputs[4])
              if len(node.inputs) > 4 and node.inputs[4] else None)
    seqlens_k = (ctx.get(node.inputs[5])
                 if len(node.inputs) > 5 and node.inputs[5] else None)
    cos_cache = (ctx.get(node.inputs[7])
                 if len(node.inputs) > 7 and node.inputs[7] else None)
    sin_cache = (ctx.get(node.inputs[8])
                 if len(node.inputs) > 8 and node.inputs[8] else None)
    b, s = query.shape[0], query.shape[1]
    if key is None:  # packed: (B,S,(H+2*Hkv)*hd)
        hd = query.shape[-1] // (h + 2 * h_kv)
        q = query[..., :h * hd].reshape(b, s, h, hd)
        k = query[..., h * hd:(h + h_kv) * hd].reshape(b, s, h_kv, hd)
        v = query[..., (h + h_kv) * hd:].reshape(b, s, h_kv, hd)
    else:
        hd = query.shape[-1] // h
        q = query.reshape(b, s, h, hd)
        k = key.reshape(b, s, h_kv, hd)
        v = value.reshape(b, s, h_kv, hd)
    if past_k is not None:
        if past_v is None or seqlens_k is None:
            raise NotSupportedError(
                "GroupQueryAttention past buffers require past_value and "
                "seqlens_k")
        tot = seqlens_k.astype(jnp.int32).reshape(b) + 1   # (B,)
        pos = (tot - s)[:, None] + jnp.arange(s, dtype=jnp.int32)[None]
    else:
        pos = (jnp.arange(s)[None, :].astype(jnp.int32)
               + jnp.zeros((b, 1), jnp.int32))
    if int(node.attr("do_rotary", 0)):
        if cos_cache is None or sin_cache is None:
            raise NotSupportedError("GroupQueryAttention do_rotary without caches")
        inter = int(node.attr("rotary_interleaved", 0))
        q = _apply_rotary(q, pos, cos_cache, sin_cache, inter)
        k = _apply_rotary(k, pos, cos_cache, sin_cache, inter)
    scale = node.attr("scale")
    scale = float(scale) if scale is not None else hd ** -0.5
    rep = h // h_kv
    if past_k is not None:
        # scatter the new rows into the shared buffer at per-batch
        # positions (one-hot matmul — Mosaic/XLA-friendly, no gather)
        maxlen = past_k.shape[2]
        onehot = (pos[:, :, None]
                  == jnp.arange(maxlen, dtype=jnp.int32)[None, None, :])
        kc = jnp.einsum("bsm,bshd->bhmd", onehot.astype(k.dtype), k)
        vc = jnp.einsum("bsm,bshd->bhmd", onehot.astype(v.dtype), v)
        wrote = onehot.any(axis=1)[:, None, :, None]       # (B,1,max,1)
        pres_k = jnp.where(wrote, kc, past_k.astype(k.dtype))
        pres_v = jnp.where(wrote, vc, past_v.astype(v.dtype))
        k_all = jnp.swapaxes(pres_k, 1, 2)                 # (B,max,Hkv,hd)
        v_all = jnp.swapaxes(pres_v, 1, 2)
        jm = jnp.arange(maxlen, dtype=jnp.int32)[None, None, None, :]
        bias = jnp.where(jm <= pos[:, None, :, None], 0.0,
                         -10000.0).astype(jnp.float32)     # (B,1,S,max)
        if window > 0:
            bias = bias + jnp.where(jm > pos[:, None, :, None] - window,
                                    0.0, -10000.0).astype(jnp.float32)
        out = _core_attention(q, jnp.repeat(k_all, rep, axis=2),
                              jnp.repeat(v_all, rep, axis=2), bias, scale)
        ctx.set(node.outputs[0], out.reshape(b, s, h * hd))
        if len(node.outputs) > 1 and node.outputs[1]:
            ctx.set(node.outputs[1], pres_k)
        if len(node.outputs) > 2 and node.outputs[2]:
            ctx.set(node.outputs[2], pres_v)
        return
    kq = jnp.repeat(k, rep, axis=2)
    vq = jnp.repeat(v, rep, axis=2)
    t = k.shape[1]
    bias = _causal_bias(s, t, -10000.0)
    if window > 0:
        # sliding-window (Mistral-style): key j visible to query i only
        # when i - window < j <= i
        band = jnp.tril(jnp.ones((s, t), bool), k=t - s - window)
        bias = bias + jnp.where(band, -10000.0, 0.0)[None, None]
    if seqlens_k is not None:
        # per ORT: seqlens_k = total key length - 1
        bias = bias + _mask_index_bias(
            seqlens_k.astype(jnp.int32) + 1, b, s, t, -10000.0)
    out = _core_attention(q, kq, vq, bias, scale)
    ctx.set(node.outputs[0], out.reshape(b, s, h * hd))
    if len(node.outputs) > 1 and node.outputs[1]:
        ctx.set(node.outputs[1], jnp.swapaxes(k, 1, 2))
    if len(node.outputs) > 2 and node.outputs[2]:
        ctx.set(node.outputs[2], jnp.swapaxes(v, 1, 2))


def _apply_rotary(x, pos, cos_cache, sin_cache, interleaved, rot_dim=0):
    """Rotate (B,S,H,hd) by position. cos/sin caches are (max_pos, r/2)."""
    hd = x.shape[-1]
    r = rot_dim or 2 * cos_cache.shape[-1]
    cos = cos_cache[pos].astype(jnp.float32)[:, :, None, :]  # (B,S,1,r/2)
    sin = sin_cache[pos].astype(jnp.float32)[:, :, None, :]
    xf = x.astype(jnp.float32)
    xr, tail = xf[..., :r], xf[..., r:]
    if interleaved:
        x1, x2 = xr[..., 0::2], xr[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x1 * sin + x2 * cos
        rot = jnp.stack([o1, o2], axis=-1).reshape(xr.shape)
    else:
        half = r // 2
        x1, x2 = xr[..., :half], xr[..., half:]
        rot = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos],
                              axis=-1)
    out = jnp.concatenate([rot, tail], axis=-1) if hd > r else rot
    return out.astype(x.dtype)


@register("RotaryEmbedding")
def rotary_embedding(ctx: Ctx, node: Node):
    """Standalone rotary position embedding over (B,S,D) or (B,H,S,hd)."""
    x = ctx.get(node.inputs[0])
    pos = ctx.get(node.inputs[1]).astype(jnp.int32)
    cos_cache = ctx.get(node.inputs[2])
    sin_cache = ctx.get(node.inputs[3])
    interleaved = int(node.attr("interleaved", 0))
    num_heads = int(node.attr("num_heads", 0))
    rot_dim = int(node.attr("rotary_embedding_dim", 0))
    if pos.ndim == 0 or (pos.ndim == 1 and pos.shape[0] == 1):
        # scalar offset: every token at position offset + index
        b = x.shape[0]
        s = x.shape[1] if x.ndim == 3 else x.shape[2]
        pos = pos.reshape(()) + jnp.arange(s, dtype=jnp.int32)[None, :] \
            + jnp.zeros((b, 1), jnp.int32)
    if x.ndim == 4:  # (B,H,S,hd)
        xn = jnp.swapaxes(x, 1, 2)  # -> (B,S,H,hd)
        y = _apply_rotary(xn, pos, cos_cache, sin_cache, interleaved, rot_dim)
        ctx.set(node.outputs[0], jnp.swapaxes(y, 1, 2))
        return
    b, s, d = x.shape
    if num_heads > 0:
        h = num_heads
    elif rot_dim:
        raise NotSupportedError(
            "RotaryEmbedding rotary_embedding_dim on 3-D input requires "
            "num_heads (head size is not inferable)")
    else:
        h = max(1, d // (2 * cos_cache.shape[-1]))
    y = _apply_rotary(x.reshape(b, s, h, d // h), pos, cos_cache, sin_cache,
                      interleaved, rot_dim)
    ctx.set(node.outputs[0], y.reshape(b, s, d))


@register("EmbedLayerNormalization")
def embed_layer_norm(ctx: Ctx, node: Node):
    """word + position [+ segment] embedding lookup fused with LayerNorm.

    Output 1 is the (B,) valid-length vector downstream Attention nodes use
    as mask_index (sequence length when no mask is given).
    """
    ids = ctx.get(node.inputs[0]).astype(jnp.int32)
    seg_ids = (ctx.get(node.inputs[1]).astype(jnp.int32)
               if len(node.inputs) > 1 and node.inputs[1] else None)
    word = ctx.get(node.inputs[2])
    pos_table = ctx.get(node.inputs[3])
    seg_table = (ctx.get(node.inputs[4])
                 if len(node.inputs) > 4 and node.inputs[4] else None)
    gamma = ctx.get(node.inputs[5])
    beta = ctx.get(node.inputs[6])
    mask = (ctx.get(node.inputs[7])
            if len(node.inputs) > 7 and node.inputs[7] else None)
    pos_ids = (ctx.get(node.inputs[8]).astype(jnp.int32)
               if len(node.inputs) > 8 and node.inputs[8] else None)
    b, s = ids.shape
    e = word[ids]
    if pos_ids is None:
        e = e + pos_table[:s][None]
    else:
        e = e + pos_table[jnp.broadcast_to(pos_ids, (b, s))]
    if seg_table is not None and seg_ids is not None:
        e = e + seg_table[seg_ids]
    eps = float(node.attr("epsilon", 1e-12))
    ctx.set(node.outputs[0], _last_axis_ln(e, gamma, beta, eps))
    if mask is not None:
        mask_index = jnp.sum(mask.astype(jnp.int32), axis=1)
    else:
        mask_index = jnp.full((b,), s, jnp.int32)
    if len(node.outputs) > 1 and node.outputs[1]:
        ctx.set(node.outputs[1], mask_index)
    if len(node.outputs) > 2 and node.outputs[2]:
        ctx.set(node.outputs[2], e)


@register("MatMulNBits", static={1, 2, 3, 4})
def matmul_nbits(ctx: Ctx, node: Node):
    """Block-quantized (4/8-bit) weight matmul — the LLM weight format of
    onnxruntime-genai exports.

    The packed weight/scale/zero-point initializers are unpacked host-side
    at trace time into an int8 (K, N) tensor plus (nb, N) scales that live
    int8 in HBM; the lowering multiplies the per-block scales back in-graph
    and lets XLA fuse the dequant into the matmul. Measured on-chip
    (experiments/tpu_probe27.py, M8192/K4096/N4096/bs32): this form hits
    138 TF/s — parity with bf16 weights — while a lax.scan over K-blocks
    runs 5 TF/s (small-K matmuls starve the MXU) and a blockwise einsum
    18 TF/s (materializes (M,nb,N) partials).
    """
    a = ctx.get(node.inputs[0])
    K = int(node.attr("K"))
    N = int(node.attr("N"))
    bits = int(node.attr("bits", 4))
    bs = int(node.attr("block_size", 128))
    if bits not in (4, 8):
        raise NotSupportedError(f"MatMulNBits bits={bits}")
    if len(node.inputs) > 4 and node.inputs[4]:
        raise NotSupportedError("MatMulNBits g_idx (non-contiguous groups)")
    b_packed = np.asarray(ctx.static(node.inputs[1]))
    scales = np.asarray(ctx.static(node.inputs[2]), np.float32).reshape(N, -1)
    nb = scales.shape[1]
    # unpack to (N, nb*bs) int32 in [0, 2^bits)
    rows = b_packed.reshape(N, -1).view(np.uint8)
    if bits == 4:
        lo = rows & 0xF
        hi = rows >> 4
        w = np.stack([lo, hi], axis=-1).reshape(N, -1)[:, :nb * bs]
    else:
        w = rows[:, :nb * bs]
    w = w.astype(np.int32).reshape(N, nb, bs)
    # bits=8 weights span [0,255]: shift stored weights by 128 to fit int8
    # and carry the shift through the zero-point (dequant is invariant:
    # (w - zp) == ((w-128) - (zp-128)))
    w_shift = 128 if bits == 8 else 0
    zp_in = ctx.static(node.inputs[3], required=False) \
        if len(node.inputs) > 3 and node.inputs[3] else None
    if zp_in is None:
        zp = np.full((N, nb), 1 << (bits - 1), np.int32)
        zp_f = None
    elif np.issubdtype(np.asarray(zp_in).dtype, np.floating):
        # float zero-points fold into the scale epilogue instead
        zp = None
        zp_f = np.asarray(zp_in, np.float32).reshape(N, nb) - w_shift
    else:
        zrows = np.asarray(zp_in).reshape(N, -1).view(np.uint8)
        if bits == 4:
            zlo = zrows & 0xF
            zhi = zrows >> 4
            zp = np.stack([zlo, zhi], axis=-1).reshape(N, -1)[:, :nb].astype(np.int32)
        else:
            zp = zrows[:, :nb].astype(np.int32)
    if zp is not None and bits == 8:
        # int zp on 8-bit: (w-zp) spans [-255,255] — fold via the shifted
        # float-zp epilogue instead of wrapping int8
        zp_f = (zp - w_shift).astype(np.float32)
        zp = None
    if zp is not None:
        w_int = (w - zp[:, :, None]).astype(np.int8)     # 4-bit: |w-zp|<=15
        zp_dev = None
    else:
        w_int = (w - w_shift).astype(np.int8)
        zp_dev = jnp.asarray(np.transpose(zp_f, (1, 0)))[:, None, :]  # (nb,1,N)
    # int8 (K,N) in HBM; the per-block rescale below fuses into the matmul
    w_dev = jnp.asarray(np.transpose(w_int, (1, 2, 0)).reshape(nb * bs, N))
    s_dev = jnp.asarray(np.transpose(scales, (1, 0)))[:, None, :]     # (nb,1,N)
    lead = a.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    a2 = a.reshape(m, a.shape[-1])
    if a2.shape[-1] < nb * bs:  # K padded up to whole blocks
        a2 = jnp.pad(a2, ((0, 0), (0, nb * bs - a2.shape[-1])))
    wf = w_dev.astype(a.dtype).reshape(nb, bs, N)
    if zp_dev is not None:
        wf = wf - zp_dev.astype(a.dtype)
    wd = (wf * s_dev.astype(a.dtype)).reshape(nb * bs, N)
    y = jnp.matmul(a2, wd, preferred_element_type=jnp.float32)
    if len(node.inputs) > 5 and node.inputs[5]:
        y = y + ctx.get(node.inputs[5]).astype(jnp.float32)
    ctx.set(node.outputs[0], y.astype(a.dtype).reshape(lead + (N,)))


@register("MoE")
def moe_contrib(ctx: Ctx, node: Node):
    """ORT contrib MoE (Mixtral-class blocks): softmax-top-k routing over
    expert FFNs, optional gated (swiglu-style) fc3.

    Lowered dense: every expert runs on every row (one batched einsum per
    layer — MXU-friendly, no dynamic shapes) and the top-k routing weights
    zero out non-selected experts. For E experts this costs E/k extra
    FLOPs vs sparse dispatch, the standard TPU trade (a gather-based
    dispatch needs dynamic shapes XLA can't compile); the ep-sharded
    capacity router in parallel/moe.py is the multi-chip serving path.
    """
    x = ctx.get(node.inputs[0])                    # (rows, hidden)
    router = ctx.get(node.inputs[1])               # (rows, E) logits
    w1 = ctx.get(node.inputs[2])                   # (E, hidden, inter)
    b1 = (ctx.get(node.inputs[3])
          if len(node.inputs) > 3 and node.inputs[3] else None)
    w2 = ctx.get(node.inputs[4])                   # (E, inter, hidden)
    b2 = (ctx.get(node.inputs[5])
          if len(node.inputs) > 5 and node.inputs[5] else None)
    w3 = (ctx.get(node.inputs[6])
          if len(node.inputs) > 6 and node.inputs[6] else None)
    b3 = (ctx.get(node.inputs[7])
          if len(node.inputs) > 7 and node.inputs[7] else None)
    ctx.set(node.outputs[0],
            _moe_core(node, x, router, w1, b1, w2, b2, w3, b3))


def _moe_core(node: Node, x, router, w1, b1, w2, b2, w3, b3):
    k = int(node.attr("k", 1))
    act = node.attr("activation_type", "relu")
    if isinstance(act, bytes):
        act = act.decode()
    norm = int(node.attr("normalize_routing_weights", 0))

    lead = x.shape[:-1]
    xf = x.reshape((-1, x.shape[-1]))
    probs = jax.nn.softmax(router.astype(jnp.float32), axis=-1)
    probs = probs.reshape((-1, probs.shape[-1]))
    k = min(k, probs.shape[-1])
    topv, topi = lax.top_k(probs, k)
    if norm:
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    # (rows, E) routing weights, zero for unselected experts
    route = jnp.zeros_like(probs)
    rows = jnp.arange(probs.shape[0])[:, None]
    route = route.at[rows, topi].set(topv)

    h = jnp.einsum("rh,ehi->rei", xf, w1.astype(xf.dtype),
                   preferred_element_type=jnp.float32)
    if b1 is not None:
        h = h + b1.astype(jnp.float32)[None]
    acts = {"relu": jax.nn.relu, "gelu": _gelu_erf,
            "silu": jax.nn.silu, "swiglu": jax.nn.silu,
            "identity": lambda a: a}
    if act not in acts:
        raise NotSupportedError(f"MoE activation_type {act!r}")
    if w3 is not None:
        # gated experts: act(fc1(x)) * fc3(x) — 'swiglu' gates with silu,
        # other activation_types gate with themselves (geglu/reglu)
        g = jnp.einsum("rh,ehi->rei", xf, w3.astype(xf.dtype),
                       preferred_element_type=jnp.float32)
        if b3 is not None:
            g = g + b3.astype(jnp.float32)[None]
        h = acts[act](h) * g
    elif act == "swiglu":
        raise NotSupportedError(
            "MoE activation_type='swiglu' without fc3 weights (interleaved "
            "gate packing inside fc1) — export with separate fc3, or use "
            "a plain activation")
    else:
        h = acts[act](h)
    y = jnp.einsum("rei,eih->reh", h.astype(xf.dtype), w2.astype(xf.dtype),
                   preferred_element_type=jnp.float32)
    if b2 is not None:
        y = y + b2.astype(jnp.float32)[None]
    out = jnp.einsum("reh,re->rh", y, route.astype(y.dtype))
    return out.astype(x.dtype).reshape(lead + (x.shape[-1],))


@register("QMoE", static={2, 3, 5, 6, 8, 9})
def qmoe_contrib(ctx: Ctx, node: Node):
    """Quantized MoE (Phi-3.5-MoE-class): 4- or 8-bit symmetric per-column
    expert weights with f32 scales. Packed weights/scales are initializers
    (trace-time constants): unpack to an int8 stack host-side, multiply the
    scales back in-graph so XLA fuses the dequant into the expert einsums
    (same design as MatMulNBits; weights stay int8 in HBM).

    Input order mirrors MoE with (weights, scales, bias) triples per fc:
    [x, router, fc1_w, fc1_scales, fc1_bias, fc2_w, fc2_scales, fc2_bias,
    fc3_w, fc3_scales, fc3_bias]; attr expert_weight_bits in {4, 8}.
    """
    x = ctx.get(node.inputs[0])
    router = ctx.get(node.inputs[1])
    bits = int(node.attr("expert_weight_bits", 4))
    if bits not in (4, 8):
        raise NotSupportedError(f"QMoE expert_weight_bits={bits}")

    def dequant(w_idx, s_idx, out_cols):
        packed = np.asarray(ctx.static(node.inputs[w_idx]))
        scales = np.asarray(ctx.static(node.inputs[s_idx]), np.float32)
        e = packed.shape[0]
        rows = packed.reshape(e, packed.shape[1], -1).view(np.uint8)
        if bits == 4:
            if out_cols % 2 == 0:
                # rows pack with no per-row padding: one flat native unpack
                # (C++ fast path, ir/tensor_codec shares the implementation)
                from ..native import unpack_int4

                w = unpack_int4(rows, e * packed.shape[1] * out_cols,
                                signed=False)
                w = w.reshape(e, packed.shape[1], out_cols).astype(np.int16) - 8
            else:
                lo = (rows & 0xF).astype(np.int16)
                hi = (rows >> 4).astype(np.int16)
                w = np.stack([lo, hi], axis=-1).reshape(e, packed.shape[1], -1)
                w = w[..., :out_cols] - 8
        else:
            w = rows[..., :out_cols].astype(np.int16) - 128
        w_int = jnp.asarray(w.astype(np.int8))           # (E, in, out)
        s = jnp.asarray(scales.reshape(e, 1, out_cols))
        return w_int.astype(x.dtype) * s.astype(x.dtype)

    def opt_bias(i):
        return (ctx.get(node.inputs[i])
                if len(node.inputs) > i and node.inputs[i] else None)

    hidden = x.shape[-1]
    # fc1/fc3 produce `inter` columns, fc2 produces `hidden`
    inter = np.asarray(ctx.static(node.inputs[3], required=True)).reshape(
        ctx.static(node.inputs[2]).shape[0], -1).shape[-1]
    w1 = dequant(2, 3, inter)
    w2 = dequant(5, 6, hidden)
    w3 = (dequant(8, 9, inter)
          if len(node.inputs) > 8 and node.inputs[8] else None)
    ctx.set(node.outputs[0],
            _moe_core(node, x, router, w1, opt_bias(4), w2, opt_bias(7),
                      w3, opt_bias(10)))
