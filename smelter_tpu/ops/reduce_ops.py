"""Reduction and arg ops: ReduceMean/Sum/Max/Min/Prod/L2, ArgMax/ArgMin,
CumSum, TopK. Absent from the reference (no reduce ops beyond global
pooling, Sources/Smelter/Converters.swift:578-605) but required for the
ViT/transformer path and general ONNX coverage."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ir.graph import Node
from .registry import Ctx, register


def _axes_for(ctx: Ctx, node: Node, ndim: int, axes_input_since: int = 18):
    """ONNX reductions moved axes from attribute to input at opset 18
    (ReduceSum at 13)."""
    axes = None
    if len(node.inputs) > 1 and node.inputs[1]:
        axes = tuple(int(a) for a in ctx.static(node.inputs[1]).reshape(-1))
    elif node.attr("axes") is not None:
        axes = tuple(node.attr("axes"))
    if axes is None:
        if node.attr("noop_with_empty_axes", 0):
            return ()
        return tuple(range(ndim))
    return tuple(a + ndim if a < 0 else a for a in axes)


def _reduce(op_type: str, fn):
    @register(op_type, static={1})
    def _lower(ctx: Ctx, node: Node, _fn=fn):
        x = ctx.get(node.inputs[0])
        axes = _axes_for(ctx, node, x.ndim)
        keep = bool(node.attr("keepdims", 1))
        if axes == ():
            ctx.set(node.outputs[0], x)
            return
        ctx.set(node.outputs[0], _fn(x, axes, keep))


_reduce("ReduceMean", lambda x, a, k: jnp.mean(x, axis=a, keepdims=k))
_reduce("ReduceSum", lambda x, a, k: jnp.sum(x, axis=a, keepdims=k))
_reduce("ReduceMax", lambda x, a, k: jnp.max(x, axis=a, keepdims=k))
_reduce("ReduceMin", lambda x, a, k: jnp.min(x, axis=a, keepdims=k))
_reduce("ReduceProd", lambda x, a, k: jnp.prod(x, axis=a, keepdims=k))
_reduce("ReduceL2", lambda x, a, k: jnp.sqrt(jnp.sum(jnp.square(x), axis=a, keepdims=k)))
_reduce("ReduceL1", lambda x, a, k: jnp.sum(jnp.abs(x), axis=a, keepdims=k))
_reduce("ReduceSumSquare", lambda x, a, k: jnp.sum(jnp.square(x), axis=a, keepdims=k))
_reduce("ReduceLogSumExp", lambda x, a, k: _logsumexp(x, a, k))
_reduce("ReduceLogSum", lambda x, a, k: jnp.log(jnp.sum(x, axis=a, keepdims=k)))


def _logsumexp(x, axes, keep):
    m = jnp.max(x, axis=axes, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)  # all -inf slice -> log(0)
    y = jnp.log(jnp.sum(jnp.exp(x - m), axis=axes, keepdims=True)) + m
    return y if keep else jnp.squeeze(y, axis=axes)


@register("ArgMax")
def argmax(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    axis = node.attr("axis", 0)
    keep = bool(node.attr("keepdims", 1))
    if node.attr("select_last_index", 0):
        y = x.shape[axis] - 1 - jnp.argmax(jnp.flip(x, axis), axis=axis)
    else:
        y = jnp.argmax(x, axis=axis)
    if keep:
        y = jnp.expand_dims(y, axis)
    ctx.set(node.outputs[0], y.astype(jnp.int32))  # int64 unavailable without x64


@register("ArgMin")
def argmin(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    axis = node.attr("axis", 0)
    keep = bool(node.attr("keepdims", 1))
    if node.attr("select_last_index", 0):
        y = x.shape[axis] - 1 - jnp.argmin(jnp.flip(x, axis), axis=axis)
    else:
        y = jnp.argmin(x, axis=axis)
    if keep:
        y = jnp.expand_dims(y, axis)
    ctx.set(node.outputs[0], y.astype(jnp.int32))  # int64 unavailable without x64


@register("CumSum", since=11, static={1})
def cumsum(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    axis = int(ctx.static(node.inputs[1]).reshape(-1)[0])
    if node.attr("reverse", 0):
        x = jnp.flip(x, axis)
    y = jnp.cumsum(x, axis=axis)
    if node.attr("exclusive", 0):  # shift right, zero-filled leading slot
        pad = [(0, 0)] * x.ndim
        pad[axis] = (1, 0)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, x.shape[axis])
        y = jnp.pad(y, pad)[tuple(sl)]
    if node.attr("reverse", 0):
        y = jnp.flip(y, axis)
    ctx.set(node.outputs[0], y)


@register("TopK", since=10, static={1})
def topk(ctx: Ctx, node: Node):
    import jax

    x = ctx.get(node.inputs[0])
    k = int(ctx.static(node.inputs[1]).reshape(-1)[0])
    axis = node.attr("axis", -1)
    if axis < 0:
        axis += x.ndim
    largest = node.attr("largest", 1)
    xa = jnp.moveaxis(x, axis, -1)
    vals, idx = jax.lax.top_k(xa if largest else -xa, k)
    if not largest:
        vals = -vals
    ctx.set(node.outputs[0], jnp.moveaxis(vals, -1, axis))
    if len(node.outputs) > 1 and node.outputs[1]:
        ctx.set(node.outputs[1], jnp.moveaxis(idx, -1, axis).astype(jnp.int32))
