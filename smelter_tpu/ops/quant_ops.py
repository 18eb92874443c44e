"""Quantization op lowerings: QuantizeLinear / DequantizeLinear.

DequantizeLinear is how int8 weight-only models express weights in the
graph (quant/weight_quant.py). The plain lowering below is what XLA sees
when Pallas fusion is off — XLA fuses the multiply into the consumer conv
anyway; with Config.use_pallas the executor pattern-matches
DequantizeLinear+Conv/MatMul into fused Pallas kernels instead
(kernels/)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ir.graph import Node
from .registry import Ctx, register


def _scale_shape(scale, x_ndim: int, axis: int):
    if scale.ndim == 0 or scale.size == 1:
        return scale.reshape(())
    shape = [1] * x_ndim
    shape[axis] = scale.shape[0] if scale.ndim == 1 else -1
    return scale.reshape(shape)


@register("DequantizeLinear", since=10)
def dequantize_linear(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    scale = ctx.get(node.inputs[1])
    axis = node.attr("axis", 1)
    if axis < 0:
        axis += x.ndim
    s = _scale_shape(scale, x.ndim, axis)
    y = x.astype(jnp.float32) * s.astype(jnp.float32)
    if len(node.inputs) > 2 and node.inputs[2]:
        zp = ctx.get(node.inputs[2])
        y = y - _scale_shape(zp, x.ndim, axis).astype(jnp.float32) * s.astype(jnp.float32)
    ctx.set(node.outputs[0], y)


@register("QuantizeLinear", since=10)
def quantize_linear(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    scale = ctx.get(node.inputs[1])
    axis = node.attr("axis", 1)
    if axis < 0:
        axis += x.ndim
    s = _scale_shape(scale, x.ndim, axis).astype(jnp.float32)
    y = jnp.round(x.astype(jnp.float32) / s)
    if len(node.inputs) > 2 and node.inputs[2]:
        zp = ctx.get(node.inputs[2])
        y = y + _scale_shape(zp, x.ndim, axis).astype(jnp.float32)
        out_dtype = zp.dtype
    else:
        out_dtype = jnp.int8
    info = jnp.iinfo(out_dtype)
    ctx.set(node.outputs[0], jnp.clip(y, info.min, info.max).astype(out_dtype))
