"""Elementwise / activation / binary op lowerings.

Covers the reference's activation converters (reference:
Sources/Smelter/Converters.swift — Relu :342, PRelu :361, Elu :386, Exp
:411, Sigmoid :466, HardSigmoid :1073, Softplus :1090, Softsign :1107,
Tanh :1124, Log :1142, Pow :1160, Abs :1056) and elementwise binary
converters (Add :430, Sub :1177, Mul :453, Div :1195), extended with the
long tail a real ONNX engine needs (Clip/Erf/Gelu/Where/compares/...).
All are single jnp calls; XLA fuses them into neighboring convs/matmuls,
which is the TPU analog of MPS neuron-node fusion.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ir.graph import Node
from .registry import Ctx, register


def _unary(op_type: str, fn, since: int = 1):
    @register(op_type, since=since)
    def _lower(ctx: Ctx, node: Node, _fn=fn):
        ctx.set(node.outputs[0], _fn(ctx.get(node.inputs[0])))


_unary("Relu", lambda x: jnp.maximum(x, 0))
_unary("Sigmoid", jax.nn.sigmoid)
_unary("Tanh", jnp.tanh)
_unary("Exp", jnp.exp)
_unary("Log", jnp.log)
_unary("Abs", jnp.abs)
_unary("Neg", jnp.negative)
_unary("Sqrt", jnp.sqrt)
_unary("Reciprocal", lambda x: 1.0 / x)
_unary("Floor", jnp.floor)
_unary("Ceil", jnp.ceil)
_unary("Round", jnp.round)
_unary("Sign", jnp.sign)
_unary("Erf", jax.lax.erf)
_unary("Softplus", jax.nn.softplus)
_unary("Softsign", jax.nn.soft_sign)
_unary("Sin", jnp.sin)
_unary("Cos", jnp.cos)
_unary("Not", jnp.logical_not)
_unary("Identity", lambda x: x)
_unary("Mish", lambda x: x * jnp.tanh(jax.nn.softplus(x)))
_unary("HardSwish", jax.nn.hard_swish, since=14)


@register("LeakyRelu")
def leaky_relu(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    alpha = node.attr("alpha", 0.01)
    ctx.set(node.outputs[0], jnp.where(x >= 0, x, x * jnp.asarray(alpha, x.dtype)))


@register("PRelu")
def prelu(ctx: Ctx, node: Node):
    """Full-tensor slope (the reference only supports scalar alpha read out
    of the slope tensor, Converters.swift:361-384)."""
    x = ctx.get(node.inputs[0])
    slope = ctx.get(node.inputs[1]).astype(x.dtype)
    if slope.ndim == x.ndim - 1:  # ONNX unidirectional broadcast from (C,...)
        slope = slope.reshape((1,) + slope.shape)
    ctx.set(node.outputs[0], jnp.where(x >= 0, x, x * slope))


@register("Elu")
def elu(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    alpha = jnp.asarray(node.attr("alpha", 1.0), x.dtype)
    ctx.set(node.outputs[0], jnp.where(x >= 0, x, alpha * jnp.expm1(x)))


@register("Selu")
def selu(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    alpha = node.attr("alpha", 1.6732632423543772)
    gamma = node.attr("gamma", 1.0507009873554805)
    ctx.set(node.outputs[0],
            jnp.asarray(gamma, x.dtype) * jnp.where(
                x >= 0, x, jnp.asarray(alpha, x.dtype) * jnp.expm1(x)))


@register("HardSigmoid")
def hard_sigmoid(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    alpha = jnp.asarray(node.attr("alpha", 0.2), x.dtype)
    beta = jnp.asarray(node.attr("beta", 0.5), x.dtype)
    ctx.set(node.outputs[0], jnp.clip(alpha * x + beta, 0.0, 1.0))


# Official since opset 20, but accepted at any opset (exporters commonly emit
# it earlier as a contrib op).
@register("Gelu")
def gelu(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    approx = node.attr("approximate", "none")
    if isinstance(approx, bytes):
        approx = approx.decode()
    use_tanh = approx == "tanh"
    # Config.gelu="auto": under a reduced compute dtype the tanh
    # approximation's error (~1e-3 absolute max) is below bf16 resolution,
    # and erf costs ~40% more MLP time on the VPU (probe14: 2.32 vs
    # 1.70 ms/layer on ViT-B). "exact"/"tanh" force either form.
    mode = getattr(ctx.config, "gelu", "auto") if ctx.config else "auto"
    if mode == "tanh":
        use_tanh = True
    elif mode == "auto" and not use_tanh:
        cd = getattr(ctx.config, "compute_dtype", "float32") if ctx.config else "float32"
        if cd != "float32" and x.dtype != jnp.float32:
            use_tanh = True
    ctx.set(node.outputs[0], jax.nn.gelu(x, approximate=use_tanh))


@register("Pow")
def pow_(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    y = ctx.get(node.inputs[1])
    ctx.set(node.outputs[0], jnp.power(x, y.astype(x.dtype)))


@register("Clip")
def clip(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    if ctx.opset >= 11:
        lo = ctx.get(node.inputs[1]) if len(node.inputs) > 1 and node.inputs[1] else None
        hi = ctx.get(node.inputs[2]) if len(node.inputs) > 2 and node.inputs[2] else None
    else:
        lo = node.attr("min")
        hi = node.attr("max")
    y = x
    if lo is not None:
        y = jnp.maximum(y, jnp.asarray(lo, x.dtype))
    if hi is not None:
        y = jnp.minimum(y, jnp.asarray(hi, x.dtype))
    ctx.set(node.outputs[0], y)


def _binary(op_type: str, fn, since: int = 1, bool_out: bool = False):
    @register(op_type, since=since)
    def _lower(ctx: Ctx, node: Node, _fn=fn, _bool=bool_out):
        a = ctx.get(node.inputs[0])
        b = ctx.get(node.inputs[1])
        if not _bool and hasattr(a, "dtype") and hasattr(b, "dtype") and a.dtype != b.dtype:
            b = b.astype(a.dtype)
        ctx.set(node.outputs[0], _fn(a, b))


_binary("Add", jnp.add)
_binary("Sub", jnp.subtract)
_binary("Mul", jnp.multiply)
_binary("Div", jnp.divide)


@register("Mod", since=10)
def mod_op(ctx: Ctx, node: Node):
    a = ctx.get(node.inputs[0])
    b = ctx.get(node.inputs[1])
    if node.attr("fmod", 0):  # C fmod: result takes the dividend's sign
        ctx.set(node.outputs[0], jnp.fmod(a, b))
    else:  # python %: result takes the divisor's sign
        ctx.set(node.outputs[0], jnp.mod(a, b))

_binary("Equal", jnp.equal, bool_out=True)
_binary("Greater", jnp.greater, bool_out=True)
_binary("GreaterOrEqual", jnp.greater_equal, since=12, bool_out=True)
_binary("Less", jnp.less, bool_out=True)
_binary("LessOrEqual", jnp.less_equal, since=12, bool_out=True)
_binary("And", jnp.logical_and, bool_out=True)
_binary("Or", jnp.logical_or, bool_out=True)
_binary("Xor", jnp.logical_xor, bool_out=True)
_binary("BitwiseAnd", jnp.bitwise_and, since=18)
_binary("BitwiseOr", jnp.bitwise_or, since=18)
_binary("BitwiseXor", jnp.bitwise_xor, since=18)
_unary("BitwiseNot", jnp.bitwise_not, since=18)


@register("Min")
def min_n(ctx: Ctx, node: Node):
    vals = [ctx.get(n) for n in node.inputs]
    out = vals[0]
    for v in vals[1:]:
        out = jnp.minimum(out, v.astype(out.dtype))
    ctx.set(node.outputs[0], out)


@register("Max")
def max_n(ctx: Ctx, node: Node):
    vals = [ctx.get(n) for n in node.inputs]
    out = vals[0]
    for v in vals[1:]:
        out = jnp.maximum(out, v.astype(out.dtype))
    ctx.set(node.outputs[0], out)


@register("Sum")
def sum_n(ctx: Ctx, node: Node):
    vals = [ctx.get(n) for n in node.inputs]
    out = vals[0]
    for v in vals[1:]:
        out = out + v.astype(out.dtype)
    ctx.set(node.outputs[0], out)


@register("Mean")
def mean_n(ctx: Ctx, node: Node):
    vals = [ctx.get(n) for n in node.inputs]
    out = vals[0]
    for v in vals[1:]:
        out = out + v.astype(out.dtype)
    ctx.set(node.outputs[0], out / len(vals))


@register("Where", since=9)
def where(ctx: Ctx, node: Node):
    cond = ctx.get(node.inputs[0])
    a = ctx.get(node.inputs[1])
    b = ctx.get(node.inputs[2])
    ctx.set(node.outputs[0], jnp.where(cond, a, b.astype(a.dtype)))


@register("Dropout")
def dropout(ctx: Ctx, node: Node):
    """Inference passthrough, parity with MPSCNNDropoutNode usage
    (Converters.swift:918-939)."""
    x = ctx.get(node.inputs[0])
    ctx.set(node.outputs[0], x)
    if len(node.outputs) > 1 and node.outputs[1]:
        ctx.set(node.outputs[1], jnp.ones(x.shape, jnp.bool_))


@register("Celu", since=12)
def celu(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    alpha = jnp.asarray(node.attr("alpha", 1.0), x.dtype)
    ctx.set(node.outputs[0],
            jnp.maximum(x, 0) + jnp.minimum(0, alpha * jnp.expm1(x / alpha)))


@register("ThresholdedRelu", since=10)
def thresholded_relu(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    alpha = jnp.asarray(node.attr("alpha", 1.0), x.dtype)
    ctx.set(node.outputs[0], jnp.where(x > alpha, x, jnp.zeros_like(x)))


@register("Shrink", since=9)
def shrink(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    lambd = jnp.asarray(node.attr("lambd", 0.5), x.dtype)
    bias = jnp.asarray(node.attr("bias", 0.0), x.dtype)
    ctx.set(node.outputs[0],
            jnp.where(x < -lambd, x + bias,
                      jnp.where(x > lambd, x - bias, jnp.zeros_like(x))))


@register("IsNaN", since=9)
def isnan(ctx: Ctx, node: Node):
    ctx.set(node.outputs[0], jnp.isnan(ctx.get(node.inputs[0])))


@register("IsInf", since=10)
def isinf(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    pos = bool(node.attr("detect_positive", 1))
    neg = bool(node.attr("detect_negative", 1))
    y = jnp.zeros(x.shape, jnp.bool_)
    if pos:
        y = y | (x == jnp.inf)
    if neg:
        y = y | (x == -jnp.inf)
    ctx.set(node.outputs[0], y)


@register("Atan")
def atan(ctx: Ctx, node: Node):
    ctx.set(node.outputs[0], jnp.arctan(ctx.get(node.inputs[0])))


@register("Asin")
def asin(ctx: Ctx, node: Node):
    ctx.set(node.outputs[0], jnp.arcsin(ctx.get(node.inputs[0])))


@register("Acos")
def acos(ctx: Ctx, node: Node):
    ctx.set(node.outputs[0], jnp.arccos(ctx.get(node.inputs[0])))


@register("Tan")
def tan(ctx: Ctx, node: Node):
    ctx.set(node.outputs[0], jnp.tan(ctx.get(node.inputs[0])))


@register("Sinh")
def sinh(ctx: Ctx, node: Node):
    ctx.set(node.outputs[0], jnp.sinh(ctx.get(node.inputs[0])))


@register("Cosh")
def cosh(ctx: Ctx, node: Node):
    ctx.set(node.outputs[0], jnp.cosh(ctx.get(node.inputs[0])))


@register("Asinh")
def asinh(ctx: Ctx, node: Node):
    ctx.set(node.outputs[0], jnp.arcsinh(ctx.get(node.inputs[0])))


@register("Acosh")
def acosh(ctx: Ctx, node: Node):
    ctx.set(node.outputs[0], jnp.arccosh(ctx.get(node.inputs[0])))


@register("Atanh")
def atanh(ctx: Ctx, node: Node):
    ctx.set(node.outputs[0], jnp.arctanh(ctx.get(node.inputs[0])))
