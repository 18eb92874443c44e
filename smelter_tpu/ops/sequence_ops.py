"""ONNX sequence ops (SequenceConstruct/At/Insert/Erase/Length/Empty,
ConcatFromSequence, SplitToSequence) plus the Optional trio.

Absent from the reference (its IR is tensors-only, ONNXGraph.swift:73-88);
implemented here to close the standard-opset envelope. Design: a sequence
value is a Python TUPLE of traced arrays flowing along one edge — a valid
jax pytree, so the executor's env and jax.eval_shape carry it unchanged
(infer_value_types skips non-tensor edges). The consequence is that
sequence STRUCTURE must be trace-time static: positions and lengths come
from initializers (run constant folding first), matching the framework's
static-shape discipline. A dynamic position raises NotSupportedError with
that explanation rather than producing wrong results.

Optional is modeled as the value itself (present) or the empty string edge
(absent, legal in ONNX for omitted optional inputs): Optional/
OptionalGetElement are identity, OptionalHasElement folds to a constant.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ir.errors import NotSupportedError
from ..ir.graph import Node
from .registry import Ctx, register


def _seq(ctx: Ctx, name: str) -> tuple:
    v = ctx.get(name)
    if not isinstance(v, tuple):
        raise NotSupportedError(
            f"edge {name!r} is not a sequence value (sequence ops require a "
            f"SequenceConstruct/SplitToSequence producer)")
    return v


def _static_pos(ctx: Ctx, name: str, length: int, *, insert: bool) -> int:
    pos = int(ctx.static(name).reshape(-1)[0])
    if pos < 0:
        pos += length + (1 if insert else 0)
    hi = length if insert else length - 1
    if not 0 <= pos <= hi:
        raise NotSupportedError(
            f"sequence position {pos} out of range for length {length}")
    return pos


@register("SequenceEmpty", since=11)
def sequence_empty(ctx: Ctx, node: Node):
    ctx.set(node.outputs[0], ())


@register("SequenceConstruct", since=11)
def sequence_construct(ctx: Ctx, node: Node):
    ctx.set(node.outputs[0], tuple(ctx.get(i) for i in node.inputs))


@register("SequenceLength", since=11)
def sequence_length(ctx: Ctx, node: Node):
    n = len(_seq(ctx, node.inputs[0]))
    ctx.set_static(node.outputs[0], np.asarray(n, np.int32))


@register("SequenceAt", since=11)
def sequence_at(ctx: Ctx, node: Node):
    seq = _seq(ctx, node.inputs[0])
    pos = _static_pos(ctx, node.inputs[1], len(seq), insert=False)
    ctx.set(node.outputs[0], seq[pos])


@register("SequenceInsert", since=11)
def sequence_insert(ctx: Ctx, node: Node):
    seq = _seq(ctx, node.inputs[0])
    t = ctx.get(node.inputs[1])
    pos = (len(seq) if len(node.inputs) < 3 or not node.inputs[2]
           else _static_pos(ctx, node.inputs[2], len(seq), insert=True))
    ctx.set(node.outputs[0], seq[:pos] + (t,) + seq[pos:])


@register("SequenceErase", since=11)
def sequence_erase(ctx: Ctx, node: Node):
    seq = _seq(ctx, node.inputs[0])
    pos = (len(seq) - 1 if len(node.inputs) < 2 or not node.inputs[1]
           else _static_pos(ctx, node.inputs[1], len(seq), insert=False))
    ctx.set(node.outputs[0], seq[:pos] + seq[pos + 1:])


@register("ConcatFromSequence", since=11)
def concat_from_sequence(ctx: Ctx, node: Node):
    seq = _seq(ctx, node.inputs[0])
    if not seq:
        raise NotSupportedError("ConcatFromSequence of an empty sequence")
    axis = int(node.attr("axis"))
    if node.attr("new_axis", 0):
        ctx.set(node.outputs[0], jnp.stack(seq, axis=axis))
    else:
        ctx.set(node.outputs[0], jnp.concatenate(seq, axis=axis))


@register("SplitToSequence", since=11, static={1})
def split_to_sequence(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    axis = int(node.attr("axis", 0))
    if axis < 0:
        axis += x.ndim
    keepdims = int(node.attr("keepdims", 1))
    if len(node.inputs) > 1 and node.inputs[1]:
        split = ctx.static(node.inputs[1])
        if split.ndim == 0:  # scalar: equal chunks of that size (last short)
            size = int(split)
            bounds = list(range(size, x.shape[axis], size))
        else:
            sizes = [int(s) for s in split.reshape(-1)]
            if sum(sizes) != x.shape[axis]:
                raise NotSupportedError(
                    f"SplitToSequence sizes {sizes} != dim {x.shape[axis]}")
            bounds = list(np.cumsum(sizes)[:-1])
        parts = jnp.split(x, bounds, axis=axis)
    else:
        # default: length-1 slices; keepdims=0 squeezes the split axis
        parts = jnp.split(x, x.shape[axis], axis=axis)
        if not keepdims:
            parts = [jnp.squeeze(p, axis=axis) for p in parts]
    ctx.set(node.outputs[0], tuple(parts))


@register("SequenceMap", since=17)
def sequence_map(ctx: Ctx, node: Node):
    raise NotSupportedError(
        "SequenceMap (subgraph mapped over a sequence) is not lowered; "
        "unroll the loop at export time or use Scan over a stacked tensor")


@register("Optional", since=15)
def optional(ctx: Ctx, node: Node):
    if node.inputs and node.inputs[0]:
        ctx.set(node.outputs[0], ctx.get(node.inputs[0]))
    else:
        ctx.set(node.outputs[0], None)  # empty optional


@register("OptionalHasElement", since=15)
def optional_has_element(ctx: Ctx, node: Node):
    present = bool(node.inputs and node.inputs[0]
                   and ctx.has(node.inputs[0])
                   and ctx.get(node.inputs[0]) is not None)
    ctx.set_static(node.outputs[0], np.asarray(present))


@register("OptionalGetElement", since=15)
def optional_get_element(ctx: Ctx, node: Node):
    v = ctx.get(node.inputs[0])
    if v is None:
        raise NotSupportedError("OptionalGetElement on an empty optional")
    ctx.set(node.outputs[0], v)
