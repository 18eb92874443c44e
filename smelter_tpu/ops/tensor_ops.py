"""Tensor-manipulation op lowerings: reshape/flatten/pad/constant/concat/
slice/gather/transpose/cast/shape and friends.

Covers the reference's shape-op converters (reference:
Sources/Smelter/Converters.swift — Reshape :830-876 with 0=keep / -1=infer,
Flatten :879-915, Pad :942-989 constant/reflect/edge, Constant :716-727,
Concat :554-574) without its restrictions: any flatten axis (the reference
fatalErrors on axis != 1, :895), correct concat shape for any input count
(the reference hardcodes depth*2, :566-567 — a documented bug we do not
replicate), and the modern opset variants where axes/shape arrive as
inputs instead of attributes.

Shape-producing ops (Shape/Constant/Size/Range/ConstantOfShape on static
inputs) publish their value into the static env so downstream Reshape/
Slice/Resize chains resolve at trace time — the interpreter-level analog
of ONNX shape-inference constant propagation.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ir.errors import NotSupportedError
from ..ir.graph import Node
from ..utils import dtypes as dt
from .registry import Ctx, register


def _static_or_none(ctx: Ctx, name: str) -> np.ndarray | None:
    return ctx.static(name, required=False) if name else None


@register("Constant")
def constant(ctx: Ctx, node: Node):
    """Materialize the attribute tensor (parity: Converters.swift:716-727)."""
    for key in ("value", "value_float", "value_int", "value_floats", "value_ints"):
        v = node.attr(key)
        if v is not None:
            arr = np.asarray(v)
            if key == "value_int":
                arr = arr.astype(np.int64)
            elif key == "value_ints":
                arr = arr.astype(np.int64)
            elif key in ("value_float", "value_floats"):
                arr = arr.astype(np.float32)
            ctx.set_static(node.outputs[0], arr)
            return
    raise NotSupportedError(f"Constant node {node.name!r} without value attr")


@register("ConstantOfShape", since=9, static={0})
def constant_of_shape(ctx: Ctx, node: Node):
    shape = tuple(int(d) for d in ctx.static(node.inputs[0]).reshape(-1))
    value = node.attr("value")
    if value is None:
        value = np.zeros(1, np.float32)
    ctx.set_static(node.outputs[0], np.full(shape, np.asarray(value).reshape(-1)[0]))


@register("Shape")
def shape_op(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    shp = np.asarray(x.shape, np.int64)
    start = node.attr("start", 0) or 0
    end = node.attr("end")
    shp = shp[start:end] if end is not None else shp[start:]
    ctx.set_static(node.outputs[0], shp)


@register("Size")
def size_op(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    ctx.set_static(node.outputs[0], np.asarray(int(np.prod(x.shape)), np.int64))


@register("Range", since=11, static={0, 1, 2})
def range_op(ctx: Ctx, node: Node):
    start, limit, delta = (ctx.static(n).reshape(()) for n in node.inputs[:3])
    ctx.set_static(node.outputs[0], np.arange(start, limit, delta))


def _resolve_reshape(shape_spec: np.ndarray, in_shape: tuple[int, ...], allowzero: int) -> tuple[int, ...]:
    out = []
    for i, d in enumerate(int(x) for x in shape_spec.reshape(-1)):
        if d == 0 and not allowzero:
            out.append(in_shape[i])  # 0 = copy input dim (Converters.swift:851)
        else:
            out.append(d)
    if out.count(-1) > 1:
        raise NotSupportedError(f"reshape spec {out} has multiple -1")
    if -1 in out:
        known = int(np.prod([d for d in out if d != -1]))
        total = int(np.prod(in_shape))
        out[out.index(-1)] = total // max(known, 1)
    return tuple(out)


@register("Reshape", static={1})
def reshape(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    if ctx.opset >= 5:
        spec = ctx.static(node.inputs[1])
    else:
        spec = np.asarray(node.attr("shape"), np.int64)
    allowzero = int(node.attr("allowzero", 0))
    new_shape = _resolve_reshape(spec, x.shape, allowzero)
    ctx.set(node.outputs[0], x.reshape(new_shape))
    st = _static_or_none(ctx, node.inputs[0])
    if st is not None:
        ctx.set_static(node.outputs[0], st.reshape(new_shape))


@register("Flatten")
def flatten(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    axis = node.attr("axis", 1)
    if axis < 0:
        axis += x.ndim
    lead = int(np.prod(x.shape[:axis])) if axis else 1
    ctx.set(node.outputs[0], x.reshape((lead, -1)))


@register("Squeeze", static={1})
def squeeze(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    if ctx.opset >= 13:
        axes = _static_or_none(ctx, node.inputs[1] if len(node.inputs) > 1 else "")
        axes = None if axes is None else tuple(int(a) for a in axes.reshape(-1))
    else:
        a = node.attr("axes")
        axes = tuple(a) if a else None
    if axes is None:
        axes = tuple(i for i, d in enumerate(x.shape) if d == 1)
    axes = tuple(a + x.ndim if a < 0 else a for a in axes)
    y = x.reshape(tuple(d for i, d in enumerate(x.shape) if i not in axes))
    ctx.set(node.outputs[0], y)
    st = _static_or_none(ctx, node.inputs[0])
    if st is not None:
        ctx.set_static(node.outputs[0], st.reshape(y.shape))


@register("Unsqueeze", static={1})
def unsqueeze(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    if ctx.opset >= 13:
        axes = tuple(int(a) for a in ctx.static(node.inputs[1]).reshape(-1))
    else:
        axes = tuple(node.attr("axes"))
    out_rank = x.ndim + len(axes)
    axes = tuple(a + out_rank if a < 0 else a for a in axes)
    shape = []
    it = iter(x.shape)
    for i in range(out_rank):
        shape.append(1 if i in axes else next(it))
    y = x.reshape(tuple(shape))
    ctx.set(node.outputs[0], y)
    st = _static_or_none(ctx, node.inputs[0])
    if st is not None:
        ctx.set_static(node.outputs[0], st.reshape(y.shape))


@register("Transpose")
def transpose(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    perm = node.attr("perm")
    if perm is None:
        perm = tuple(reversed(range(x.ndim)))
    ctx.set(node.outputs[0], jnp.transpose(x, perm))


@register("Concat")
def concat(ctx: Ctx, node: Node):
    """N-input concat with true shape tracking (the reference hardcodes
    depth*2 for any input count, Converters.swift:566-567 — fixed here)."""
    vals = [ctx.get(n) for n in node.inputs]
    axis = node.attr("axis", 1)
    out = jnp.concatenate([v.astype(vals[0].dtype) for v in vals], axis=axis)
    ctx.set(node.outputs[0], out)
    statics = [_static_or_none(ctx, n) for n in node.inputs]
    if all(s is not None for s in statics):
        ctx.set_static(node.outputs[0], np.concatenate(statics, axis=axis))


@register("Split", since=2, static={1})
def split(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    axis = node.attr("axis", 0)
    if axis < 0:
        axis += x.ndim
    sizes = None
    if ctx.opset >= 13:
        if len(node.inputs) > 1 and node.inputs[1]:
            sizes = [int(s) for s in ctx.static(node.inputs[1]).reshape(-1)]
    else:
        s = node.attr("split")
        sizes = list(s) if s else None
    n_out = len(node.outputs)
    if sizes is None:
        # opset 18 semantics (also the only sane default earlier): chunks of
        # ceil(dim/n), last chunk takes the remainder.
        chunk = -(-x.shape[axis] // n_out)
        sizes = [chunk] * (n_out - 1) + [x.shape[axis] - chunk * (n_out - 1)]
        if sizes[-1] <= 0:
            raise NotSupportedError(
                f"Split: dim {x.shape[axis]} into {n_out} outputs leaves an "
                f"empty chunk")
    offs = np.cumsum([0] + sizes)
    for i, out_name in enumerate(node.outputs):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(int(offs[i]), int(offs[i + 1]))
        ctx.set(out_name, x[tuple(idx)])


@register("Slice", static={1, 2, 3, 4})
def slice_op(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    if ctx.opset >= 10:
        starts = ctx.static(node.inputs[1]).reshape(-1)
        ends = ctx.static(node.inputs[2]).reshape(-1)
        axes_in = node.inputs[3] if len(node.inputs) > 3 else ""
        steps_in = node.inputs[4] if len(node.inputs) > 4 else ""
        axes = _static_or_none(ctx, axes_in)
        steps = _static_or_none(ctx, steps_in)
        axes = axes.reshape(-1) if axes is not None else np.arange(len(starts))
        steps = steps.reshape(-1) if steps is not None else np.ones(len(starts), np.int64)
    else:
        starts = np.asarray(node.attr("starts"))
        ends = np.asarray(node.attr("ends"))
        a = node.attr("axes")
        axes = np.asarray(a) if a else np.arange(len(starts))
        steps = np.ones(len(starts), np.int64)
    idx = [slice(None)] * x.ndim
    for s, e, ax, st in zip(starts, ends, axes, steps):
        ax = int(ax) + (x.ndim if ax < 0 else 0)
        idx[ax] = slice(int(s), None if int(e) >= np.iinfo(np.int32).max else int(e), int(st))
    y = x[tuple(idx)]
    ctx.set(node.outputs[0], y)
    stv = _static_or_none(ctx, node.inputs[0])
    if stv is not None:
        ctx.set_static(node.outputs[0], stv[tuple(idx)])


@register("Gather")
def gather(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    axis = node.attr("axis", 0)
    st_idx = _static_or_none(ctx, node.inputs[1])
    st_x = _static_or_none(ctx, node.inputs[0])
    if st_idx is not None and st_x is not None:
        ctx.set_static(node.outputs[0], np.take(st_x, st_idx.astype(np.int64), axis=axis))
        return
    indices = ctx.get(node.inputs[1])
    # ONNX allows negative indices (from the end); jnp.take clips OOB.
    dim = x.shape[axis if axis >= 0 else axis + x.ndim]
    indices = jnp.where(indices < 0, indices + dim, indices)
    ctx.set(node.outputs[0], jnp.take(x, indices, axis=axis))


@register("GatherElements", since=11)
def gather_elements(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    indices = ctx.get(node.inputs[1])
    axis = node.attr("axis", 0)
    dim = x.shape[axis if axis >= 0 else axis + x.ndim]
    indices = jnp.where(indices < 0, indices + dim, indices)
    ctx.set(node.outputs[0], jnp.take_along_axis(x, indices, axis=axis))


@register("Expand", since=8, static={1})
def expand(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    shape = tuple(int(d) for d in ctx.static(node.inputs[1]).reshape(-1))
    # ONNX Expand uses numpy broadcast rules; dims of 1 in spec keep input dim.
    out_shape = np.broadcast_shapes(x.shape, shape)
    ctx.set(node.outputs[0], jnp.broadcast_to(x, out_shape))


@register("Tile", static={1})
def tile(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    reps = tuple(int(r) for r in ctx.static(node.inputs[1]).reshape(-1))
    ctx.set(node.outputs[0], jnp.tile(x, reps))


@register("Pad", static={1, 2})
def pad(ctx: Ctx, node: Node):
    """constant/reflect/edge pad over any dims (parity: Converters.swift:942-989
    supports channel+spatial constant/reflect/edge on images)."""
    x = ctx.get(node.inputs[0])
    mode = node.attr("mode", "constant")
    if isinstance(mode, bytes):
        mode = mode.decode()
    if ctx.opset >= 11:
        pads = ctx.static(node.inputs[1]).reshape(-1).astype(np.int64)
        cval = 0.0
        if len(node.inputs) > 2 and node.inputs[2]:
            cval = float(ctx.static(node.inputs[2]).reshape(-1)[0])
    else:
        pads = np.asarray(node.attr("pads"), np.int64)
        cval = node.attr("value", 0.0)
    rank = x.ndim
    pairs = [(int(pads[i]), int(pads[i + rank])) for i in range(rank)]
    if mode == "constant":
        y = jnp.pad(x, pairs, constant_values=jnp.asarray(cval, x.dtype))
    elif mode == "reflect":
        y = jnp.pad(x, pairs, mode="reflect")
    elif mode == "edge":
        y = jnp.pad(x, pairs, mode="edge")
    elif mode == "wrap":
        y = jnp.pad(x, pairs, mode="wrap")
    else:
        raise NotSupportedError(f"Pad mode {mode!r}")
    ctx.set(node.outputs[0], y)


@register("Cast", since=6)
def cast(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    to = dt.onnx_to_numpy_dtype(int(node.attr("to")))
    ctx.set(node.outputs[0], x.astype(to))
    st = _static_or_none(ctx, node.inputs[0])
    if st is not None:
        ctx.set_static(node.outputs[0], st.astype(to))


@register("CastLike", since=15)
def cast_like(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    like = ctx.get(node.inputs[1])
    ctx.set(node.outputs[0], x.astype(like.dtype))


@register("DepthToSpace")
def depth_to_space(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    bs = int(node.attr("blocksize"))
    mode = node.attr("mode", "DCR")
    if isinstance(mode, bytes):
        mode = mode.decode()
    if node.attr("data_layout") == "NHWC":
        n, h, w, c = x.shape
        if mode == "DCR":
            y = x.reshape(n, h, w, bs, bs, c // (bs * bs))
            y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
        else:  # CRD
            y = x.reshape(n, h, w, c // (bs * bs), bs, bs)
            y = jnp.transpose(y, (0, 1, 4, 2, 5, 3))
        ctx.set(node.outputs[0], y.reshape(n, h * bs, w * bs, c // (bs * bs)))
        return
    n, c, h, w = x.shape
    if mode == "DCR":
        y = x.reshape(n, bs, bs, c // (bs * bs), h, w)
        y = jnp.transpose(y, (0, 3, 4, 1, 5, 2))
    else:  # CRD
        y = x.reshape(n, c // (bs * bs), bs, bs, h, w)
        y = jnp.transpose(y, (0, 1, 4, 2, 5, 3))
    ctx.set(node.outputs[0], y.reshape(n, c // (bs * bs), h * bs, w * bs))


@register("SpaceToDepth")
def space_to_depth(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    bs = int(node.attr("blocksize"))
    if node.attr("data_layout") == "NHWC":
        n, h, w, c = x.shape
        y = x.reshape(n, h // bs, bs, w // bs, bs, c)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
        ctx.set(node.outputs[0], y.reshape(n, h // bs, w // bs, bs * bs * c))
        return
    n, c, h, w = x.shape
    y = x.reshape(n, c, h // bs, bs, w // bs, bs)
    y = jnp.transpose(y, (0, 3, 5, 1, 2, 4))
    ctx.set(node.outputs[0], y.reshape(n, c * bs * bs, h // bs, w // bs))


@register("Einsum", since=12)
def einsum(ctx: Ctx, node: Node):
    eq = node.attr("equation")
    if isinstance(eq, bytes):
        eq = eq.decode()
    vals = [ctx.get(n) for n in node.inputs]
    ctx.set(node.outputs[0], jnp.einsum(eq, *vals))


@register("GatherND", since=11)
def gather_nd(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    idx = ctx.get(node.inputs[1])
    b = int(node.attr("batch_dims", 0))
    k = idx.shape[-1]
    if b == 0:
        flat_idx = idx.reshape(-1, k)
        out = x[tuple(flat_idx[:, i] for i in range(k))]
        ctx.set(node.outputs[0], out.reshape(idx.shape[:-1] + x.shape[k:]))
        return
    # batch_dims > 0: leading b dims are shared; gather within each batch
    bshape = x.shape[:b]
    nb = 1
    for d in bshape:
        nb *= d
    x2 = x.reshape((nb,) + x.shape[b:])
    i2 = idx.reshape((nb, -1, k))
    bidx = jnp.arange(nb)[:, None]
    out = x2[(jnp.broadcast_to(bidx, i2.shape[:2]),)
             + tuple(i2[..., i] for i in range(k))]
    ctx.set(node.outputs[0],
            out.reshape(idx.shape[:-1] + x.shape[b + k:]))


@register("ScatterND", since=11)
def scatter_nd(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    idx = ctx.get(node.inputs[1])
    upd = ctx.get(node.inputs[2])
    k = idx.shape[-1]
    flat_idx = idx.reshape(-1, k)
    flat_upd = upd.reshape((-1,) + x.shape[k:])
    out = x.at[tuple(flat_idx[:, i] for i in range(k))].set(flat_upd)
    ctx.set(node.outputs[0], out)


@register("Scatter", since=9)
def scatter_deprecated(ctx: Ctx, node: Node):
    """Scatter (deprecated at opset 11) is ScatterElements without the
    reduction attribute — same axis/indices/updates semantics."""
    scatter_elements(ctx, node)


@register("ScatterElements", since=11)
def scatter_elements(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    idx = ctx.get(node.inputs[1])
    upd = ctx.get(node.inputs[2])
    axis = node.attr("axis", 0)
    reduction = node.attr("reduction", "none")
    if isinstance(reduction, bytes):
        reduction = reduction.decode()
    if axis < 0:
        axis += x.ndim
    idx = jnp.where(idx < 0, idx + x.shape[axis], idx)
    if reduction == "none":
        out = jnp.put_along_axis(x, idx, upd.astype(x.dtype), axis=axis,
                                 inplace=False)
    elif reduction in ("add", "mul", "max", "min"):
        # Coordinate grid over the UPDATES shape; the scatter axis takes the
        # provided indices, every other dim scatters to its own position.
        grid = [jnp.broadcast_to(
                    jnp.arange(idx.shape[d]).reshape(
                        [-1 if i == d else 1 for i in range(idx.ndim)]),
                    idx.shape)
                for d in range(idx.ndim)]
        grid[axis] = idx
        ref = x.at[tuple(grid)]
        op = {"add": ref.add, "mul": ref.multiply,
              "max": ref.max, "min": ref.min}[reduction]
        out = op(upd.astype(x.dtype))
    else:
        raise NotSupportedError(f"ScatterElements reduction {reduction}")
    ctx.set(node.outputs[0], out)


@register("OneHot", since=9, static={1, 2})
def one_hot(ctx: Ctx, node: Node):
    import jax

    indices = ctx.get(node.inputs[0])
    depth = int(ctx.static(node.inputs[1]).reshape(-1)[0])
    values = ctx.static(node.inputs[2]).reshape(-1)  # [off, on]
    axis = node.attr("axis", -1)
    indices = jnp.where(indices < 0, indices + depth, indices)  # spec: wrap
    oh = jax.nn.one_hot(indices, depth, axis=axis)
    off, on = float(values[0]), float(values[1])
    ctx.set(node.outputs[0], (oh * (on - off) + off).astype(np.asarray(values).dtype))


@register("Trilu", since=14, static={1})
def trilu(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    k = 0
    if len(node.inputs) > 1 and node.inputs[1]:
        k = int(ctx.static(node.inputs[1]).reshape(-1)[0])
    if node.attr("upper", 1):
        ctx.set(node.outputs[0], jnp.triu(x, k))
    else:
        ctx.set(node.outputs[0], jnp.tril(x, k))


@register("Flip", since=1)
def flip_op(ctx: Ctx, node: Node):
    # non-standard helper op (some exporters emit Reverse-like patterns)
    x = ctx.get(node.inputs[0])
    axes = node.attr("axes", [0])
    ctx.set(node.outputs[0], jnp.flip(x, axis=tuple(axes)))


def _unsupported(op_type: str, why: str):
    @register(op_type)
    def _lower(ctx: Ctx, node: Node, _op=op_type, _why=why):
        raise NotSupportedError(f"{_op}: {_why}")


# Dynamic-output-shape ops fundamentally conflict with XLA's static shapes;
# fail with an explanation instead of UnknownOpError (docs/ROADMAP.md items).
_unsupported("NonMaxSuppression",
             "dynamic output shape; static max_detections-padded variant is "
             "on the roadmap")
_unsupported("NonZero", "dynamic output shape under XLA static shapes")
_unsupported("Unique", "dynamic output shape under XLA static shapes")
_unsupported("StringNormalizer", "string tensors unsupported")
