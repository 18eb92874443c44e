"""Detection post-processing with static shapes: padded NMS.

ONNX NonMaxSuppression has a data-dependent output shape, which XLA cannot
express (the registered ONNX op fails with an explanation). This module
provides the TPU-native alternative used by real TPU detection serving:
fixed `max_detections` outputs padded with -1/0 — O(max_det * N) masked
suppression, fully jittable, vmappable over batch/class.

    boxes:  (N, 4) [y1, x1, y2, x2]
    scores: (N,)
    -> (indices (max_det,) int32 with -1 padding,
        kept_scores (max_det,) with 0 padding)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ir.graph import Node
from .registry import Ctx, register


def _iou(box, boxes):
    """IoU of one box against many. box (4,), boxes (N, 4)."""
    y1 = jnp.maximum(box[0], boxes[:, 0])
    x1 = jnp.maximum(box[1], boxes[:, 1])
    y2 = jnp.minimum(box[2], boxes[:, 2])
    x2 = jnp.minimum(box[3], boxes[:, 3])
    inter = jnp.maximum(y2 - y1, 0) * jnp.maximum(x2 - x1, 0)
    area = jnp.maximum(box[2] - box[0], 0) * jnp.maximum(box[3] - box[1], 0)
    areas = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
        jnp.maximum(boxes[:, 3] - boxes[:, 1], 0)
    return inter / jnp.maximum(area + areas - inter, 1e-9)


@functools.partial(jax.jit, static_argnames=("max_detections",))
def nms(boxes, scores, *, max_detections: int = 100,
        iou_threshold: float = 0.5, score_threshold: float = 0.0):
    """Greedy NMS with static output size. Returns (indices, kept_scores);
    slots beyond the number of survivors hold index -1 / score 0."""
    n = boxes.shape[0]
    live = scores > score_threshold

    def body(state, _):
        live, out_idx, out_sc, slot = state
        masked = jnp.where(live, scores, -jnp.inf)
        best = jnp.argmax(masked)
        best_score = masked[best]
        valid = best_score > -jnp.inf
        # suppress overlaps with the winner
        ious = _iou(boxes[best], boxes)
        live = live & (ious <= iou_threshold)
        live = live.at[best].set(False)
        out_idx = out_idx.at[slot].set(jnp.where(valid, best, -1))
        out_sc = out_sc.at[slot].set(jnp.where(valid, best_score, 0.0))
        return (live, out_idx, out_sc, slot + 1), None

    out_idx = jnp.full((max_detections,), -1, jnp.int32)
    out_sc = jnp.zeros((max_detections,), scores.dtype)
    (live, out_idx, out_sc, _), _ = jax.lax.scan(
        body, (live, out_idx, out_sc, 0), None, length=max_detections)
    return out_idx, out_sc


def batched_nms(boxes, scores, *, max_detections: int = 100,
                iou_threshold: float = 0.5, score_threshold: float = 0.0):
    """Per-class NMS over (B, C, N) scores with shared (B, N, 4) boxes.
    Returns (indices (B, C, max_det), scores (B, C, max_det))."""
    fn = functools.partial(nms, max_detections=max_detections,
                           iou_threshold=iou_threshold,
                           score_threshold=score_threshold)
    per_class = jax.vmap(lambda b, s: fn(b, s), in_axes=(None, 0))
    per_image = jax.vmap(per_class, in_axes=(0, 0))
    return per_image(boxes, scores)


def _dynamic_shape_op(op_type: str, alternative: str):
    """Register a lowering that fails with a pointer to the static-shape
    alternative: these ops have data-dependent output shapes, which XLA
    (trace-once, fixed-layout compilation) cannot express."""

    @register(op_type)
    def _fail(ctx: Ctx, node: Node, _op=op_type, _alt=alternative):
        from ..ir.errors import NotSupportedError

        raise NotSupportedError(
            f"{_op} has a data-dependent output shape, which XLA cannot "
            f"compile (static shapes only). {_alt}")


_dynamic_shape_op(
    "NonMaxSuppression",
    "Use smelter_tpu.ops.detection.nms / batched_nms: fixed max_detections "
    "outputs padded with -1 — the TPU-native detection serving pattern.")
_dynamic_shape_op(
    "NonZero",
    "Rework the graph to use Where/masking with a static upper bound, or "
    "run this subgraph on the host.")
_dynamic_shape_op(
    "Unique",
    "Rework the graph with a static upper bound (e.g. sort + adjacent-"
    "difference mask), or run this subgraph on the host.")
_dynamic_shape_op(
    "Compress",
    "Use Where with a padded static output size, or Gather with "
    "precomputed indices.")


def _bilinear_samples(img, ys, xs):
    """img (C, H, W); ys (NY,), xs (NX,) fractional coords -> (C, NY, NX)
    with ONNX RoiAlign edge semantics: samples outside [-1, size] contribute
    zero, in-range coords clamp to the border pixel."""
    h, w = img.shape[1], img.shape[2]
    vy = (ys >= -1.0) & (ys <= h)
    vx = (xs >= -1.0) & (xs <= w)
    ys = jnp.clip(ys, 0.0, h - 1)
    xs = jnp.clip(xs, 0.0, w - 1)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (ys - y0)[None, :, None]
    lx = (xs - x0)[None, None, :]
    val = ((1 - ly) * (1 - lx) * img[:, y0][:, :, x0]
           + (1 - ly) * lx * img[:, y0][:, :, x1]
           + ly * (1 - lx) * img[:, y1][:, :, x0]
           + ly * lx * img[:, y1][:, :, x1])
    return val * (vy[None, :, None] & vx[None, None, :])


@register("RoiAlign", since=10)
def roi_align_op(ctx: Ctx, node: Node):
    """ONNX RoiAlign: X (N,C,H,W), rois (R,4) [x1,y1,x2,y2], batch_indices
    (R,) -> (R, C, out_h, out_w). Sampling grid per bin is vmapped over
    rois; all shapes static. Deviation for XLA: ONNX's adaptive grid count
    (sampling_ratio=0 -> ceil(roi/bin), data-dependent) is replaced by a
    fixed grid of 2 — the value detection heads export anyway."""
    x = ctx.get(node.inputs[0]).astype(jnp.float32)
    rois = ctx.get(node.inputs[1]).astype(jnp.float32)
    bidx = ctx.get(node.inputs[2]).astype(jnp.int32)
    out_h = int(node.attr("output_height", 1))
    out_w = int(node.attr("output_width", 1))
    scale = float(node.attr("spatial_scale", 1.0))
    mode = (node.attr("mode", "avg") or "avg")
    if isinstance(mode, bytes):
        mode = mode.decode()
    ctm = node.attr("coordinate_transformation_mode",
                    "half_pixel" if ctx.opset >= 16 else "output_half_pixel")
    if isinstance(ctm, bytes):
        ctm = ctm.decode()
    half_pixel = ctm == "half_pixel"
    sr = int(node.attr("sampling_ratio", 0))
    grid = sr if sr > 0 else 2

    def one(img, roi):
        off = 0.5 if half_pixel else 0.0
        sw, sh = roi[0] * scale - off, roi[1] * scale - off
        ew, eh = roi[2] * scale - off, roi[3] * scale - off
        rw, rh = ew - sw, eh - sh
        if not half_pixel:  # legacy mode clamps rois to at least 1 pixel
            rw = jnp.maximum(rw, 1.0)
            rh = jnp.maximum(rh, 1.0)
        bin_h, bin_w = rh / out_h, rw / out_w
        ys = (sh + jnp.arange(out_h)[:, None] * bin_h
              + (jnp.arange(grid)[None, :] + 0.5) * bin_h / grid).reshape(-1)
        xs = (sw + jnp.arange(out_w)[:, None] * bin_w
              + (jnp.arange(grid)[None, :] + 0.5) * bin_w / grid).reshape(-1)
        s = _bilinear_samples(img, ys, xs)  # (C, out_h*grid, out_w*grid)
        s = s.reshape(img.shape[0], out_h, grid, out_w, grid)
        if mode == "max":
            return jnp.max(s, axis=(2, 4))
        return jnp.mean(s, axis=(2, 4))

    out = jax.vmap(one)(x[bidx], rois)
    ctx.set(node.outputs[0], out.astype(ctx.get(node.inputs[0]).dtype))


@register("MaxRoiPool")
def max_roi_pool(ctx: Ctx, node: Node):
    """Fast-RCNN RoI max pooling: X (N,C,H,W), rois (R,5)
    [batch_idx, x1, y1, x2, y2] -> (R, C, ph, pw). The original's
    data-dependent bin slices become per-bin row/column MASKS over the
    full map (static shapes; masked max per bin) — O(HW) per bin, fine at
    detection-head sizes. Integer-quantized coords per the legacy spec
    (round, end-inclusive, bins floor/ceil). Empty bins yield 0."""
    x = ctx.get(node.inputs[0])
    rois = ctx.get(node.inputs[1]).astype(jnp.float32)
    ph, pw = (int(d) for d in node.attr("pooled_shape"))
    scale = float(node.attr("spatial_scale", 1.0))
    H, W = x.shape[2], x.shape[3]
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)

    def axis_mask(start, size, bins, extent):
        """(bins, extent) bool: position in [start+floor(i*b), start+ceil((i+1)*b))."""
        bin_sz = size / bins
        i = jnp.arange(bins, dtype=jnp.float32)
        lo = jnp.clip(start + jnp.floor(i * bin_sz), 0, extent)
        hi = jnp.clip(start + jnp.ceil((i + 1) * bin_sz), 0, extent)
        pos = jnp.arange(extent, dtype=jnp.float32)
        return (pos[None, :] >= lo[:, None]) & (pos[None, :] < hi[:, None])

    def one(img, roi):  # img (C,H,W) float32
        c = jnp.round(roi[1:] * scale)
        x1, y1, x2, y2 = c[0], c[1], c[2], c[3]
        roi_w = jnp.maximum(x2 - x1 + 1.0, 1.0)
        roi_h = jnp.maximum(y2 - y1 + 1.0, 1.0)
        my = axis_mask(y1, roi_h, ph, H)          # (ph, H)
        mx = axis_mask(x1, roi_w, pw, W)          # (pw, W)
        t = jnp.max(jnp.where(my[None, :, :, None], img[:, None, :, :], neg),
                    axis=2)                        # (C, ph, W)
        v = jnp.max(jnp.where(mx[None, None, :, :], t[:, :, None, :], neg),
                    axis=3)                        # (C, ph, pw)
        return jnp.where(v == neg, 0.0, v)

    bidx = rois[:, 0].astype(jnp.int32)
    out = jax.vmap(one)(x.astype(jnp.float32)[bidx], rois)
    ctx.set(node.outputs[0], out.astype(x.dtype))
