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
