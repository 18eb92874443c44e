"""Static-shape image resize with exact ONNX coordinate-transform semantics.

The reference lowers Upsample to MPS bilinear/nearest nodes with an
alignCorners knob (reference: Sources/Smelter/Converters.swift:478-552,
ONNXGraph.swift:118-120). XLA has jax.image.resize but it hardcodes the
half-pixel convention; ONNX needs several conventions. Because all shapes
are static at trace time, we precompute gather indices and lerp weights in
numpy and emit pure gathers + fused multiply-adds — this lowers to cheap
vectorized HBM reads on TPU with zero dynamic indexing.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ir.errors import NotSupportedError


def _src_coords(out_size: int, in_size: int, scale: float, mode: str,
                roi: tuple[float, float] | None = None) -> np.ndarray:
    """Map output pixel index -> (fractional) source coordinate."""
    x = np.arange(out_size, dtype=np.float64)
    if mode == "half_pixel":
        return (x + 0.5) / scale - 0.5
    if mode == "pytorch_half_pixel":
        if out_size > 1:
            return (x + 0.5) / scale - 0.5
        return np.zeros_like(x)
    if mode == "align_corners":
        if out_size == 1:
            return np.zeros_like(x)
        return x * (in_size - 1) / (out_size - 1)
    if mode == "asymmetric":
        return x / scale
    if mode == "tf_crop_and_resize":
        start, end = roi if roi is not None else (0.0, 1.0)
        if out_size > 1:
            return (start * (in_size - 1)
                    + x * (end - start) * (in_size - 1) / (out_size - 1))
        return np.full(out_size, 0.5 * (start + end) * (in_size - 1))
    raise NotSupportedError(f"coordinate_transformation_mode {mode!r}")


def _nearest_idx(coords: np.ndarray, in_size: int, nearest_mode: str) -> np.ndarray:
    if nearest_mode == "floor":
        idx = np.floor(coords)
    elif nearest_mode == "ceil":
        idx = np.ceil(coords)
    elif nearest_mode == "round_prefer_floor":
        idx = np.where(coords - np.floor(coords) == 0.5, np.floor(coords), np.round(coords))
    else:  # round_prefer_ceil (ONNX default)
        idx = np.floor(coords + 0.5)
    return np.clip(idx, 0, in_size - 1).astype(np.int32)


# Per-axis resize is a linear map out = M @ x with M (out_s, in_s) holding
# <=4 nonzeros per row. Below this input size we materialize M densely and
# contract on the MXU instead of gathering: TPU probes measured the gather
# forms at 93-270 GB/s of the 819 GB/s roofline, while the matmul form is
# a few-GFLOP dot (e.g. 2x-upsampling 16x64^2x128 costs ~2 GFLOP ~ 40 us).
# The FLOP cost grows with in_s; past ~1k rows the gather wins again.
_MATMUL_MAX_IN = 512


def _interp_matrix(coords: np.ndarray, in_s: int, out_s: int, mode: str,
                   nearest_mode: str, cubic_a: float) -> np.ndarray:
    """Dense (out_s, in_s) interpolation matrix for one spatial axis."""
    m = np.zeros((out_s, in_s), np.float32)
    r = np.arange(out_s)
    if mode == "nearest":
        m[r, _nearest_idx(coords, in_s, nearest_mode)] = 1.0
    elif mode == "linear":
        lo = np.clip(np.floor(coords), 0, in_s - 1).astype(np.int64)
        hi = np.clip(lo + 1, 0, in_s - 1)
        w = np.clip(coords - lo, 0.0, 1.0).astype(np.float32)
        np.add.at(m, (r, lo), 1.0 - w)
        np.add.at(m, (r, hi), w)
    else:  # cubic
        base = np.floor(coords).astype(np.int64)
        t = (coords - base).astype(np.float64)
        weights = _cubic_weights(t, cubic_a).astype(np.float32)
        for tap in range(4):
            idx = np.clip(base + tap - 1, 0, in_s - 1)
            np.add.at(m, (r, idx), weights[:, tap])
    return m


def _cubic_weights(t: np.ndarray, a: float) -> np.ndarray:
    """Keys cubic kernel weights for the 4 taps at offsets {-1,0,1,2} given
    fractional positions t in [0,1). Returns (len(t), 4)."""
    def w(d):
        d = np.abs(d)
        return np.where(
            d <= 1,
            ((a + 2) * d - (a + 3)) * d * d + 1,
            np.where(d < 2, ((a * d - 5 * a) * d + 8 * a) * d - 4 * a, 0.0),
        )

    return np.stack([w(t + 1), w(t), w(t - 1), w(t - 2)], axis=-1)


def resize_spatial(
    x,
    out_sizes: tuple[int, ...],
    *,
    mode: str = "nearest",
    coord_mode: str = "half_pixel",
    nearest_mode: str = "round_prefer_floor",
    spatial_start: int = 2,
    cubic_a: float = -0.75,
    roi: list[tuple[float, float]] | None = None,
    extrapolation_value: float = 0.0,
    spatial_axes: tuple[int, ...] | None = None,
):
    """Resize spatial dims of `x` (axes [spatial_start, spatial_start+len(
    out_sizes))) to `out_sizes`. mode: nearest | linear | cubic (Keys kernel,
    ONNX cubic_coeff_a default -0.75, edge-clamped taps). roi (normalized
    per-dim (start, end)) drives tf_crop_and_resize; coordinates mapping
    outside the input produce `extrapolation_value`."""
    # spatial dims are axes [spatial_start, spatial_start + len(out_sizes))
    # (NHWC keeps channels after the spatial block), or the explicit
    # `spatial_axes` (NHCW pixel-conv regions interleave C between H and W)
    if spatial_axes is None:
        spatial_axes = tuple(range(spatial_start,
                                   spatial_start + len(out_sizes)))
    in_sizes = tuple(x.shape[a] for a in spatial_axes)
    assert len(in_sizes) == len(out_sizes)
    out = x
    crop = coord_mode == "tf_crop_and_resize"
    oob_masks: list[tuple[int, np.ndarray]] = []
    for d, (in_s, out_s) in enumerate(zip(in_sizes, out_sizes)):
        axis = spatial_axes[d]
        roi_d = roi[d] if roi is not None else None
        if in_s == out_s and not (crop and roi_d not in (None, (0.0, 1.0))):
            continue
        scale = out_s / in_s
        coords = _src_coords(out_s, in_s, scale, coord_mode, roi_d)
        if crop:
            oob = (coords < 0) | (coords > in_s - 1)
            if oob.any():
                oob_masks.append((axis, oob))
            coords = np.clip(coords, 0, in_s - 1)
        # Formulation choice, measured on v5e (experiments/tpu_probe20.py):
        # - linear/cubic: contract a dense (out,in) interp matrix on the
        #   MXU — 1.2-2.6x over the gather-lerp forms at decoder shapes.
        #   (Not for nearest: a one-hot matmul blocks XLA from fusing the
        #   upsample into its consumer and measured 0.73-0.86x there.)
        # - nearest with an exact integer repeat pattern: broadcast+reshape,
        #   which XLA fuses straight into consumers (probe18/20).
        if (not crop and in_s <= _MATMUL_MAX_IN
                and mode in ("linear", "cubic")
                and jnp.issubdtype(out.dtype, jnp.floating)):
            m = _interp_matrix(coords, in_s, out_s, mode, nearest_mode,
                               cubic_a)
            mj = jnp.asarray(m, out.dtype)
            out = jnp.moveaxis(jnp.tensordot(mj, out, axes=(1, axis)),
                               0, axis)
            continue
        if mode == "nearest":
            idx = _nearest_idx(coords, in_s, nearest_mode)
            k, rem = divmod(out_s, in_s)
            if rem == 0 and k > 1 and np.array_equal(
                    idx, np.repeat(np.arange(in_s), k)):
                shape = list(out.shape)
                expanded = jnp.expand_dims(out, axis + 1)
                shape_b = shape[:axis + 1] + [k] + shape[axis + 1:]
                shape[axis] = out_s
                out = jnp.broadcast_to(expanded, shape_b).reshape(shape)
                continue
            out = jnp.take(out, jnp.asarray(idx), axis=axis)
        elif mode == "linear":
            lo = np.clip(np.floor(coords), 0, in_s - 1).astype(np.int32)
            hi = np.clip(lo + 1, 0, in_s - 1)
            w = np.clip(coords - lo, 0.0, 1.0).astype(np.float32)
            shape = [1] * out.ndim
            shape[axis] = out_s
            wj = jnp.asarray(w.reshape(shape), dtype=out.dtype)
            a = jnp.take(out, jnp.asarray(lo), axis=axis)
            b = jnp.take(out, jnp.asarray(hi), axis=axis)
            out = a + (b - a) * wj
        elif mode == "cubic":
            base = np.floor(coords).astype(np.int64)
            t = (coords - base).astype(np.float64)
            weights = _cubic_weights(t, cubic_a).astype(np.float32)  # (out, 4)
            acc = None
            for tap in range(4):
                idx = np.clip(base + tap - 1, 0, in_s - 1).astype(np.int32)
                shape = [1] * out.ndim
                shape[axis] = out_s
                wj = jnp.asarray(weights[:, tap].reshape(shape), dtype=out.dtype)
                term = jnp.take(out, jnp.asarray(idx), axis=axis) * wj
                acc = term if acc is None else acc + term
            out = acc
        else:
            raise NotSupportedError(f"resize mode {mode!r}")
    for axis, oob in oob_masks:
        shape = [1] * out.ndim
        shape[axis] = len(oob)
        out = jnp.where(jnp.asarray(oob.reshape(shape)),
                        jnp.asarray(extrapolation_value, out.dtype), out)
    return out
