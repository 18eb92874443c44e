"""Signal-processing ops (opset 17): HannWindow/HammingWindow/BlackmanWindow,
DFT, STFT, MelWeightMatrix — the audio-frontend set (log-mel spectrograms for
whisper-style speech models). Absent from the reference (vision-only op list,
Sources/Smelter/ONNXGraph.swift:110-155); included for full ONNX coverage.

TPU-first formulation: the DFT is expressed as a real matmul against a
static (N, 2M) basis matrix, and STFT as frame-gather + window + that same
matmul — both land on the MXU instead of scalar FFT butterflies, which is
the right trade on this hardware for the short frame lengths (<=1024)
audio frontends use. Complex values use the ONNX trailing-dim-2 layout.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ir.graph import Node
from ..utils import dtypes as dt
from .registry import Ctx, register


def _window(ctx: Ctx, node: Node, a0: float, a1: float, a2: float) -> None:
    size = int(np.asarray(ctx.static(node.inputs[0])).reshape(-1)[0])
    periodic = int(node.attr("periodic", 1))
    n_ = size if periodic else size - 1
    n = np.arange(size, dtype=np.float64)
    w = a0 - a1 * np.cos(2 * np.pi * n / n_) + a2 * np.cos(4 * np.pi * n / n_)
    code = int(node.attr("output_datatype", dt.FLOAT))
    ctx.set_static(node.outputs[0], w.astype(dt.onnx_to_numpy_dtype(code)))


@register("HannWindow", since=17, static={0})
def hann_window(ctx: Ctx, node: Node):
    _window(ctx, node, 0.5, 0.5, 0.0)


@register("HammingWindow", since=17, static={0})
def hamming_window(ctx: Ctx, node: Node):
    _window(ctx, node, 25.0 / 46.0, 1.0 - 25.0 / 46.0, 0.0)


@register("BlackmanWindow", since=17, static={0})
def blackman_window(ctx: Ctx, node: Node):
    _window(ctx, node, 0.42, 0.5, 0.08)


def _dft_basis(n: int, n_out: int, inverse: bool) -> np.ndarray:
    """Real basis B with shape (n, n_out, 2): B[k,m,0]=cos, B[k,m,1]=∓sin so
    that for real x, (x @ B.reshape(n,-1)).reshape(..., n_out, 2) is the DFT
    (or unscaled inverse DFT) — one bf16-able matmul on the MXU."""
    k = np.arange(n)[:, None]
    m = np.arange(n_out)[None, :]
    ang = 2 * np.pi * k * m / n
    sgn = 1.0 if inverse else -1.0
    return np.stack([np.cos(ang), sgn * np.sin(ang)], axis=-1)


def _apply_dft(x: jnp.ndarray, axis: int, n: int, *, inverse: bool,
               onesided: bool) -> jnp.ndarray:
    """x: (..., 2) complex-as-pairs (imag slice may be zeros), DFT along
    `axis` (not the trailing pair axis). Returns same layout."""
    n_out = n // 2 + 1 if onesided else n
    basis = _dft_basis(n, n_out, inverse)  # (n, n_out, 2)
    bc, bs = jnp.asarray(basis[..., 0], x.dtype), jnp.asarray(basis[..., 1], x.dtype)
    xm = jnp.moveaxis(x, axis, -2)  # (..., n, 2)
    re, im = xm[..., 0], xm[..., 1]
    # (a+bi)(c+di): real = a·cos − b·(∓sin)… expressed with the signed basis:
    out_re = jnp.tensordot(re, bc, axes=[[-1], [0]]) - jnp.tensordot(im, bs, axes=[[-1], [0]])
    out_im = jnp.tensordot(re, bs, axes=[[-1], [0]]) + jnp.tensordot(im, bc, axes=[[-1], [0]])
    out = jnp.stack([out_re, out_im], axis=-1)  # (..., n_out, 2)
    if inverse:
        out = out / n
    return jnp.moveaxis(out, -2, axis)


def _as_complex_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """ONNX real signals carry trailing dim 1; widen to the (re, im) pair."""
    if x.shape[-1] == 1:
        return jnp.concatenate([x, jnp.zeros_like(x)], axis=-1)
    return x


@register("DFT", since=17, static={1, 2})
def dft(ctx: Ctx, node: Node):
    x = _as_complex_pairs(ctx.get(node.inputs[0]))
    # opset 17: axis attr (default 1); opset 20: axis is input 2 (default -2).
    if len(node.inputs) > 2 and node.inputs[2]:
        axis = int(np.asarray(ctx.static(node.inputs[2])).reshape(-1)[0])
    else:
        axis = int(node.attr("axis", 1))
    if axis < 0:
        axis += x.ndim
    inverse = bool(node.attr("inverse", 0))
    onesided = bool(node.attr("onesided", 0))
    dft_length = None
    if len(node.inputs) > 1 and node.inputs[1]:
        raw = np.asarray(ctx.static(node.inputs[1])).reshape(-1)
        if raw.size:  # empty tensor == absent optional input
            dft_length = int(raw[0])
    n = x.shape[axis]
    if dft_length is not None and dft_length != n:
        if dft_length < n:  # truncate
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(0, dft_length)
            x = x[tuple(sl)]
        else:  # zero-pad
            pad = [(0, 0)] * x.ndim
            pad[axis] = (0, dft_length - n)
            x = jnp.pad(x, pad)
        n = dft_length
    ctx.set(node.outputs[0],
            _apply_dft(x, axis, n, inverse=inverse, onesided=onesided))


@register("STFT", since=17, static={1, 2, 3})
def stft(ctx: Ctx, node: Node):
    """signal (B, L) or (B, L, 1|2); frame_step scalar; optional window
    (frame_length,) and frame_length scalar. Output (B, frames, bins, 2).
    Frames are gathered with a static (frames, frame_length) index matrix
    then pushed through the DFT basis matmul."""
    sig = ctx.get(node.inputs[0])
    if sig.ndim == 2:
        sig = sig[..., None]
    sig = _as_complex_pairs(sig)  # (B, L, 2)
    step = int(np.asarray(ctx.static(node.inputs[1])).reshape(-1)[0])
    window = None
    if len(node.inputs) > 2 and node.inputs[2]:
        w_static = ctx.static(node.inputs[2], required=False)
        window = (jnp.asarray(w_static) if w_static is not None
                  else ctx.get(node.inputs[2]))
        if window.shape[0] == 0:  # empty tensor == absent optional input
            window = None
    if len(node.inputs) > 3 and node.inputs[3]:
        frame_length = int(np.asarray(ctx.static(node.inputs[3])).reshape(-1)[0])
    elif window is not None:
        frame_length = int(window.shape[0])
    else:
        frame_length = int(sig.shape[1])
    onesided = bool(node.attr("onesided", 1))

    length = int(sig.shape[1])
    frames = (length - frame_length) // step + 1
    idx = (np.arange(frames)[:, None] * step
           + np.arange(frame_length)[None, :])  # (frames, frame_length)
    framed = jnp.take(sig, jnp.asarray(idx), axis=1)  # (B, frames, fl, 2)
    if window is not None:
        framed = framed * window.astype(framed.dtype)[None, None, :, None]
    ctx.set(node.outputs[0],
            _apply_dft(framed, 2, frame_length, inverse=False, onesided=onesided))


@register("MelWeightMatrix", since=17, static={0, 1, 2, 3, 4})
def mel_weight_matrix(ctx: Ctx, node: Node):
    """All five inputs are static scalars; the (num_spectrogram_bins,
    num_mel_bins) triangular filterbank is computed host-side once."""
    vals = [np.asarray(ctx.static(node.inputs[i])).reshape(-1)[0] for i in range(5)]
    num_mel, dft_length = int(vals[0]), int(vals[1])
    sample_rate = int(vals[2])
    lo_hz, hi_hz = float(vals[3]), float(vals[4])
    num_spec_bins = dft_length // 2 + 1

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)

    mel_edges = np.linspace(hz_to_mel(lo_hz), hz_to_mel(hi_hz), num_mel + 2)
    hz_edges = mel_to_hz(mel_edges)
    # center frequency of each spectrogram bin
    bin_hz = np.arange(num_spec_bins, dtype=np.float64) * sample_rate / dft_length
    lower = hz_edges[:-2][None, :]
    center = hz_edges[1:-1][None, :]
    upper = hz_edges[2:][None, :]
    f = bin_hz[:, None]
    up = (f - lower) / np.maximum(center - lower, 1e-12)
    down = (upper - f) / np.maximum(upper - center, 1e-12)
    w = np.clip(np.minimum(up, down), 0.0, 1.0)
    w[f.reshape(-1) < lower.min(), :] = 0.0
    code = int(node.attr("output_datatype", dt.FLOAT))
    ctx.set_static(node.outputs[0], w.astype(dt.onnx_to_numpy_dtype(code)))
