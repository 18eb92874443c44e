"""Long-tail ONNX ops: EyeLike, Hardmax, LpNormalization,
MeanVarianceNormalization, BitShift, Det, ReverseSequence, CenterCropPad,
Col2Im, RMSNormalization, Bernoulli, Multinomial. None exist in the
reference (Sources/Smelter/ONNXGraph.swift:110-155 covers ~30 vision ops);
included for full-coverage ONNX import.

All formulations keep static shapes (gather/scatter index matrices are
computed host-side) so XLA sees fixed-layout programs. Random ops derive
a deterministic PRNG key from the ONNX `seed` attribute — documented
deviation: ONNX leaves unseeded behavior implementation-defined, we pin
seed 0 so runs are reproducible under jit.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ir.errors import NotSupportedError
from ..ir.graph import Node
from ..utils import dtypes as dt
from .registry import Ctx, register


@register("EyeLike")
def eye_like(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    k = int(node.attr("k", 0))
    code = node.attr("dtype")
    dtype = dt.onnx_to_numpy_dtype(int(code)) if code is not None else x.dtype
    ctx.set(node.outputs[0], jnp.eye(x.shape[0], x.shape[1], k=k, dtype=dtype))


@register("Hardmax")
def hardmax(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    axis = int(node.attr("axis", -1 if ctx.opset >= 13 else 1))
    if axis < 0:
        axis += x.ndim
    idx = jnp.argmax(x, axis=axis)
    ctx.set(node.outputs[0],
            jax.nn.one_hot(idx, x.shape[axis], axis=axis, dtype=x.dtype))


@register("LpNormalization")
def lp_normalization(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    axis = int(node.attr("axis", -1))
    p = int(node.attr("p", 2))
    if p == 1:
        norm = jnp.sum(jnp.abs(x), axis=axis, keepdims=True)
    else:
        norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    ctx.set(node.outputs[0], x / norm)


@register("MeanVarianceNormalization")
def mvn(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    axes = tuple(node.attr("axes", [0, 2, 3]))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x), axis=axes, keepdims=True) - jnp.square(mean)
    ctx.set(node.outputs[0], (x - mean) / jnp.sqrt(var + 1e-12))


@register("BitShift", since=11)
def bit_shift(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    y = ctx.get(node.inputs[1])
    if node.attr("direction") == "LEFT":
        ctx.set(node.outputs[0], jnp.left_shift(x, y))
    else:
        ctx.set(node.outputs[0], jnp.right_shift(x, y))


@register("Det", since=11)
def det(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    ctx.set(node.outputs[0], jnp.linalg.det(x.astype(jnp.float32)).astype(x.dtype))


@register("ReverseSequence", since=10)
def reverse_sequence(ctx: Ctx, node: Node):
    """Reverse x[..., :lens[b], ...] along time_axis per batch. The gather
    index is computed in-graph (lens may be a runtime input), but shapes
    stay static: idx[t] = lens-1-t for t < lens else t."""
    x = ctx.get(node.inputs[0])
    lens = ctx.get(node.inputs[1]).astype(jnp.int32)
    batch_axis = int(node.attr("batch_axis", 1))
    time_axis = int(node.attr("time_axis", 0))
    t = jnp.arange(x.shape[time_axis], dtype=jnp.int32)
    # (B, T): reversed prefix, identity suffix
    idx = jnp.where(t[None, :] < lens[:, None], lens[:, None] - 1 - t[None, :],
                    t[None, :])
    # Broadcast idx to x's rank with batch/time in place.
    shape = [1] * x.ndim
    shape[batch_axis] = x.shape[batch_axis]
    shape[time_axis] = x.shape[time_axis]
    if batch_axis < time_axis:
        idx_full = idx.reshape(shape)
    else:
        idx_full = idx.T.reshape(shape)
    ctx.set(node.outputs[0],
            jnp.take_along_axis(x, jnp.broadcast_to(idx_full, x.shape),
                                axis=time_axis))


@register("CenterCropPad", since=18, static={1})
def center_crop_pad(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    target = [int(v) for v in np.asarray(ctx.static(node.inputs[1])).reshape(-1)]
    axes = node.attr("axes")
    if axes is None:
        axes = list(range(len(target)))
    axes = [a + x.ndim if a < 0 else a for a in axes]
    sl = [slice(None)] * x.ndim
    pad = [(0, 0)] * x.ndim
    for a, tgt in zip(axes, target):
        cur = x.shape[a]
        if tgt < cur:  # center crop
            off = (cur - tgt) // 2
            sl[a] = slice(off, off + tgt)
        elif tgt > cur:  # center pad, extra at the end
            amt = tgt - cur
            pad[a] = (amt // 2, amt - amt // 2)
    ctx.set(node.outputs[0], jnp.pad(x[tuple(sl)], pad))


@register("Col2Im", since=18, static={1, 2})
def col2im(ctx: Ctx, node: Node):
    """input (N, C*prod(block), L) -> (N, C, *image_shape) by scatter-adding
    each unfolded block back. The flat scatter index per (block-offset, L)
    pair is a host-side numpy computation; out-of-image (padding) positions
    scatter into a trash slot that is cropped away."""
    x = ctx.get(node.inputs[0])
    image_shape = [int(v) for v in np.asarray(ctx.static(node.inputs[1])).reshape(-1)]
    block = [int(v) for v in np.asarray(ctx.static(node.inputs[2])).reshape(-1)]
    nd = len(image_shape)
    dil = list(node.attr("dilations", [1] * nd))
    pads = list(node.attr("pads", [0] * (2 * nd)))
    strides = list(node.attr("strides", [1] * nd))

    n_, ckk, l_ = x.shape
    kk = int(np.prod(block))
    c = ckk // kk
    # output positions per spatial dim
    outs = [(image_shape[d] + pads[d] + pads[nd + d]
             - dil[d] * (block[d] - 1) - 1) // strides[d] + 1 for d in range(nd)]
    assert int(np.prod(outs)) == l_, (outs, l_)

    img_flat = int(np.prod(image_shape))
    # index[kk, L] -> flat image position (or img_flat for the trash slot)
    koff = np.stack(np.meshgrid(*[np.arange(b) for b in block], indexing="ij"),
                    axis=0).reshape(nd, kk)  # (nd, kk)
    lpos = np.stack(np.meshgrid(*[np.arange(o) for o in outs], indexing="ij"),
                    axis=0).reshape(nd, l_)  # (nd, L)
    coord = (lpos[:, None, :] * np.array(strides)[:, None, None]
             + koff[:, :, None] * np.array(dil)[:, None, None]
             - np.array(pads[:nd])[:, None, None])  # (nd, kk, L)
    valid = np.all((coord >= 0) & (coord < np.array(image_shape)[:, None, None]),
                   axis=0)
    flat = np.zeros((kk, l_), np.int32)
    mult = 1
    for d in range(nd - 1, -1, -1):
        flat += np.clip(coord[d], 0, image_shape[d] - 1) * mult
        mult *= image_shape[d]
    flat = np.where(valid, flat, img_flat)  # trash slot

    xr = x.reshape(n_, c, kk * l_)
    out = jnp.zeros((n_, c, img_flat + 1), x.dtype)
    out = out.at[:, :, jnp.asarray(flat.reshape(-1))].add(xr)
    ctx.set(node.outputs[0], out[:, :, :img_flat].reshape(n_, c, *image_shape))


@register("RMSNormalization", since=23)
def rms_normalization(ctx: Ctx, node: Node):
    """y = x / sqrt(mean(x^2 over dims[axis:]) + eps) * scale — the LLM
    norm (LLaMA/Mistral family). Stats in f32 regardless of compute dtype
    (stash_type semantics)."""
    x = ctx.get(node.inputs[0])
    scale = ctx.get(node.inputs[1])
    axis = int(node.attr("axis", -1))
    if axis < 0:
        axis += x.ndim
    eps = float(node.attr("epsilon", 1e-5))
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=tuple(range(axis, x.ndim)), keepdims=True)
    y = xf * jax.lax.rsqrt(ms + eps)
    ctx.set(node.outputs[0], (y * scale.astype(jnp.float32)).astype(x.dtype))


@register("Bernoulli", since=15)
def bernoulli(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    seed = node.attr("seed")
    key = jax.random.PRNGKey(np.float32(seed).view(np.int32) if seed is not None else 0)
    code = node.attr("dtype")
    dtype = dt.onnx_to_numpy_dtype(int(code)) if code is not None else x.dtype
    ctx.set(node.outputs[0],
            jax.random.bernoulli(key, x.astype(jnp.float32)).astype(dtype))


@register("Multinomial", since=7)
def multinomial(ctx: Ctx, node: Node):
    """Input rows are unnormalized log-probabilities (ONNX spec) — exactly
    jax.random.categorical's logits contract."""
    x = ctx.get(node.inputs[0])
    sample_size = int(node.attr("sample_size", 1))
    seed = node.attr("seed")
    key = jax.random.PRNGKey(np.float32(seed).view(np.int32) if seed is not None else 0)
    code = int(node.attr("dtype", dt.INT32))
    samples = jax.random.categorical(
        key, x.astype(jnp.float32), axis=-1,
        shape=(sample_size, x.shape[0])).T  # (batch, sample_size)
    ctx.set(node.outputs[0], samples.astype(dt.onnx_to_numpy_dtype(code)))


def _seed_key(node: Node):
    seed = node.attr("seed")
    return jax.random.PRNGKey(
        np.float32(seed).view(np.int32) if seed is not None else 0)


@register("RandomNormal")
def random_normal(ctx: Ctx, node: Node):
    shape = tuple(int(s) for s in node.attr("shape"))
    dtype = dt.onnx_to_numpy_dtype(int(node.attr("dtype", dt.FLOAT)))
    mean = float(node.attr("mean", 0.0))
    scale = float(node.attr("scale", 1.0))
    y = jax.random.normal(_seed_key(node), shape) * scale + mean
    ctx.set(node.outputs[0], y.astype(dtype))


@register("RandomUniform")
def random_uniform(ctx: Ctx, node: Node):
    shape = tuple(int(s) for s in node.attr("shape"))
    dtype = dt.onnx_to_numpy_dtype(int(node.attr("dtype", dt.FLOAT)))
    low = float(node.attr("low", 0.0))
    high = float(node.attr("high", 1.0))
    y = jax.random.uniform(_seed_key(node), shape, minval=low, maxval=high)
    ctx.set(node.outputs[0], y.astype(dtype))


@register("RandomNormalLike")
def random_normal_like(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    code = node.attr("dtype")
    dtype = dt.onnx_to_numpy_dtype(int(code)) if code is not None else x.dtype
    mean = float(node.attr("mean", 0.0))
    scale = float(node.attr("scale", 1.0))
    y = jax.random.normal(_seed_key(node), x.shape) * scale + mean
    ctx.set(node.outputs[0], y.astype(dtype))


@register("RandomUniformLike")
def random_uniform_like(ctx: Ctx, node: Node):
    x = ctx.get(node.inputs[0])
    code = node.attr("dtype")
    dtype = dt.onnx_to_numpy_dtype(int(code)) if code is not None else x.dtype
    low = float(node.attr("low", 0.0))
    high = float(node.attr("high", 1.0))
    y = jax.random.uniform(_seed_key(node), x.shape, minval=low, maxval=high)
    ctx.set(node.outputs[0], y.astype(dtype))


# -- loss ops (opset 12+; inference graphs exported with eval metrics) -----


def _nll_core(ctx: Ctx, node: Node, log_prob, target, weight):
    """Shared NLLLoss math: log_prob (N,C,d...), target (N,d...) int."""
    ignore = node.attr("ignore_index")
    reduction = node.attr("reduction", "mean")
    if isinstance(reduction, bytes):
        reduction = reduction.decode()
    c = log_prob.shape[1]
    tgt = target.astype(jnp.int32)
    valid = jnp.ones(tgt.shape, bool) if ignore is None \
        else tgt != np.int32(ignore)
    tgt_safe = jnp.where(valid, tgt, 0)
    gathered = jnp.take_along_axis(
        log_prob, tgt_safe[:, None].astype(jnp.int32), axis=1)[:, 0]
    w = (weight.astype(jnp.float32)[tgt_safe]
         if weight is not None else jnp.ones_like(gathered, jnp.float32))
    w = jnp.where(valid, w, 0.0)
    loss = -gathered.astype(jnp.float32) * w
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(w), 1e-12)  # mean


@register("NegativeLogLikelihoodLoss", since=12)
def nll_loss(ctx: Ctx, node: Node):
    """input holds log-probabilities (torch NLLLoss contract); weighted
    mean divides by the sum of selected weights, matching torch."""
    log_prob = ctx.get(node.inputs[0])
    target = ctx.get(node.inputs[1])
    weight = (ctx.get(node.inputs[2])
              if len(node.inputs) > 2 and node.inputs[2] else None)
    ctx.set(node.outputs[0],
            _nll_core(ctx, node, log_prob, target, weight).astype(log_prob.dtype))


@register("SoftmaxCrossEntropyLoss", since=12)
def softmax_cross_entropy_loss(ctx: Ctx, node: Node):
    scores = ctx.get(node.inputs[0])
    target = ctx.get(node.inputs[1])
    weight = (ctx.get(node.inputs[2])
              if len(node.inputs) > 2 and node.inputs[2] else None)
    log_prob = jax.nn.log_softmax(scores.astype(jnp.float32), axis=1)
    ctx.set(node.outputs[0],
            _nll_core(ctx, node, log_prob, target, weight).astype(scores.dtype))
    if len(node.outputs) > 1 and node.outputs[1]:
        ctx.set(node.outputs[1], log_prob.astype(scores.dtype))


@register("TfIdfVectorizer", since=9)
def tfidf_vectorizer(ctx: Ctx, node: Node):
    """N-gram counting over integer token ids (the classic-ML text op;
    string tensors are out of scope for this engine). The ngram pool,
    gram-length sections, output columns, and weights are all attributes,
    so the matcher is built host-side: for each pooled ngram and each skip
    distance, a fixed set of strided position comparisons — static shapes
    throughout. Matches onnxruntime's counting: every (start, skip)
    combination is a distinct occurrence; skips apply only to n>=2 grams.

    Modes: TF = raw counts; IDF = indicator * weight; TFIDF = count *
    weight (weights default to 1)."""
    x = ctx.get(node.inputs[0])
    mode = node.attr("mode")
    if isinstance(mode, bytes):
        mode = mode.decode()
    min_n = int(node.attr("min_gram_length"))
    max_n = int(node.attr("max_gram_length"))
    max_skip = int(node.attr("max_skip_count", 0))
    counts = [int(c) for c in node.attr("ngram_counts")]
    indexes = [int(i) for i in node.attr("ngram_indexes")]
    pool = node.attr("pool_int64s")
    if pool is None:
        raise NotSupportedError("TfIdfVectorizer pool_strings (string "
                                "tensors are not supported; use int ids)")
    pool = [int(v) for v in pool]
    weights = node.attr("weights")

    # decode the pool: section k (0-based) holds (k+1)-grams starting at
    # flat offset counts[k]
    ngrams = []  # (output_column, tuple(ids))
    gi = 0
    for sec in range(len(counts)):
        n = sec + 1
        start = counts[sec]
        end = counts[sec + 1] if sec + 1 < len(counts) else len(pool)
        for off in range(start, end, n):
            ngrams.append((indexes[gi], tuple(pool[off:off + n])))
            gi += 1

    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    N, C = x.shape
    out_dim = max(indexes) + 1
    out = jnp.zeros((N, out_dim), jnp.float32)
    for col, gram in ngrams:
        n = len(gram)
        if not min_n <= n <= max_n:
            continue
        skips = range(max_skip + 1) if n >= 2 else (0,)
        total = jnp.zeros((N,), jnp.float32)
        for s in skips:
            step = s + 1
            span = (n - 1) * step + 1
            if span > C:
                continue
            m = jnp.ones((N, C - span + 1), bool)
            for j, tok in enumerate(gram):
                m = m & (x[:, j * step:j * step + C - span + 1] == tok)
            total = total + m.sum(axis=1).astype(jnp.float32)
        out = out.at[:, col].add(total)
    if mode in ("IDF", "TFIDF"):
        w = jnp.ones((out_dim,), jnp.float32)
        if weights is not None:
            w = jnp.zeros((out_dim,), jnp.float32).at[
                jnp.asarray(indexes)].set(jnp.asarray(weights, jnp.float32))
        out = (out > 0).astype(jnp.float32) * w if mode == "IDF" else out * w
    ctx.set(node.outputs[0], out[0] if squeeze else out)


@register("OptimizationBarrier")
def optimization_barrier(ctx: Ctx, node: Node):
    """Identity that XLA may not fuse across (passes/dw_barrier.py
    inserts it at measured-pathological fusion seams; probe86)."""
    import jax

    ctx.set(node.outputs[0],
            jax.lax.optimization_barrier(ctx.get(node.inputs[0])))
