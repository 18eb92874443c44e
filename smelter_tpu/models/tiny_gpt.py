"""Decoder-only transformer with an explicit static KV cache, built directly
as an ONNX graph (GraphBuilder), plus a full-sequence (no-cache) variant.

Demonstrates the LLM-serving pattern on this engine: the cache step graph
takes (token, pos, per-layer K/V caches) and returns (logits, updated
caches) with ALL static shapes — cache writes are ScatterND at a traced
position, attention masks beyond `pos` with -inf over the fixed max_len.
`runtime/generate.py` drives it. The reference has no attention at all
(SURVEY.md §5.7); this extends the framework to the decode workloads TPU
serving actually runs.
"""

from __future__ import annotations

import numpy as np

from ..ir.build import GraphBuilder
from ..ir.graph import Graph
from ..utils import dtypes as dt


def _rng_weights(rng, *shape, scale=None):
    scale = scale if scale is not None else 1.0 / np.sqrt(shape[0])
    return (rng.standard_normal(shape) * scale).astype(np.float32)


def build_decode_step(vocab: int = 128, dim: int = 64, heads: int = 4,
                      layers: int = 2, max_len: int = 32, seed: int = 0):
    """Graph: (token (1,), pos (1,), k_i (max_len, dim), v_i (max_len, dim))
    -> (logits (1, vocab), k_i_new, v_i_new). Batch 1, head split internal.

    Also returns the weight dict used, so build_full() can share weights."""
    rng = np.random.default_rng(seed)
    hd = dim // heads
    b = GraphBuilder("tiny_gpt_step", opset=17)
    token = b.input("token", (1,), dt.INT64)
    pos = b.input("pos", (1,), dt.INT64)

    weights = {
        "wte": _rng_weights(rng, vocab, dim, scale=0.02),
        "wpe": _rng_weights(rng, max_len, dim, scale=0.02),
    }
    x = b.node("Gather", [b.init(weights["wte"], "wte"), token], axis=0)  # (1, dim)
    pe = b.node("Gather", [b.init(weights["wpe"], "wpe"), pos], axis=0)
    x = b.node("Add", [x, pe])

    cache_outs = []
    for li in range(layers):
        k_cache = b.input(f"k_cache_{li}", (max_len, dim))
        v_cache = b.input(f"v_cache_{li}", (max_len, dim))
        for nm, shape in [(f"ln1_{li}", (dim,)), (f"ln2_{li}", (dim,))]:
            weights.setdefault(nm + "_g", np.ones(dim, np.float32))
            weights.setdefault(nm + "_b", np.zeros(dim, np.float32))
        weights[f"wqkv_{li}"] = _rng_weights(rng, dim, 3 * dim)
        weights[f"wo_{li}"] = _rng_weights(rng, dim, dim)
        weights[f"w1_{li}"] = _rng_weights(rng, dim, 4 * dim)
        weights[f"w2_{li}"] = _rng_weights(rng, 4 * dim, dim)

        h = b.node("LayerNormalization",
                   [x, b.init(weights[f"ln1_{li}_g"]), b.init(weights[f"ln1_{li}_b"])],
                   axis=-1, epsilon=1e-5)
        qkv = b.node("MatMul", [h, b.init(weights[f"wqkv_{li}"])])  # (1, 3dim)
        q = b.node("Slice", [qkv, b.init(np.array([0], np.int64)),
                             b.init(np.array([dim], np.int64)),
                             b.init(np.array([1], np.int64))])
        k_new = b.node("Slice", [qkv, b.init(np.array([dim], np.int64)),
                                 b.init(np.array([2 * dim], np.int64)),
                                 b.init(np.array([1], np.int64))])
        v_new = b.node("Slice", [qkv, b.init(np.array([2 * dim], np.int64)),
                                 b.init(np.array([3 * dim], np.int64)),
                                 b.init(np.array([1], np.int64))])
        # write K/V rows at `pos` (traced index -> ScatterND)
        idx = b.node("Reshape", [pos, b.init(np.array([1, 1], np.int64))])
        k_upd = b.node("ScatterND", [k_cache, idx, k_new])
        v_upd = b.node("ScatterND", [v_cache, idx, v_new])
        cache_outs += [(f"k_out_{li}", k_upd), (f"v_out_{li}", v_upd)]

        # attention of the single query over the cache, masked beyond pos
        qh = b.node("Reshape", [q, b.init(np.array([heads, 1, hd], np.int64))])
        kh = b.node("Reshape", [k_upd, b.init(np.array([max_len, heads, hd], np.int64))])
        kh = b.node("Transpose", [kh], perm=[1, 2, 0])        # (H, hd, max_len)
        vh = b.node("Reshape", [v_upd, b.init(np.array([max_len, heads, hd], np.int64))])
        vh = b.node("Transpose", [vh], perm=[1, 0, 2])        # (H, max_len, hd)
        scores = b.node("MatMul", [qh, kh])                   # (H, 1, max_len)
        scores = b.node("Mul", [scores, b.init(np.float32(hd ** -0.5))])
        # additive mask: positions > pos get -1e9
        arange = b.init(np.arange(max_len, dtype=np.int64), "arange")
        valid = b.node("LessOrEqual", [arange, pos])          # (max_len,) bool
        mask = b.node("Where", [valid, b.init(np.float32(0.0)),
                                b.init(np.float32(-1e9))])
        scores = b.node("Add", [scores, mask])
        attn = b.node("Softmax", [scores], axis=-1)
        ctxv = b.node("MatMul", [attn, vh])                   # (H, 1, hd)
        ctxv = b.node("Reshape", [ctxv, b.init(np.array([1, dim], np.int64))])
        proj = b.node("MatMul", [ctxv, b.init(weights[f"wo_{li}"])])
        x = b.node("Add", [x, proj])

        h2 = b.node("LayerNormalization",
                    [x, b.init(weights[f"ln2_{li}_g"]), b.init(weights[f"ln2_{li}_b"])],
                    axis=-1, epsilon=1e-5)
        m1 = b.node("MatMul", [h2, b.init(weights[f"w1_{li}"])])
        m1 = b.node("Gelu", [m1])
        m2 = b.node("MatMul", [m1, b.init(weights[f"w2_{li}"])])
        x = b.node("Add", [x, m2])

    weights["w_head"] = _rng_weights(rng, dim, vocab)
    logits = b.node("MatMul", [x, b.init(weights["w_head"], "w_head")])
    outs = [logits] + [name for name, _ in cache_outs]
    # rename cache outputs to stable names
    from ._util import rename_edges

    rename_edges(b.graph, cache_outs)
    g2 = b.finish([logits] + [n for n, _ in cache_outs])
    return g2, weights


def build_full(weights: dict, seq_len: int, vocab: int = 128, dim: int = 64,
               heads: int = 4, layers: int = 2):
    """No-cache full-sequence forward sharing `weights` (golden reference
    for incremental decode): tokens (T,) -> logits (T, vocab), causal."""
    hd = dim // heads
    b = GraphBuilder("tiny_gpt_full", opset=17)
    tokens = b.input("tokens", (seq_len,), dt.INT64)
    x = b.node("Gather", [b.init(weights["wte"]), tokens], axis=0)  # (T, dim)
    pe = b.init(weights["wpe"][:seq_len].copy())
    x = b.node("Add", [x, pe])
    # causal additive mask (T, T)
    causal = np.triu(np.full((seq_len, seq_len), -1e9, np.float32), 1)
    for li in range(layers):
        h = b.node("LayerNormalization",
                   [x, b.init(weights[f"ln1_{li}_g"]), b.init(weights[f"ln1_{li}_b"])],
                   axis=-1, epsilon=1e-5)
        qkv = b.node("MatMul", [h, b.init(weights[f"wqkv_{li}"])])  # (T, 3dim)
        parts = b.node("Split", [qkv], outputs=3, axis=1)
        q, k, v = parts
        def split_heads(t, trans):
            r = b.node("Reshape", [t, b.init(np.array([seq_len, heads, hd], np.int64))])
            return b.node("Transpose", [r], perm=trans)
        qh = split_heads(q, [1, 0, 2])       # (H, T, hd)
        kh = split_heads(k, [1, 2, 0])       # (H, hd, T)
        vh = split_heads(v, [1, 0, 2])       # (H, T, hd)
        scores = b.node("MatMul", [qh, kh])  # (H, T, T)
        scores = b.node("Mul", [scores, b.init(np.float32(hd ** -0.5))])
        scores = b.node("Add", [scores, b.init(causal)])
        attn = b.node("Softmax", [scores], axis=-1)
        ctxv = b.node("MatMul", [attn, vh])  # (H, T, hd)
        ctxv = b.node("Transpose", [ctxv], perm=[1, 0, 2])
        ctxv = b.node("Reshape", [ctxv, b.init(np.array([seq_len, dim], np.int64))])
        proj = b.node("MatMul", [ctxv, b.init(weights[f"wo_{li}"])])
        x = b.node("Add", [x, proj])
        h2 = b.node("LayerNormalization",
                    [x, b.init(weights[f"ln2_{li}_g"]), b.init(weights[f"ln2_{li}_b"])],
                    axis=-1, epsilon=1e-5)
        m1 = b.node("MatMul", [h2, b.init(weights[f"w1_{li}"])])
        m1 = b.node("Gelu", [m1])
        m2 = b.node("MatMul", [m1, b.init(weights[f"w2_{li}"])])
        x = b.node("Add", [x, m2])
    logits = b.node("MatMul", [x, b.init(weights["w_head"])])
    return b.finish([logits])
