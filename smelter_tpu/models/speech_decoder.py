"""Whisper-style speech decoder: causal self-attention with a static KV
cache + cross-attention over the encoder memory, token-by-token.

Pairs with models/speech_encoder.py to form the full encoder-decoder ASR
serving pattern: encode once, then FusedGenerator (runtime/generate.py)
decodes the whole transcript in ONE dispatch — the encoder memory rides
along as a loop-invariant context input, so XLA hoists the cross-attention
K/V projections out of the decode scan (computed once per utterance).

The reference is a single-forward CNN engine (SURVEY.md §0); this
completes the speech stack (encoder family + decode serving) on this
framework. Weights are seeded-random; tests assert decode-vs-full parity.
"""

from __future__ import annotations

import numpy as np

from ..ir.build import GraphBuilder
from ..utils import dtypes as dt
from ._util import rand_weight as _w, rename_edges


def make_weights(vocab: int = 64, dim: int = 64, heads: int = 4,
                 layers: int = 2, max_len: int = 16, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    w = {"wte": _w(rng, vocab, dim, scale=0.05),
         "wpe": _w(rng, max_len, dim, scale=0.05),
         "w_head": _w(rng, dim, vocab),
         "lnf_g": np.ones(dim, np.float32),
         "lnf_b": np.zeros(dim, np.float32)}
    for li in range(layers):
        for nm in (f"ln1_{li}", f"ln2_{li}", f"ln3_{li}"):
            w[nm + "_g"] = np.ones(dim, np.float32)
            w[nm + "_b"] = np.zeros(dim, np.float32)
        w[f"wqkv_{li}"] = _w(rng, dim, 3 * dim)
        w[f"wo_{li}"] = _w(rng, dim, dim)
        w[f"xq_{li}"] = _w(rng, dim, dim)
        w[f"xk_{li}"] = _w(rng, dim, dim)
        w[f"xv_{li}"] = _w(rng, dim, dim)
        w[f"xo_{li}"] = _w(rng, dim, dim)
        w[f"w1_{li}"] = _w(rng, dim, 4 * dim)
        w[f"w2_{li}"] = _w(rng, 4 * dim, dim)
    return w


def _ln(b, x, w, name):
    return b.node("LayerNormalization",
                  [x, b.init(w[name + "_g"]), b.init(w[name + "_b"])],
                  axis=-1, epsilon=1e-5)


def _cross_attention(b, h, memory, w, li, heads, dim, rows, t_enc):
    """rows = number of query rows (1 for step, S for full)."""
    hd = dim // heads
    q = b.node("MatMul", [h, b.init(w[f"xq_{li}"])])           # (rows, dim)
    mk = b.node("MatMul", [memory, b.init(w[f"xk_{li}"])])     # (T, dim)
    mv = b.node("MatMul", [memory, b.init(w[f"xv_{li}"])])
    qh = b.node("Reshape", [q, b.init(np.array([rows, heads, hd], np.int64))])
    qh = b.node("Transpose", [qh], perm=[1, 0, 2])             # (H, rows, hd)
    kh = b.node("Reshape", [mk, b.init(np.array([t_enc, heads, hd], np.int64))])
    kh = b.node("Transpose", [kh], perm=[1, 2, 0])             # (H, hd, T)
    vh = b.node("Reshape", [mv, b.init(np.array([t_enc, heads, hd], np.int64))])
    vh = b.node("Transpose", [vh], perm=[1, 0, 2])             # (H, T, hd)
    sc = b.node("MatMul", [qh, kh])
    sc = b.node("Mul", [sc, b.init(np.float32(hd ** -0.5))])
    at = b.node("Softmax", [sc], axis=-1)
    cv = b.node("MatMul", [at, vh])                            # (H, rows, hd)
    cv = b.node("Transpose", [cv], perm=[1, 0, 2])
    cv = b.node("Reshape", [cv, b.init(np.array([rows, dim], np.int64))])
    return b.node("MatMul", [cv, b.init(w[f"xo_{li}"])])


def build_decode_step(weights: dict | None = None, vocab: int = 64,
                      dim: int = 64, heads: int = 4, layers: int = 2,
                      max_len: int = 16, t_enc: int = 12, seed: int = 0):
    """(token (1,), pos (1,), memory (t_enc, dim), k/v caches) ->
    (logits (1, vocab), updated caches). FusedGenerator-compatible; the
    `memory` input is picked up as a context input by the generator."""
    if weights is None:
        weights = make_weights(vocab, dim, heads, layers, max_len, seed)
    w = weights
    hd = dim // heads
    b = GraphBuilder("speech_decoder_step", opset=17)
    token = b.input("token", (1,), dt.INT64)
    pos = b.input("pos", (1,), dt.INT64)
    memory = b.input("memory", (t_enc, dim))
    x = b.node("Gather", [b.init(w["wte"], "wte"), token], axis=0)
    pe = b.node("Gather", [b.init(w["wpe"], "wpe"), pos], axis=0)
    x = b.node("Add", [x, pe])
    cache_outs = []
    for li in range(layers):
        k_cache = b.input(f"k_cache_{li}", (max_len, dim))
        v_cache = b.input(f"v_cache_{li}", (max_len, dim))
        h = _ln(b, x, w, f"ln1_{li}")
        qkv = b.node("MatMul", [h, b.init(w[f"wqkv_{li}"])])
        sl = lambda lo, hi: [b.init(np.array([lo], np.int64)),
                             b.init(np.array([hi], np.int64)),
                             b.init(np.array([1], np.int64))]
        q = b.node("Slice", [qkv] + sl(0, dim))
        k_new = b.node("Slice", [qkv] + sl(dim, 2 * dim))
        v_new = b.node("Slice", [qkv] + sl(2 * dim, 3 * dim))
        idx = b.node("Reshape", [pos, b.init(np.array([1, 1], np.int64))])
        k_upd = b.node("ScatterND", [k_cache, idx, k_new])
        v_upd = b.node("ScatterND", [v_cache, idx, v_new])
        cache_outs += [(f"k_out_{li}", k_upd), (f"v_out_{li}", v_upd)]
        qh = b.node("Reshape", [q, b.init(np.array([heads, 1, hd], np.int64))])
        kh = b.node("Reshape", [k_upd, b.init(np.array([max_len, heads, hd], np.int64))])
        kh = b.node("Transpose", [kh], perm=[1, 2, 0])
        vh = b.node("Reshape", [v_upd, b.init(np.array([max_len, heads, hd], np.int64))])
        vh = b.node("Transpose", [vh], perm=[1, 0, 2])
        sc = b.node("MatMul", [qh, kh])
        sc = b.node("Mul", [sc, b.init(np.float32(hd ** -0.5))])
        arange = b.init(np.arange(max_len, dtype=np.int64), f"ar_{li}")
        valid = b.node("LessOrEqual", [arange, pos])
        mask = b.node("Where", [valid, b.init(np.float32(0.0)),
                                b.init(np.float32(-1e9))])
        sc = b.node("Add", [sc, mask])
        at = b.node("Softmax", [sc], axis=-1)
        cv = b.node("MatMul", [at, vh])
        cv = b.node("Reshape", [cv, b.init(np.array([1, dim], np.int64))])
        x = b.node("Add", [x, b.node("MatMul", [cv, b.init(w[f"wo_{li}"])])])
        h2 = _ln(b, x, w, f"ln2_{li}")
        x = b.node("Add", [x, _cross_attention(b, h2, memory, w, li, heads,
                                               dim, 1, t_enc)])
        h3 = _ln(b, x, w, f"ln3_{li}")
        m1 = b.node("Gelu", [b.node("MatMul", [h3, b.init(w[f"w1_{li}"])])])
        x = b.node("Add", [x, b.node("MatMul", [m1, b.init(w[f"w2_{li}"])])])
    xf = _ln(b, x, w, "lnf")
    logits = b.node("MatMul", [xf, b.init(w["w_head"], "w_head")])
    rename_edges(b.graph, cache_outs)
    return b.finish([logits] + [n for n, _ in cache_outs]), weights


def build_full(weights: dict, seq_len: int, vocab: int = 64, dim: int = 64,
               heads: int = 4, layers: int = 2, t_enc: int = 12):
    """(tokens (S,), memory (t_enc, dim)) -> logits (S, vocab), causal."""
    w = weights
    hd = dim // heads
    b = GraphBuilder("speech_decoder_full", opset=17)
    tokens = b.input("tokens", (seq_len,), dt.INT64)
    memory = b.input("memory", (t_enc, dim))
    x = b.node("Gather", [b.init(w["wte"]), tokens], axis=0)
    x = b.node("Add", [x, b.init(w["wpe"][:seq_len].copy())])
    causal = np.triu(np.full((seq_len, seq_len), -1e9, np.float32), 1)
    for li in range(layers):
        h = _ln(b, x, w, f"ln1_{li}")
        qkv = b.node("MatMul", [h, b.init(w[f"wqkv_{li}"])])
        parts = b.node("Split", [qkv], outputs=3, axis=1)
        q, k, v = parts

        def heads_of(t, perm):
            r = b.node("Reshape", [t, b.init(np.array([seq_len, heads, hd], np.int64))])
            return b.node("Transpose", [r], perm=perm)

        qh = heads_of(q, [1, 0, 2])
        kh = heads_of(k, [1, 2, 0])
        vh = heads_of(v, [1, 0, 2])
        sc = b.node("MatMul", [qh, kh])
        sc = b.node("Mul", [sc, b.init(np.float32(hd ** -0.5))])
        sc = b.node("Add", [sc, b.init(causal)])
        at = b.node("Softmax", [sc], axis=-1)
        cv = b.node("MatMul", [at, vh])
        cv = b.node("Transpose", [cv], perm=[1, 0, 2])
        cv = b.node("Reshape", [cv, b.init(np.array([seq_len, dim], np.int64))])
        x = b.node("Add", [x, b.node("MatMul", [cv, b.init(w[f"wo_{li}"])])])
        h2 = _ln(b, x, w, f"ln2_{li}")
        x = b.node("Add", [x, _cross_attention(b, h2, memory, w, li, heads,
                                               dim, seq_len, t_enc)])
        h3 = _ln(b, x, w, f"ln3_{li}")
        m1 = b.node("Gelu", [b.node("MatMul", [h3, b.init(w[f"w1_{li}"])])])
        x = b.node("Add", [x, b.node("MatMul", [m1, b.init(w[f"w2_{li}"])])])
    xf = _ln(b, x, w, "lnf")
    logits = b.node("MatMul", [xf, b.init(w["w_head"])])
    return b.finish([logits])
