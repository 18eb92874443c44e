"""BERT-style encoder written in the ORT-optimized contrib vocabulary:
EmbedLayerNormalization -> [Attention(mask_index) -> SkipLayerNormalization
-> FastGelu FF -> SkipLayerNormalization] x L -> pooled [CLS] logits.

This is the graph shape `onnxruntime.transformers.optimizer` emits for a
BERT ONNX export — the compatibility target of ops/contrib_ops.py — built
directly with GraphBuilder so the engine's contrib path is benchable
without a real checkpoint. The attention mask flows as the (B,) valid-
length vector EmbedLayerNormalization produces, exactly as ORT wires it.

Reference has no transformer support at all (SURVEY.md §0); torch is the
golden reference in tests (tests/test_bert_encoder.py).
"""

from __future__ import annotations

import numpy as np

from ..ir.build import GraphBuilder
from ..utils import dtypes as dt
from ._util import rand_weight as _w


def make_weights(vocab: int = 1000, dim: int = 256, heads: int = 4,
                 layers: int = 4, max_len: int = 128, ffn: int = 1024,
                 n_types: int = 2, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    w = {"word": _w(rng, vocab, dim, scale=0.02),
         "pos": _w(rng, max_len, dim, scale=0.02),
         "seg": _w(rng, n_types, dim, scale=0.02),
         "emb_g": np.ones(dim, np.float32),
         "emb_b": np.zeros(dim, np.float32),
         "pool_w": _w(rng, dim, dim),
         "pool_b": np.zeros(dim, np.float32)}
    for li in range(layers):
        w[f"wqkv_{li}"] = _w(rng, dim, 3 * dim)
        w[f"bqkv_{li}"] = np.zeros(3 * dim, np.float32)
        w[f"wo_{li}"] = _w(rng, dim, dim)
        w[f"bo_{li}"] = np.zeros(dim, np.float32)
        w[f"ln1_g_{li}"] = np.ones(dim, np.float32)
        w[f"ln1_b_{li}"] = np.zeros(dim, np.float32)
        w[f"w1_{li}"] = _w(rng, dim, ffn)
        w[f"b1_{li}"] = np.zeros(ffn, np.float32)
        w[f"w2_{li}"] = _w(rng, ffn, dim)
        w[f"ln2_g_{li}"] = np.ones(dim, np.float32)
        w[f"ln2_b_{li}"] = np.zeros(dim, np.float32)
    return w


def build(batch: int = 8, seq_len: int = 128, vocab: int = 1000,
          dim: int = 256, heads: int = 4, layers: int = 4,
          ffn: int = 1024, seed: int = 0, weights: dict | None = None,
          **_):
    """(input_ids (B,S) int32, attention_mask (B,S) int32) ->
    pooled (B, dim). Returns (graph, weights)."""
    w = weights or make_weights(vocab, dim, heads, layers,
                                max(seq_len, 2), ffn, seed=seed)
    b = GraphBuilder("bert_encoder", opset=17)
    ids = b.input("input_ids", (batch, seq_len), dt.INT32)
    mask = b.input("attention_mask", (batch, seq_len), dt.INT32)
    emb, midx = b.node(
        "EmbedLayerNormalization",
        [ids, "", b.init(w["word"], "word"), b.init(w["pos"], "pos"), "",
         b.init(w["emb_g"]), b.init(w["emb_b"]), mask],
        outputs=["emb", "mask_index"], epsilon=1e-12)
    x = emb
    for li in range(layers):
        att = b.node("Attention",
                     [x, b.init(w[f"wqkv_{li}"]), b.init(w[f"bqkv_{li}"]),
                      midx],
                     num_heads=heads)
        proj = b.node("MatMul", [att, b.init(w[f"wo_{li}"])])
        ln1 = b.node("SkipLayerNormalization",
                     [proj, x, b.init(w[f"ln1_g_{li}"]),
                      b.init(w[f"ln1_b_{li}"]), b.init(w[f"bo_{li}"])],
                     epsilon=1e-12)
        ff = b.node("MatMul", [ln1, b.init(w[f"w1_{li}"])])
        act = b.node("FastGelu", [ff, b.init(w[f"b1_{li}"])])
        ff2 = b.node("MatMul", [act, b.init(w[f"w2_{li}"])])
        x = b.node("SkipLayerNormalization",
                   [ff2, ln1, b.init(w[f"ln2_g_{li}"]),
                    b.init(w[f"ln2_b_{li}"])],
                   epsilon=1e-12)
    # pooler: tanh(W @ x[:, 0])
    cls = b.node("Gather", [x, b.init(np.array(0, np.int64))], axis=1)
    pooled = b.node("Gemm", [cls, b.init(w["pool_w"]), b.init(w["pool_b"])])
    pooled = b.node("Tanh", [pooled])
    return b.finish([pooled]), w


def torch_reference(w: dict, ids, mask, heads: int):
    """Numerically-equivalent torch forward for the golden tests."""
    import torch
    import torch.nn.functional as F

    ids_t = torch.from_numpy(np.asarray(ids, np.int64))
    b_, s = ids_t.shape
    dim = w["word"].shape[1]
    e = (torch.from_numpy(w["word"])[ids_t]
         + torch.from_numpy(w["pos"])[:s][None])
    x = F.layer_norm(e, (dim,), torch.from_numpy(w["emb_g"]),
                     torch.from_numpy(w["emb_b"]), eps=1e-12)
    lens = torch.from_numpy(np.asarray(mask)).sum(1)
    keep = torch.arange(s)[None, :] < lens[:, None]
    amask = torch.where(keep, 0.0, -10000.0)[:, None, None, :]
    li = 0
    while f"wqkv_{li}" in w:
        qkv = x @ torch.from_numpy(w[f"wqkv_{li}"]) + torch.from_numpy(w[f"bqkv_{li}"])
        q, k, v = qkv.split(dim, dim=-1)
        hd = dim // heads
        q = q.reshape(b_, s, heads, hd).transpose(1, 2)
        k = k.reshape(b_, s, heads, hd).transpose(1, 2)
        v = v.reshape(b_, s, heads, hd).transpose(1, 2)
        att = F.scaled_dot_product_attention(q, k, v, attn_mask=amask)
        att = att.transpose(1, 2).reshape(b_, s, dim)
        proj = att @ torch.from_numpy(w[f"wo_{li}"]) + torch.from_numpy(w[f"bo_{li}"])
        ln1 = F.layer_norm(proj + x, (dim,), torch.from_numpy(w[f"ln1_g_{li}"]),
                           torch.from_numpy(w[f"ln1_b_{li}"]), eps=1e-12)
        ff = F.gelu(ln1 @ torch.from_numpy(w[f"w1_{li}"])
                    + torch.from_numpy(w[f"b1_{li}"]), approximate="tanh")
        ff2 = ff @ torch.from_numpy(w[f"w2_{li}"])
        x = F.layer_norm(ff2 + ln1, (dim,), torch.from_numpy(w[f"ln2_g_{li}"]),
                         torch.from_numpy(w[f"ln2_b_{li}"]), eps=1e-12)
        li += 1
    pooled = torch.tanh(x[:, 0] @ torch.from_numpy(w["pool_w"])
                        + torch.from_numpy(w["pool_b"]))
    return pooled.numpy()


def build_zoo(batch: int = 8, seq_len: int = 128, **kw):
    """Single-f32-input form for the ZOO/bench contract: the float input is
    hashed to token ids in-graph (Abs->Mul->Cast->Mod) and the attention
    mask is all-valid. Returns (graph, None, shape) like the other zoo
    builders (torch reference not meaningful for the hashed ids)."""
    w = make_weights(**{k: v for k, v in kw.items()
                        if k in ("vocab", "dim", "heads", "layers", "ffn",
                                 "seed")},
                     max_len=max(seq_len, 2))
    inner, _ = build(batch=batch, seq_len=seq_len, weights=w,
                     **{k: v for k, v in kw.items()
                        if k in ("vocab", "dim", "heads", "layers", "ffn")})
    vocab = w["word"].shape[0]
    b = GraphBuilder("bert_encoder_zoo", opset=17)
    x = b.input("x", (batch, seq_len), dt.FLOAT)
    scaled = b.node("Mul", [b.node("Abs", [x]), b.init(np.float32(1000.0))])
    ids = b.node("Cast", [scaled], to=dt.INT32)
    ids = b.node("Mod", [ids, b.init(np.int32(vocab))])
    mask = b.init(np.ones((batch, seq_len), np.int32), "full_mask")
    # splice the encoder graph, namespacing its edges to avoid collisions
    # with this wrapper's auto-generated names
    def ns(name: str) -> str:
        return "enc." + name if name else name

    remap = {"input_ids": ids, "attention_mask": mask}
    for n in inner.nodes:
        n.inputs = [remap.get(i, ns(i)) for i in n.inputs]
        n.outputs = [ns(o) for o in n.outputs]
        n.name = ns(n.name)
        b.graph.nodes.append(n)
    for k, v in inner.initializers.items():
        b.graph.initializers[ns(k)] = v
    out = ns(inner.output_names[0])
    return b.finish([out]), None, (batch, seq_len)
