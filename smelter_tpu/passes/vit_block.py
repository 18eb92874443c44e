"""Fuse the whole pre-LN attention block into one VitAttnBlock op.

Round-3 follow-through on the partial-kernel findings (VERDICT r2 item
4): every partial transformer kernel lost to XLA fusion barriers, so the
fusion unit is the entire block —

    LayerNormalization(x, g, b)
      -> MatMul(., Wqkv (D, 3D))  -> Add(., bqkv)
      -> FusedQKVAttention
      -> MatMul(., Wproj (D, D))  -> Add(., bproj)

becomes VitAttnBlock(x, g, b, Wqkv_packed, bqkv_packed, Wproj, bproj),
lowered to the VMEM-resident whole-block Pallas kernel
(kernels/vit_block.py; measured 134.6 TF vs XLA's 53.7 at the ViT-B/16
block geometry, probe52 — 2.5x). QKV weights are re-packed per head PAIR
at pass time so every projection in the kernel is a full-width 128-lane
MXU matmul.

Gate: heads even and 2*head_dim == 128 lanes (ViT-B/L and the
BERT-encoder d256/h4 geometry); anything else keeps the XLA
dot_product_attention path. Residual stays OUTSIDE the op (the
downstream SkipLayerNormalization / Add already fuses it), so the
rewrite is a drop-in replacement for the proj bias-add's output edge.

Reference scope: none — no attention in the reference (SURVEY.md §5.7).
"""

from __future__ import annotations

import numpy as np

from ..ir.graph import Graph, Node
from .pass_manager import register_pass


@register_pass("fuse_vit_block")
def fuse_vit_block(graph: Graph) -> int:
    from ..kernels.vit_block import pack_qkv_weights

    producers = graph.producers()
    consumers = graph.consumers()
    changed = 0
    dead: set[int] = set()

    def sole(edge: str) -> bool:
        return len(consumers.get(edge, [])) == 1

    for att in list(graph.find_nodes("FusedQKVAttention")):
        if id(att) in dead:
            continue
        heads = int(att.attr("num_heads", 0))
        # -- upstream: Add(bias) <- MatMul(Wqkv) <- LayerNormalization ----
        badd = producers.get(att.inputs[0])
        if (badd is None or badd.op_type != "Add"
                or not sole(att.inputs[0])):
            continue
        bq_name = badd.inputs[1] if badd.inputs[1] in graph.initializers \
            else badd.inputs[0]
        x_mm = badd.inputs[0] if bq_name == badd.inputs[1] else badd.inputs[1]
        if bq_name not in graph.initializers:
            continue
        mm = producers.get(x_mm)
        if (mm is None or mm.op_type != "MatMul" or not sole(x_mm)
                or mm.inputs[1] not in graph.initializers):
            continue
        wq_name = mm.inputs[1]
        wqkv = graph.initializers[wq_name]
        if wqkv.ndim != 2 or wqkv.shape[1] != 3 * wqkv.shape[0]:
            continue
        d = int(wqkv.shape[0])
        if heads <= 0 or heads % 2 or d % heads or 2 * (d // heads) != 128:
            continue  # kernel layout wants 128-lane head pairs
        ln = producers.get(mm.inputs[0])
        if (ln is None or ln.op_type != "LayerNormalization"
                or not sole(mm.inputs[0])
                or ln.inputs[1] not in graph.initializers
                or ln.inputs[2] not in graph.initializers
                or ln.attr("axis", -1) not in (-1, 2)):
            continue
        # -- downstream: MatMul(Wproj) -> Add(bproj) ----------------------
        outs = consumers.get(att.outputs[0], [])
        if len(outs) != 1 or outs[0].op_type != "MatMul":
            continue
        pm = outs[0]
        if (pm.inputs[0] != att.outputs[0]
                or pm.inputs[1] not in graph.initializers):
            continue
        wp = graph.initializers[pm.inputs[1]]
        if wp.ndim != 2 or wp.shape != (d, d):
            continue
        outs2 = consumers.get(pm.outputs[0], [])
        if (len(outs2) != 1 or outs2[0].op_type != "Add"
                or not sole(pm.outputs[0])):
            continue
        padd = outs2[0]
        bp_name = padd.inputs[1] if padd.inputs[1] in graph.initializers \
            else padd.inputs[0]
        if (bp_name not in graph.initializers
                or graph.initializers[bp_name].reshape(-1).shape != (d,)):
            continue
        bq = graph.initializers[bq_name].reshape(-1)
        if bq.shape != (3 * d,):
            continue

        wpk, bpk = pack_qkv_weights(np.asarray(wqkv), np.asarray(bq), heads)
        wpk_name = graph.fresh_name(wq_name + "_pairpack")
        bpk_name = graph.fresh_name(bq_name + "_pairpack")
        graph.initializers[wpk_name] = np.ascontiguousarray(wpk)
        graph.initializers[bpk_name] = np.ascontiguousarray(bpk)

        fused = Node(
            "VitAttnBlock",
            inputs=[ln.inputs[0], ln.inputs[1], ln.inputs[2],
                    wpk_name, bpk_name, pm.inputs[1], bp_name],
            outputs=list(padd.outputs),
            attrs={"num_heads": heads,
                   # verbatim from FusedQKVAttention: its lowering feeds
                   # this straight to dot_product_attention(scale=...)
                   "scale": float(att.attr("scale", 1.0)),
                   "epsilon": float(ln.attr("epsilon", 1e-5))},
            name=(att.name or "attn") + "_block",
        )
        idx = graph.nodes.index(padd)
        graph.nodes[idx] = fused
        for n in (ln, mm, badd, att, pm):
            dead.add(id(n))
        changed += 1

    if changed:
        graph.nodes = [n for n in graph.nodes if id(n) not in dead]
        graph.toposort()
        graph.dead_code_eliminate()
        graph.value_types = {}
    return changed
