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

    # -- post-LN variant: ORT-contrib BERT pattern ------------------------
    #   Attention(x, Wqkv, bqkv) -> MatMul(Wproj) -> SkipLayerNormalization
    # Attention + proj collapse into VitAttnBlock(pre_ln=0); the
    # SkipLayerNormalization keeps residual + LN (+ proj bias) downstream.
    input_ranks = {v.name: (len(v.type.shape) if v.type is not None else None)
                   for v in graph.inputs}
    for att in list(graph.find_nodes("Attention")):
        if id(att) in dead:
            continue
        mask = att.inputs[3] if len(att.inputs) > 3 else ""
        if mask and input_ranks.get(mask) != 2:
            # rank unknown from graph inputs: the (B,) valid-length form
            # produced by EmbedLayerNormalization output 1 is also
            # kernelized; every other mask form keeps the general lowering
            pr = producers.get(mask)
            if not (pr is not None
                    and pr.op_type == "EmbedLayerNormalization"
                    and len(pr.outputs) > 1 and pr.outputs[1] == mask):
                continue
        if (len(att.inputs) > 4 and any(e for e in att.inputs[4:])):
            continue  # past / attention_bias: keep the general lowering
        if (int(att.attr("unidirectional", 0))
                or int(att.attr("do_rotary", 0))
                or att.attr("qkv_hidden_sizes") is not None
                or len([o for o in att.outputs if o]) != 1):  # no `present`
            continue
        heads = int(att.attr("num_heads", 0))
        if (len(att.inputs) < 3 or att.inputs[1] not in graph.initializers
                or att.inputs[2] not in graph.initializers):
            continue
        wqkv = graph.initializers[att.inputs[1]]
        if wqkv.ndim != 2 or wqkv.shape[1] != 3 * wqkv.shape[0]:
            continue
        d = int(wqkv.shape[0])
        if heads <= 0 or heads % 2 or d % heads or 2 * (d // heads) != 128:
            continue
        outs = consumers.get(att.outputs[0], [])
        if (len(outs) != 1 or outs[0].op_type != "MatMul"
                or not sole(att.outputs[0])):
            continue
        pm = outs[0]
        if (pm.inputs[0] != att.outputs[0]
                or pm.inputs[1] not in graph.initializers
                or graph.initializers[pm.inputs[1]].shape != (d, d)):
            continue
        bq = graph.initializers[att.inputs[2]].reshape(-1)
        if bq.shape != (3 * d,):
            continue

        wpk, bpk = pack_qkv_weights(np.asarray(wqkv), np.asarray(bq), heads)
        wpk_name = graph.fresh_name(att.inputs[1] + "_pairpack")
        bpk_name = graph.fresh_name(att.inputs[2] + "_pairpack")
        graph.initializers[wpk_name] = np.ascontiguousarray(wpk)
        graph.initializers[bpk_name] = np.ascontiguousarray(bpk)
        ones = graph.fresh_name("vab_ones")
        zeros = graph.fresh_name("vab_zeros")
        graph.initializers[ones] = np.ones(d, np.float32)   # unused (pre_ln=0)
        graph.initializers[zeros] = np.zeros(d, np.float32)

        fused = Node(
            "VitAttnBlock",
            inputs=[att.inputs[0], ones, zeros, wpk_name, bpk_name,
                    pm.inputs[1], zeros] + ([mask] if mask else []),
            outputs=list(pm.outputs),
            attrs={"num_heads": heads,
                   "scale": float(att.attr("scale", 0.0)),  # 0 -> 1/sqrt(hd)
                   "mask_filter": float(att.attr("mask_filter_value",
                                                 -10000.0)),
                   "pre_ln": 0},
            name=(att.name or "attn") + "_block",
        )
        idx = graph.nodes.index(pm)
        graph.nodes[idx] = fused
        dead.add(id(att))
        changed += 1

    if changed:
        graph.nodes = [n for n in graph.nodes if id(n) not in dead]
        graph.toposort()
        graph.dead_code_eliminate()
        graph.value_types = {}
    return changed
