"""Fuse DequantizeLinear into matmul-family consumers.

Rewrites DequantizeLinear(w_q, s) -> MatMul/Gemm chains into the internal
FusedDequantMatMul op whose lowering calls the Pallas fused kernel
(kernels/dequant_matmul.py) when Config.use_pallas is on, or an equivalent
jnp composite otherwise. This removes the materialized fp32 weight tensor:
the int8 weight is the only HBM-resident copy.

Gemm(transB=1) weights are pre-transposed to (K, N) on the host at pass
time (one-time cost — the analog of the reference's offline weight swizzle,
ONNX2MPS.py:70-79) so both paths share one kernel layout.
"""

from __future__ import annotations

import numpy as np

from ..ir.graph import Graph, Node
from .pass_manager import register_pass


@register_pass("fuse_dequant_matmul")
def fuse_dequant_matmul(graph: Graph) -> int:
    changed = 0
    producers = graph.producers()
    consumers = graph.consumers()
    new_nodes: list[Node] = []
    dead: set[int] = set()
    for node in graph.nodes:
        fused = None
        if node.op_type in ("MatMul", "Gemm") and len(node.inputs) >= 2:
            dq = producers.get(node.inputs[1])
            if (
                dq is not None
                and dq.op_type == "DequantizeLinear"
                and len(dq.inputs) == 2  # no zero-point (symmetric)
                and dq.inputs[0] in graph.initializers
                and dq.inputs[1] in graph.initializers
            ):
                q = graph.initializers[dq.inputs[0]]
                s = graph.initializers[dq.inputs[1]]
                axis = dq.attr("axis", 1)
                if axis < 0:
                    axis += q.ndim
                if q.ndim == 2 and q.dtype == np.int8:
                    fused = self_fuse(graph, node, dq, q, s, axis)
        if fused is not None:
            new_nodes.extend(fused)
            # Drop the DequantizeLinear if this was its only consumer.
            dq_out = node.inputs[1]
            if len(consumers.get(dq_out, [])) == 1:
                dead.add(id(producers[dq_out]))
            changed += 1
        else:
            new_nodes.append(node)
    if changed:
        graph.nodes = [n for n in new_nodes if id(n) not in dead]
        graph.toposort()
    return changed


def self_fuse(graph: Graph, node: Node, dq: Node, q: np.ndarray, s: np.ndarray,
              axis: int) -> list[Node] | None:
    """Build replacement nodes for one matmul/gemm, or None if ineligible."""
    s = np.asarray(s, np.float32).reshape(-1)
    if node.op_type == "MatMul":
        if axis != q.ndim - 1:
            return None  # scales must be per output column
        kq, n_out = q.shape
        q_name, s_name = dq.inputs[0], dq.inputs[1]
        return [Node(
            "FusedDequantMatMul",
            inputs=[node.inputs[0], q_name, s_name],
            outputs=list(node.outputs),
            name=node.name + "_fdq",
        )]
    # Gemm: only the common inference form (transA=0, alpha=beta=1).
    if node.attr("transA", 0) or node.attr("alpha", 1.0) != 1.0:
        return None
    if node.attr("beta", 1.0) != 1.0 and len(node.inputs) > 2:
        return None
    trans_b = node.attr("transB", 0)
    if trans_b:
        if axis != 0:
            return None  # (N, K) with per-N scales on axis 0
        q_t = np.ascontiguousarray(q.T)  # -> (K, N)
    else:
        if axis != 1:
            return None
        q_t = q
    qt_name = graph.fresh_name(dq.inputs[0] + "_t")
    graph.initializers[qt_name] = q_t
    s_name = dq.inputs[1]
    mm_out = graph.fresh_name(node.outputs[0] + "_mm")
    nodes = [Node(
        "FusedDequantMatMul",
        inputs=[node.inputs[0], qt_name, s_name],
        outputs=[mm_out if len(node.inputs) > 2 and node.inputs[2] else node.outputs[0]],
        name=node.name + "_fdq",
    )]
    if len(node.inputs) > 2 and node.inputs[2]:
        nodes.append(Node(
            "Add", inputs=[mm_out, node.inputs[2]], outputs=list(node.outputs),
            name=node.name + "_bias",
        ))
    return nodes
