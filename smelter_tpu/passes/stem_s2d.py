"""Space-to-depth stem-conv rewrite (the MLPerf-TPU conv0 trick).

A stride-2 conv on a 3-channel image is the single most lane-hostile op a
CNN has on TPU: NHWC tiling pads the channel (lane) dim 3 -> 128, so XLA
reads the 224x224 input ~42x inflated — probe34 measured the ResNet-50
stem at 3.13 ms of the 10.51 ms total (30%, ~5% MFU). Rewriting

    Conv(k x k, stride 2, pad p, C_in <= 4)
 -> SpaceToDepth(2) + Conv(k' x k', stride 1, C_in * 4)

is arithmetic-identical (same multiplies; the reshaped weight just gains a
few structural zeros) and cuts the lane inflation 4x. Derivation: with
fp = p % 2 and u + fp = 2p' + a, the original tap x[n,c, 2*oi + u - p]
becomes x'[n,(c,a), oi + p' - L] with L = (p + fp) // 2, where x' is the
block-2 space-to-depth of x (channel order (a*2+b)*C + c, matching the
SpaceToDepth lowering in ops/tensor_ops.py:361-374). The reference engine
never needs this — MPS convs have no lane-padding pathology (reference:
Sources/Smelter/Converters.swift:137-259 lowers Conv directly).
"""

from __future__ import annotations

import numpy as np

from ..ir.graph import Graph, Node
from .pass_manager import register_pass


def _as_pair(v, default):
    if v is None:
        return (default, default)
    if isinstance(v, (int, float)):
        return (int(v), int(v))
    return tuple(int(x) for x in v)


@register_pass("stem_space_to_depth")
def stem_space_to_depth(graph: Graph) -> int:
    from .layout import _ensure_types

    if not _ensure_types(graph):
        return 0
    vt = graph.value_types
    consumers = graph.consumers()
    changed = 0
    new_nodes: list[Node] = []
    for nd in graph.nodes:
        if nd.op_type != "Conv":
            continue
        w = graph.initializers.get(nd.inputs[1]) if len(nd.inputs) > 1 else None
        if w is None or w.ndim != 4:
            continue
        oc, cin, kh, kw = w.shape
        if cin > 4 or kh != kw or kh < 2:
            continue
        if int(nd.attr("group", 1)) != 1:
            continue
        if any(d != 1 for d in _as_pair(nd.attr("dilations"), 1)):
            continue
        if _as_pair(nd.attr("strides"), 1) != (2, 2):
            continue
        ap = nd.attr("auto_pad", "NOTSET")
        if ap not in ("NOTSET", b"NOTSET", ""):
            continue
        pads = nd.attr("pads", [0, 0, 0, 0])
        pads = [int(x) for x in pads]
        if len(pads) != 4 or len(set(pads)) != 1:
            continue
        p = pads[0]
        t_in = vt.get(nd.inputs[0])
        if t_in is None or len(t_in.shape) != 4:
            continue
        n_, c_, h, w_dim = t_in.shape
        if (not isinstance(h, int) or not isinstance(w_dim, int)
                or h % 2 or w_dim % 2):
            continue
        k = kh
        fp = p % 2
        kp = ((k + fp) + 1) // 2  # new kernel size: ceil((k+fp)/2)
        left = (p + fp) // 2
        out = (h + 2 * p - k) // 2 + 1
        right = out - 1 + kp - left - h // 2
        if right < 0 or right >= kp or left >= kp + 1:
            continue

        # reshaped weight: W'[oc, (a*2+b)*C + c, p', q'] = w[oc,c,2p'+a-fp,2q'+b-fp]
        w2 = np.zeros((oc, 4 * cin, kp, kp), dtype=w.dtype)
        for a in range(2):
            for b in range(2):
                for pp in range(kp):
                    u = 2 * pp + a - fp
                    if not (0 <= u < k):
                        continue
                    for qq in range(kp):
                        v = 2 * qq + b - fp
                        if not (0 <= v < k):
                            continue
                        w2[:, (a * 2 + b) * cin:(a * 2 + b + 1) * cin, pp, qq] = \
                            w[:, :, u, v]

        s2d_out = nd.inputs[0] + "_stem_s2d"
        if s2d_out in vt or s2d_out in graph.initializers:
            continue
        w2_name = nd.inputs[1] + "_s2d"
        graph.initializers[w2_name] = w2
        # drop the old weight only if this conv was its sole consumer
        if len(consumers.get(nd.inputs[1], [])) == 1:
            graph.initializers.pop(nd.inputs[1], None)
        new_nodes.append(Node("SpaceToDepth", [nd.inputs[0]], [s2d_out],
                              attrs={"blocksize": 2},
                              name=f"stem_s2d_{nd.name or nd.outputs[0]}"))
        nd.inputs[0] = s2d_out
        nd.inputs[1] = w2_name
        nd.attrs["kernel_shape"] = [kp, kp]
        nd.attrs["strides"] = [1, 1]
        nd.attrs["pads"] = [left, left, right, right]
        changed += 1
    if changed:
        graph.nodes.extend(new_nodes)
        graph.toposort()
        graph.value_types = {}
    return changed
