"""Profiling & roofline accounting.

SURVEY.md §5.1: the reference's only observability is debug labels on MPS
nodes (reference: Converters.swift:931,1064,1081). Here:

- `trace(logdir)`: context manager around jax.profiler for Perfetto/XProf
  traces of real TPU runs.
- `op_cost_table(graph)`: static per-node FLOPs/bytes estimates from the
  IR (shape inference), used for roofline sanity checks of the Pallas
  kernels and for picking sharding axes.
- `roofline(flops, bytes, peak_flops, peak_bw)`: bound + achievable time.
"""

from __future__ import annotations

import contextlib
import dataclasses

import numpy as np

from ..ir.graph import Graph

# v5e per-chip peaks (public numbers): 197 bf16 TFLOP/s, 394 int8 TOP/s,
# ~819 GB/s HBM. VPU ceiling derived architecturally: the VPU datapath is
# (8 sublanes x 128 lanes) x 4 ALUs; at the clock implied by the MXU peak
# (197e12 / (4 MXUs x 128x128 MACs x 2) = 1.5 GHz) with FMA that is
# 4096 x 1.5e9 x 2 = 12.3e12 FLOP/s — an unbeatable upper bound for
# depthwise-conv work, which cannot use the MXU (measured dwconv rate
# tops out near 4e12, probe62, so VPU-bound rows read conservative).
TPU_V5E = {"flops_bf16": 197e12, "flops_int8": 394e12, "hbm_gbps": 819e9,
           "flops_vpu": 12.3e12}


@contextlib.contextmanager
def trace(logdir: str = "/tmp/smelter_trace"):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class OpCost:
    name: str
    op_type: str
    flops: float
    bytes: float
    out_shape: tuple
    # portion of `flops` that must execute on the VPU (depthwise convs —
    # the 128x128 MXU cannot contract a 1-channel group); roofline bounds
    # price these at flops_vpu instead of the MXU peak.
    vpu_flops: float = 0.0

    @property
    def arithmetic_intensity(self) -> float:
        return self.flops / max(self.bytes, 1.0)


def _numel(shape) -> int:
    n = 1
    for d in shape:
        n *= int(d)
    return n


def op_cost_table(graph: Graph) -> list[OpCost]:
    """Static cost model per node. Requires graph.value_types populated
    (Executor.infer_value_types)."""
    vt = graph.value_types
    out: list[OpCost] = []
    for node in graph.nodes:
        if not node.outputs or node.outputs[0] not in vt:
            continue
        o_t = vt[node.outputs[0]]
        o_n = _numel(o_t.shape)
        vpu_flops = 0.0
        in_bytes = 0
        for i in node.inputs:
            if i in vt:
                t = vt[i]
                in_bytes += _numel(t.shape) * t.np_dtype.itemsize
            elif i in graph.initializers:
                in_bytes += graph.initializers[i].nbytes
        out_bytes = o_n * o_t.np_dtype.itemsize
        flops = float(o_n)  # default: one op per output element
        if node.op_type in ("Conv", "ConvTranspose", "QLinearConv",
                            "ConvInteger", "PixelConv", "PixelConvQ"):
            w_in = node.inputs[3] if node.op_type == "QLinearConv" else \
                node.inputs[1]
            w = graph.initializers.get(w_in)
            w_shape = w.shape if w is not None else vt[w_in].shape
            if node.attr("data_layout", "") == "NHWC" and len(w_shape) == 4:
                # layout pass stores conv weights HWIO (passes/layout.py)
                cin_per_g, k = w_shape[2], _numel(w_shape[:2])
            else:
                # OIHW (ONNX Conv, PixelConv trunk kernels keep O first)
                cin_per_g, k = w_shape[1], _numel(w_shape[2:])
            flops = 2.0 * o_n * cin_per_g * k
            if cin_per_g == 1:  # depthwise: VPU work, not MXU
                vpu_flops = flops
        elif node.op_type in ("MatMul", "Gemm", "FusedDequantMatMul",
                              "FusedMatMul"):
            a_t = vt.get(node.inputs[0])
            if a_t is not None:
                flops = 2.0 * o_n * int(a_t.shape[-1])
        elif node.op_type == "MatMulNBits":
            flops = 2.0 * o_n * int(node.attr("K", 1))
        elif node.op_type in ("FusedAttention", "FusedQKVAttention",
                              "MultiHeadAttention", "GroupQueryAttention"):
            # two N*T*hd matmuls per head: 4 * out_elems * kv_len
            kv_len = None
            if node.op_type == "FusedQKVAttention":
                i_t = vt.get(node.inputs[0])
                kv_len = int(i_t.shape[1]) if i_t is not None else None
            elif len(node.inputs) > 1 and node.inputs[1]:
                k_t = vt.get(node.inputs[1])
                k_shape = (tuple(k_t.shape) if k_t is not None
                           else getattr(graph.initializers.get(node.inputs[1]),
                                        "shape", None))
                if k_shape is not None and len(k_shape) == 5:
                    kv_len = int(k_shape[1])  # packed KV (B,Skv,H,2,hd)
                elif k_shape is not None and len(k_shape) >= 3:
                    kv_len = int(k_shape[1 if node.attr("k_native", 0)
                                         else -2])
            if kv_len is None:
                i_t = vt.get(node.inputs[0])
                kv_len = int(i_t.shape[1]) if i_t is not None else 1
            flops = 4.0 * o_n * kv_len
        elif node.op_type == "Attention":
            # QKV projection + attention over the packed weights
            x_t = vt.get(node.inputs[0])
            w = graph.initializers.get(node.inputs[1])
            if x_t is not None:
                s = _numel(x_t.shape[:-1])
                din = int(x_t.shape[-1])
                proj_out = int(w.shape[-1]) if w is not None else 3 * din
                flops = 2.0 * s * din * proj_out + 4.0 * o_n * int(x_t.shape[1])
        elif node.op_type == "VitAttnBlock":
            # whole attention block: QKV (6ND^2) + scores/PV (4N^2D) +
            # proj (2ND^2) per image — kernels/vit_block.py
            i_t = vt.get(node.inputs[0])
            if i_t is not None and len(i_t.shape) == 3:
                bb, nn, dd = (int(v) for v in i_t.shape)
                flops = bb * (8.0 * nn * dd * dd + 4.0 * nn * nn * dd)
        elif node.op_type == "CrossAttnBlock":
            i_t = vt.get(node.inputs[0])
            k_w = graph.initializers.get(node.inputs[2])
            if i_t is not None and len(i_t.shape) == 3 and k_w is not None:
                bb, nn, dd = (int(v) for v in i_t.shape)
                s_kv = int(k_w.shape[-2])
                flops = bb * (4.0 * nn * dd * dd + 4.0 * nn * s_kv * dd)
        elif node.op_type == "MlpBlock":
            i_t = vt.get(node.inputs[0])
            w1 = graph.initializers.get(node.inputs[3])
            if i_t is not None and len(i_t.shape) == 3 and w1 is not None:
                bb, nn, dd = (int(v) for v in i_t.shape)
                flops = bb * 4.0 * nn * dd * int(w1.shape[-1])
        elif node.op_type == "ConvNeXtBlock":
            i_t = vt.get(node.inputs[0])
            w1 = graph.initializers.get(node.inputs[5])
            if i_t is not None and len(i_t.shape) == 4 and w1 is not None:
                bb, hh, ww_, cc = (int(v) for v in i_t.shape)
                vpu_flops = bb * hh * ww_ * cc * 2.0 * 49  # dw7x7 part
                flops = vpu_flops + bb * hh * ww_ * 4.0 * cc \
                    * int(w1.shape[-1])
        elif node.op_type in ("Softmax", "LogSoftmax", "Exp", "Log", "Tanh",
                              "Sigmoid", "Gelu", "Erf", "FastGelu",
                              "QuickGelu", "BiasGelu"):
            flops = 5.0 * o_n  # transcendental-ish
        out.append(OpCost(node.name, node.op_type, flops,
                          float(in_bytes + out_bytes), o_t.shape,
                          vpu_flops=vpu_flops))
    return out


def model_cost(graph: Graph) -> dict:
    table = op_cost_table(graph)
    by_op: dict[str, dict] = {}
    for c in table:
        agg = by_op.setdefault(c.op_type, {"flops": 0.0, "bytes": 0.0, "count": 0})
        agg["flops"] += c.flops
        agg["bytes"] += c.bytes
        agg["count"] += 1
    return {
        "flops": sum(c.flops for c in table),
        "bytes": sum(c.bytes for c in table),
        "by_op": dict(sorted(by_op.items(),
                             key=lambda kv: -kv[1]["flops"])),
    }


def roofline(flops: float, bytes_: float, chip: dict = TPU_V5E,
             dtype: str = "bf16") -> dict:
    peak = chip[f"flops_{dtype}"]
    bw = chip["hbm_gbps"]
    t_compute = flops / peak
    t_memory = bytes_ / bw
    bound = "compute" if t_compute >= t_memory else "memory"
    return {
        "t_compute_s": t_compute,
        "t_memory_s": t_memory,
        "bound": bound,
        "speed_of_light_s": max(t_compute, t_memory),
    }
