"""Roofline report per zoo model (VERDICT r2 item 5 / BASELINE.json:5).

For each requested model, compile the engine-best graph, evaluate the
static cost model (runtime/profiler.py), and print the binding resource
(MXU-bf16 / MXU-int8 / HBM), the speed-of-light img/s for that bound,
and — with --measure on a TPU — the achieved img/s and % of bound.

Bound construction (honest-by-construction):
  t_mxu  = sum over matmul-class ops of flops / peak(dtype-of-op)
           (int8-MXU ops at 394 TOP/s, everything else bf16 at 197)
  t_hbm  = (graph inputs + outputs + weights, each crossing HBM once)
           / 819 GB/s — a LOWER bound on traffic (intermediates assumed
           fused), so achieved% is a true fraction of an ideal that no
           schedule can beat.
  t_vpu  = depthwise-conv flops / flops_vpu (the 128x128 MXU cannot
           contract 1-channel groups; priced at the VPU's architectural
           ceiling — see runtime/profiler.py TPU_V5E derivation)
  SOL    = max(t_mxu, t_hbm, t_vpu); bound = whichever binds.

Usage:
  JAX_PLATFORMS=cpu python -m smelter_tpu.tools.roofline --model resnet50 \
      --batch 128 --quant int8            # static bound only
  python -m smelter_tpu.tools.roofline --model resnet50 --batch 128 \
      --quant int8 --measure              # on-TPU achieved vs bound
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

# ops that execute on the int8 MXU after the engine's quantization passes
_INT8_MXU_OPS = {"QLinearConv", "QLinearMatMul", "ConvInteger",
                 "MatMulInteger", "PixelConvQ"}
# memory-movement ops whose traffic no schedule can fuse away
_SCATTER_OPS = {"MaxUnpool", "ScatterND", "ScatterElements", "GatherND",
                "MaxRoiPool", "RoiAlign", "GridSample", "NonMaxSuppression"}

_MXU_OPS = _INT8_MXU_OPS | {
    "Conv", "ConvTranspose", "MatMul", "Gemm", "FusedMatMul",
    "FusedDequantMatMul", "MatMulNBits", "PixelConv", "Attention",
    "FusedAttention", "FusedQKVAttention", "MultiHeadAttention",
    "GroupQueryAttention", "LSTM", "GRU", "RNN",
    "VitAttnBlock", "CrossAttnBlock", "MlpBlock", "ConvNeXtBlock",
}


def model_roofline(graph, config=None) -> dict:
    """Static bound for a compiled (post-pass) graph."""
    from ..runtime.executor import Executor
    from ..runtime.profiler import TPU_V5E, op_cost_table

    ex = Executor(graph, config)
    ex.infer_value_types()
    table = op_cost_table(graph)
    t_bf16 = t_int8 = t_vpu = 0.0
    for c in table:
        if c.op_type not in _MXU_OPS:
            continue
        # depthwise-conv flops cannot use the MXU (1-channel groups) —
        # they are VPU work and bound separately at flops_vpu
        t_vpu += c.vpu_flops / TPU_V5E["flops_vpu"]
        mxu_flops = c.flops - c.vpu_flops
        if c.op_type in _INT8_MXU_OPS:
            t_int8 += mxu_flops / TPU_V5E["flops_int8"]
        else:
            t_bf16 += mxu_flops / TPU_V5E["flops_bf16"]
    t_mxu = t_bf16 + t_int8

    io_bytes = 0
    vt = graph.value_types
    for v in list(graph.inputs) + list(graph.outputs):
        t = vt.get(v.name)
        if t is not None:
            io_bytes += int(np.prod([int(d) for d in t.shape])) * 2  # bf16
    w_bytes = sum(a.nbytes for a in graph.initializers.values())
    # scatter/gather-class ops (MaxUnpool decoders, ROI ops, big gathers)
    # cannot fuse away their traffic — their per-op bytes are a REQUIRED
    # part of any schedule, unlike elementwise intermediates. Without this
    # term SegNet's bound claimed 37.5k img/s (4.8% achieved) when the
    # unpool scatters alone force ~16x more HBM traffic than graph I/O.
    scatter_bytes = sum(c.bytes for c in table
                        if c.op_type in _SCATTER_OPS)
    # pure depthwise convs are the same kind of required traffic: XLA
    # cannot fuse conv-to-conv, so a dwconv's input and output activations
    # cross HBM at serving sizes regardless of schedule. dw3x3 runs ~4.5
    # flops/byte — HBM-bound, NOT VPU-bound — so without this term the
    # MobileNet bounds read ~3x looser than any schedule could reach
    # (probe62's "measured dwconv tops out near 4 TF" is that HBM wall).
    # Count INTERIOR activation edges only, at bf16: weights are already
    # in w_bytes and graph-boundary edges in io_bytes (the bound must
    # stay a true lower bound — no double counting).
    boundary = ({v.name for v in graph.inputs}
                | {v.name for v in graph.outputs})

    def _is_depthwise(node) -> bool:
        # detect directly from the node (ONNX node names are not unique
        # and default to "" — never join by name): 1-channel groups,
        # honoring the layout pass's HWIO weight storage like the
        # profiler (runtime/profiler.py::op_cost_table)
        if node.op_type != "Conv" or len(node.inputs) < 2:
            return False
        w = graph.initializers.get(node.inputs[1])
        if w is None:
            # weight-only quantized: the weight input is a
            # DequantizeLinear output — resolve to its initializer
            prod = next((n for n in graph.nodes
                         if node.inputs[1] in n.outputs), None)
            if prod is not None and prod.op_type == "DequantizeLinear":
                w = graph.initializers.get(prod.inputs[0])
        if w is None or w.ndim != 4 or int(node.attr("group", 1)) <= 1:
            return False
        cin_per_g = (w.shape[2]
                     if node.attr("data_layout", "") == "NHWC"
                     else w.shape[1])
        return cin_per_g == 1

    # Round-5 extension of the r4b dwconv term: pooling, relayout
    # (DepthToSpace/SpaceToDepth) and resize ops are the same kind of
    # required traffic as scatter — pure data movement XLA cannot fuse
    # into the adjacent convs, so their interior activations cross HBM
    # in any schedule. Counting input[0]+output[0] per such node is what
    # the old bound missed on SegNet (5.8% "achieved" against a bound
    # that priced the pool/unpool/D2S pipeline at zero). Dense convs
    # are deliberately NOT counted: an all-conv-I/O bound was tried and
    # FALSIFIED by measurement (MobileNetV2 b256 measures 43.7k img/s
    # against the 30.0k "bound" it implies — XLA provably elides part
    # of the 1x1-chain traffic), so only the r4b depthwise term (dw3x3
    # is ~4.5 flops/byte and measured AT this wall, probe62) plus the
    # data-movement class below stay in the required set.
    _MATERIALIZING = {"MaxPool", "AveragePool", "LpPool",
                      "QLinearAveragePool", "QLinearConcat",
                      "DepthToSpace", "SpaceToDepth", "Resize", "Upsample"}

    def _edge_bytes(e: str) -> int:
        t = vt.get(e)
        if t is None or e in boundary or e in graph.initializers:
            return 0
        n = int(np.prod([int(d) for d in t.shape]))
        try:
            dt_ = np.dtype(t.np_dtype)
            # graph dtypes say f32 but compute_dtype is bf16 on TPU —
            # clamp float widths to 2 so the bound stays a LOWER bound;
            # int edges (int8 activations, index tensors) keep their
            # width (indices run int32 on device: clamp 8 -> 4)
            w = 2 if dt_.kind == "f" else min(dt_.itemsize, 4)
        except Exception:  # noqa: BLE001 — unknown dtype: assume bf16
            w = 2
        return n * w

    mat_bytes = 0
    for node in graph.nodes:
        if (node.op_type in _MATERIALIZING
                and node.op_type not in _SCATTER_OPS) \
                or _is_depthwise(node):
            # QLinearConcat's inputs are (y_scale, y_zp, X0, x0_s, ...):
            # the first DATA input sits at index 2
            di = 2 if node.op_type == "QLinearConcat" else 0
            if di < len(node.inputs):
                mat_bytes += _edge_bytes(node.inputs[di])
            mat_bytes += _edge_bytes(node.outputs[0])
    t_hbm = (io_bytes + w_bytes + scatter_bytes
             + mat_bytes) / TPU_V5E["hbm_gbps"]

    # MXU, VPU and HBM pipelines can overlap, so the unbeatable bound is
    # the max of the three (not their sum)
    sol = max(t_mxu, t_hbm, t_vpu)
    return {
        "t_mxu_s": t_mxu,
        "t_hbm_s": t_hbm,
        "t_vpu_s": t_vpu,
        "sol_s": sol,
        "bound": ("MXU" if sol == t_mxu
                  else "HBM" if sol == t_hbm else "VPU"),
        "mxu_int8_frac": (t_int8 / t_mxu) if t_mxu else 0.0,
        "flops": sum(c.flops for c in table if c.op_type in _MXU_OPS),
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--quant", default="none",
                   choices=["none", "fp16", "int8", "int8-conv",
                            "int8-static", "int8-pixel"])
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--layout", default="nhwc", choices=["nchw", "nhwc"])
    p.add_argument("--measure", action="store_true",
                   help="time the model on the current backend and print "
                        "achieved vs bound")
    args = p.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import smelter_tpu as st
    from smelter_tpu.models import ZOO

    if args.model not in ZOO:
        p.error(f"unknown model {args.model!r}")
    g, _tm, shape = ZOO[args.model](batch=args.batch,
                                    image_size=args.image_size)

    quant = None if args.quant == "none" else args.quant
    cfg = st.Config(compute_dtype=args.dtype)
    calib = None
    if quant in ("int8-static", "int8-pixel"):
        # offline calibration on a small random batch (CPU path does this
        # via a subprocess in bench.py; the roofline tool is offline)
        x_c = np.random.default_rng(0).standard_normal(
            (2,) + tuple(shape[1:])).astype(np.float32)
        calib = [(x_c,)]
    m = st.compile(g, cfg, quant=quant, layout=args.layout,
                   calibration_data=calib)

    rl = model_roofline(m.graph, cfg)
    sol_ips = args.batch / rl["sol_s"]
    result = {
        "model": args.model,
        "batch": args.batch,
        "quant": args.quant,
        "bound": rl["bound"],
        "t_mxu_ms": round(rl["t_mxu_s"] * 1e3, 3),
        "t_hbm_ms": round(rl["t_hbm_s"] * 1e3, 3),
        "t_vpu_ms": round(rl["t_vpu_s"] * 1e3, 3),
        "sol_img_s": round(sol_ips, 1),
        "mxu_int8_frac": round(rl["mxu_int8_frac"], 3),
    }
    if args.measure:
        from smelter_tpu.runtime.benchtime import chip_time

        x = jax.device_put(np.random.default_rng(0)
                           .standard_normal(shape).astype(np.float32))
        dt = chip_time(m._fn, m.params, x)
        result["measured_img_s"] = round(args.batch / dt, 1)
        result["achieved_pct_of_bound"] = round(100 * rl["sol_s"] / dt, 1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
