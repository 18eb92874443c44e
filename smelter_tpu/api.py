"""Convenience top-level API.

    import smelter_tpu as st

    model = st.compile("model.onnx", quant="int8")      # load+optimize+jit
    logits = model(images)                               # numpy in/out

    server = st.serve("model.onnx", max_batch=16)        # continuous batching
    fut = server.submit(image)

The load path mirrors the reference's two-phase flow (offline ONNX2MPS +
runtime detection of the preprocessed flavor, ONNXGraph.swift:98-103):
pre-optimized artifacts (producer == "smelter-tpu") skip the pass pipeline.
"""

from __future__ import annotations

import os

from .ir.graph import Graph
from .ir.importer import PREPROCESSED_PRODUCER, load_model
from .runtime.config import Config
from .runtime.executor import CompiledModel


def _prepare(model: str | os.PathLike | Graph, quant: str | None,
             optimize: bool, layout: str = "nhwc",
             calibration_data=None) -> Graph:
    g = load_model(model) if not isinstance(model, Graph) else model
    # Preprocessed detection needs BOTH the producer tag and the explicit
    # optimized flag the offline tool writes — a bare save_model also stamps
    # the producer, and that alone must not skip optimization.
    already = (g.producer == PREPROCESSED_PRODUCER
               and g.metadata.get("optimized") == "1")
    if optimize and not already:
        from .passes.pass_manager import run_passes

        run_passes(g)
    if quant == "int8-static":
        if g.metadata.get("quant") != quant:
            if calibration_data is None:
                raise ValueError(
                    "quant='int8-static' needs calibration_data: a list of "
                    "graph-input tuples, e.g. [(batch1,), (batch2,)]")
            from .quant import calibrate, quantize_static

            amax = calibrate(g, calibration_data)
            quantize_static(g, amax)
    elif quant == "int8-pixel":
        # Calibrated int8 over the NHCW pixel-conv trunks only (ESRGAN-
        # class decoders): int8 MXU + half the trunk's HBM bytes, while
        # everything outside the regions stays float — the measured best
        # envelope for huge-activation SR graphs (probe45, BENCHMARKS.md).
        if g.metadata.get("quant") != quant:
            if calibration_data is None:
                raise ValueError(
                    "quant='int8-pixel' needs calibration_data: a list of "
                    "graph-input tuples, e.g. [(batch1,), (batch2,)]")
            from .quant import calibrate, quantize_pixel_regions

            amax = calibrate(g, calibration_data)
            quantize_pixel_regions(g, amax)
    elif quant == "int8-conv":
        # Conv-family weights only: the right int8 envelope for transformer
        # graphs, where matmul weights are amortized over many rows and
        # dequant costs more than the bandwidth saved (docs/DESIGN.md,
        # probe8: ViT b128 int8-all -25% vs bf16).
        if g.metadata.get("quant") != quant:
            from .quant import quantize_weights

            quantize_weights(g, mode="int8", ops=("Conv", "ConvTranspose"))
            g.metadata["quant"] = "int8-conv"
    elif quant and g.metadata.get("quant") != quant:
        from .quant import quantize_weights

        quantize_weights(g, mode=quant)
    from .passes.pass_manager import run_passes

    if layout == "nhwc" and optimize and g.metadata.get("layout") != "nhwc":
        from .passes.layout import NHWC_PIPELINE

        run_passes(g, NHWC_PIPELINE)
    gq = g.metadata.get("quant", "")
    if gq == "int8" or (gq.startswith(("int4-g", "int8-g"))):
        # NOTE: fuse_dequant_conv1x1 measured 7x SLOWER end-to-end on
        # MobileNetV2 (experiments/tpu_probe4.py): the reshape->matmul
        # chains on large spatial maps break XLA's conv fusion. It stays
        # available as an explicit pass for serving-gemm-shaped graphs.
        # Grouped int4 fuses into FusedDequantMatMulI4 (packed nibbles —
        # mandatory on TPU, where s4 arrays are backend-unimplemented).
        run_passes(g, ["fuse_dequant_matmul"])
    run_passes(g, ["dce"])
    return g


def compile(model: str | os.PathLike | Graph, config: Config | None = None,
            quant: str | None = None, optimize: bool = True,
            layout: str = "nhwc", calibration_data=None) -> CompiledModel:
    """Load (path or Graph), optimize, optionally quantize, jit-compile.
    layout="nhwc" (default) rewrites 4-D CNN flow to the TPU-preferred
    channels-last layout; pass "nchw" to keep ONNX order.
    quant:
      None          — keep float weights.
      "fp16"        — fp16 weight-only.
      "int8"        — int8 weight-only, per-channel scales.
      "int8-conv"   — int8 weight-only on Conv/ConvTranspose ONLY (the
                      right envelope for transformer graphs, where matmul
                      dequant costs more than the bandwidth it saves).
      "int8-static" — full static int8 (activations + weights, folded
                      requant epilogues); requires calibration_data: a
                      list of graph-input tuples, e.g. [(batch1,), ...].
      "int8-pixel"  — calibrated int8 over NHCW pixel-conv regions only
                      (ESRGAN-class decoders; everything outside the
                      regions stays float); requires calibration_data."""
    return CompiledModel(
        _prepare(model, quant, optimize, layout, calibration_data), config)


def serve(model: str | os.PathLike | Graph, config: Config | None = None,
          quant: str | None = None, optimize: bool = True,
          layout: str = "nhwc", **server_kw):
    from .serving import InferenceServer

    return InferenceServer(_prepare(model, quant, optimize, layout), config,
                           **server_kw)
