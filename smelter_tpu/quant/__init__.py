"""Weight-only quantization: fp16 cast and int8 per-channel symmetric.

The reference supports fp16 weight storage with runtime conversion
(reference: ONNX2MPS.py:14-31 tensorsToType fp16 cast;
Converters.swift:82-89 fp16 weight path, :307-309 fp16 accumulation).
The TPU build goes further per the north star (BASELINE.json:5): INT8
weight-only with per-channel scales, lowered as standard ONNX
DequantizeLinear nodes that the Pallas fused dequant+conv/matmul kernels
pattern-match at execution time. Accuracy gate: top-1 delta <= 0.1% vs
FP32 (tests/test_quant.py).
"""

from .weight_quant import dequantize_array, quantize_array, quantize_weights  # noqa: F401

from .static_quant import calibrate, quantize_static  # noqa: F401

from .pixel_quant import quantize_pixel_regions  # noqa: F401
