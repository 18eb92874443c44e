"""Engine configuration.

One dataclass covering what the reference splits between
`ONNXGraph.Configuration` (reference: Sources/Smelter/ONNXGraph.swift:6-36 —
inputConstraint force-rescale, bilinear alignCorners, per-axis input dim
overrides) and the offline tool's CLI flags (ONNX2MPS.py:112-117 —
--half dtype policy), plus the TPU-specific knobs (compute dtype, Pallas
kernel toggle, mesh/sharding spec).
"""

from __future__ import annotations

import dataclasses
from typing import Any


@dataclasses.dataclass
class Config:
    # -- shape resolution ------------------------------------------------
    # dim overrides: str keys match ONNX dim_param names; int keys pin that
    # axis on every graph input (the reference's `dims: [Int: Int]`,
    # ONNXGraph.swift:25,201).
    dims: dict[str | int, int] = dataclasses.field(default_factory=dict)
    batch_size: int | None = None  # convenience: pins axis 0 of every input

    # -- input preprocessing ---------------------------------------------
    # Force-rescale graph inputs to the given spatial size before the graph
    # body (the reference's inputConstraint forceInputScale with Lanczos /
    # bilinear, ONNXGraph.swift:222-240). None disables.
    input_scale: str | None = None  # None | "bilinear" | "lanczos"
    input_size: tuple[int, int] | None = None
    # Per-channel (mean, std) applied on device as (x - mean)/std after an
    # optional uint8 -> float /255 conversion — lets clients POST raw
    # uint8 images (serving keeps preprocessing on the accelerator).
    normalize: tuple[tuple[float, ...], tuple[float, ...]] | None = None

    # -- numerics --------------------------------------------------------
    # Activation compute dtype: "float32" | "bfloat16" | "float16".
    compute_dtype: str = "float32"
    # Upsample linear mode alignCorners (reference default true,
    # ONNXGraph.swift:20).
    upsample_align_corners: bool = True
    # Gelu form: "auto" uses the tanh approximation under reduced compute
    # dtypes (error below bf16 resolution; erf costs ~40% more MLP time on
    # the VPU — probe14), "exact"/"tanh" force a form.
    gelu: str = "auto"

    # -- TPU execution ---------------------------------------------------
    use_pallas: bool = False  # hand-written hot kernels vs plain XLA lowering
    # Fused single-pass LayerNorm kernel (kernels/layer_norm.py). Wins its
    # microbench (0.375 vs 0.488 ms at ViT shapes, probe16) but LOSES
    # end-to-end (probe17: 57.0 vs 49.2 ms ViT-B b128) — the pallas_call
    # is a fusion barrier for the surrounding residual adds. Opt-in until
    # a fused residual+LN formulation lands; "auto" currently == False.
    fused_layernorm: bool | str = False
    # Execute fused dequant+matmul on the int8 MXU by dynamically
    # quantizing activations per-row (kernels/int8_matmul.py). Measured
    # 1.48x the bf16 fused path at serving-gemm shapes on v5e (213 vs 144
    # TOP/s, experiments/tpu_probe12.py); adds one activation rounding step
    # (<=0.4%/element). Off by default: weight-only numerics unchanged.
    int8_activations: bool = False
    # Packed-int4 kernel N-block override (kernels/int4_matmul.py): None
    # uses the measured auto policy (full rows within the VMEM budget);
    # an int forces block_n — the probe74 e2e sweep knob.
    int4_block_n: int | None = None
    # Ragged decode attention: the decode generators/servers rewrite the
    # step/verify graphs' masked cache attention into RaggedDecodeAttention
    # (passes/ragged_attention.py), whose TPU kernel reads only cache rows
    # <= pos instead of all max_len every token
    # (kernels/ragged_decode_attention.py; probe78: the dense form costs
    # 537 MB/step of K/V at 7B/4k, and the waste scales with server
    # occupancy). Numerics: dense-identical off-TPU; flash-streaming
    # summation order on TPU.
    ragged_attention: bool = False
    # Ragged-kernel cache row-block override (None = the auto policy:
    # largest block within the VMEM budget; bigger blocks amortize
    # per-grid-step latency at long positions — probe82's knob).
    ragged_block: int | None = None
    donate_inputs: bool = False
    # Sharding: name of a parallel.MeshPlan or None for single device.
    mesh: Any = None

    def resolve_dim(self, input_name: str, axis: int, dim) -> int | None:
        """Resolve one (possibly symbolic) input dim via overrides."""
        if isinstance(dim, int):
            if axis in self.dims and self.dims[axis] != dim:
                return int(self.dims[axis])
            return dim
        if axis == 0 and self.batch_size is not None:
            return int(self.batch_size)
        if isinstance(dim, str) and dim in self.dims:
            return int(self.dims[dim])
        if axis in self.dims:
            return int(self.dims[axis])
        return None
