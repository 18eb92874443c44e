"""Internal fused ops emitted by optimizer passes.

FusedDequantMatMul(x, w_q:int8 (K,N), scales:(N,)) — lowers to the Pallas
fused dequant+matmul kernel when Config.use_pallas, else to the jnp
composite XLA fuses on its own. Handles batched x by flattening leading
dims (static shapes make this free)."""

from __future__ import annotations

import jax.numpy as jnp

from ..ir.graph import Node
from .registry import Ctx, register


@register("FusedDequantMatMul")
def fused_dequant_matmul(ctx: Ctx, node: Node):
    from ..kernels.dequant_matmul import dequant_matmul, dequant_matmul_reference

    x = ctx.get(node.inputs[0])
    q = ctx.get(node.inputs[1])
    s = ctx.get(node.inputs[2])
    use_pallas = bool(ctx.config is not None and getattr(ctx.config, "use_pallas", False))
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape((m, x.shape[-1]))
    if use_pallas:
        y = dequant_matmul(x2, q, s.reshape(-1))
    else:
        y = dequant_matmul_reference(x2, q, s.reshape(-1))
    ctx.set(node.outputs[0], y.reshape(lead + (q.shape[-1],)))
