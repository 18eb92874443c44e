"""Op-lowering registry and all op implementations."""

from . import control_flow, fused_ops, math_ops, nn, quant_ops, reduce_ops, tensor_ops  # noqa: F401  (registration side effects)
from .registry import Ctx, lower_node, register, registered_ops, resolve  # noqa: F401

ALL_OPS_LOADED = True
