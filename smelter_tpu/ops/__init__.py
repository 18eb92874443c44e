"""Op-lowering registry and all op implementations."""

from . import (  # noqa: F401  (registration side effects)
    contrib_ops,
    control_flow,
    detection,
    fused_ops,
    math_ops,
    misc_ops,
    nn,
    quant_ops,
    reduce_ops,
    sequence_ops,
    signal_ops,
    tensor_ops,
)
from .registry import Ctx, lower_node, register, registered_ops, resolve  # noqa: F401

ALL_OPS_LOADED = True
