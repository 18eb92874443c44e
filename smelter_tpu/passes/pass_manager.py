"""Graph rewrite pass pipeline.

The TPU-native analog of the reference's offline optimizer
(reference: ONNX2MPS.py:104-109 — onnx.checker validate, BN-into-Conv
fusion via onnx.optimizer, dtype cast, weight swizzle). Here passes are
first-class functions over the typed IR, composable and individually
tested. The default pipeline is what the offline tool and the engine's
`optimize=True` path run.
"""

from __future__ import annotations

from typing import Callable

from ..ir.graph import Graph

PassFn = Callable[[Graph], int]  # returns number of changes

_PASSES: dict[str, PassFn] = {}


def register_pass(name: str):
    def deco(fn: PassFn) -> PassFn:
        _PASSES[name] = fn
        return fn

    return deco


def get_pass(name: str) -> PassFn:
    return _PASSES[name]


def available_passes() -> list[str]:
    return sorted(_PASSES)


DEFAULT_PIPELINE = [
    "eliminate_nops",
    "fold_constants",
    "fuse_pad_conv",
    "fuse_bn_conv",
    "split_concat_conv",
    "subpixel_upsample_conv",
    "fold_constants",
    "fuse_attention",
    "fuse_qkv_attention",
    "eliminate_nops",
    "dce",
]


def run_passes(graph: Graph, pipeline: list[str] | None = None, verbose: bool = False) -> Graph:
    """Run the pipeline in place (returns the same graph for chaining)."""
    from . import (  # noqa: F401  (registration side effects)
        all_passes, decoder_fusion, fuse_attention, fuse_dequant, layout)

    for name in pipeline or DEFAULT_PIPELINE:
        n = _PASSES[name](graph)
        if verbose and n:
            print(f"[pass] {name}: {n} changes")
    return graph
