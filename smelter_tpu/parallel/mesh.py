"""Device mesh + sharding plans: data-parallel batch sharding and
tensor-parallel weight sharding over a (dp, tp) mesh.

The reference has no distributed layer at all (SURVEY.md §2 note: one
process, one Metal device); this module supplies the TPU-native design the
north star requires (BASELINE.json:5 — weights tensor-sharded across a
multi-host v5e/v5p slice, collectives overlapped with compute): annotate
params/inputs with NamedSharding over a Mesh and let XLA's SPMD partitioner
insert all-gather/reduce-scatter over ICI. The same program runs on a
virtual CPU mesh in CI and on real slices in production — only the mesh
changes.

Sharding policy (inference TP):
- Conv weights (O, I, kh, kw): shard O over tp -> channel-sharded
  activations; XLA all-gathers at ops needing full channels.
- Gemm weight with transB (N, K) / MatMul rhs (K, N): shard the output-
  feature axis over tp (column-parallel linear).
- Per-channel vectors (bias/BN/scales): shard over tp when divisible.
- Batch axis of inputs: shard over dp.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ir.graph import Graph


def _role_map(graph: Graph) -> dict[str, tuple[str, int]]:
    """param name -> (role, tp_axis). tp_axis = which axis to shard over tp."""
    roles: dict[str, tuple[str, int]] = {}
    for node in graph.nodes:
        ins = node.inputs
        if node.op_type == "Conv" and len(ins) > 1:
            roles.setdefault(ins[1], ("conv_w", 0))
            if len(ins) > 2 and ins[2]:
                roles.setdefault(ins[2], ("vector", 0))
        elif node.op_type == "ConvTranspose" and len(ins) > 1:
            roles.setdefault(ins[1], ("convt_w", 1))  # (Cin, Cout/g, kh, kw)
            if len(ins) > 2 and ins[2]:
                roles.setdefault(ins[2], ("vector", 0))
        elif node.op_type == "Gemm" and len(ins) > 1:
            trans_b = bool(node.attr("transB", 0))
            roles.setdefault(ins[1], ("gemm_w", 0 if trans_b else 1))
            if len(ins) > 2 and ins[2]:
                roles.setdefault(ins[2], ("vector", 0))
        elif node.op_type == "MatMul" and len(ins) > 1:
            roles.setdefault(ins[1], ("matmul_rhs", -1))  # last axis
        elif node.op_type == "FusedDequantMatMul" and len(ins) > 2:
            # int8 weight (K, N) + per-column scales (N,): column-parallel
            roles.setdefault(ins[1], ("matmul_rhs", -1))
            roles.setdefault(ins[2], ("vector", 0))
        elif node.op_type == "FusedDequantMatMulI4" and len(ins) > 2:
            # packed (K/2, N) + grouped scales (2*ngh, N): both split on N;
            # the kernel carries a custom_partitioning rule for this
            roles.setdefault(ins[1], ("matmul_rhs", -1))
            roles.setdefault(ins[2], ("matmul_rhs", -1))
        elif node.op_type in ("BatchNormalization", "InstanceNormalization",
                              "LayerNormalization", "GroupNormalization"):
            for name in ins[1:]:
                if name:
                    roles.setdefault(name, ("vector", 0))
    return roles


@dataclasses.dataclass
class MeshPlan:
    """A concrete mesh + axis names for dp/tp sharding."""

    mesh: Mesh
    dp_axis: str = "dp"
    tp_axis: str = "tp"

    @classmethod
    def for_devices(cls, n_devices: int | None = None, tp: int | None = None,
                    devices=None) -> "MeshPlan":
        if devices is None:
            devices = jax.devices()
            if n_devices is not None:
                devices = devices[:n_devices]
        n = len(devices)
        if tp is None:
            # Prefer a modest TP degree that divides the device count.
            for cand in (4, 2, 1):
                if n % cand == 0 and cand <= n:
                    tp = cand
                    break
        dp = n // tp
        mesh = Mesh(np.asarray(devices).reshape(dp, tp), ("dp", "tp"))
        return cls(mesh=mesh)

    @property
    def tp_size(self) -> int:
        return self.mesh.shape[self.tp_axis]

    @property
    def dp_size(self) -> int:
        return self.mesh.shape[self.dp_axis]

    def batch_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(self.dp_axis))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def param_sharding(self, shape: tuple[int, ...], role: str, axis: int) -> NamedSharding:
        tp = self.tp_size
        if tp == 1 or not shape:
            return self.replicated()
        if axis < 0:
            axis += len(shape)
        if axis < len(shape) and shape[axis] % tp == 0 and shape[axis] >= tp:
            spec = [None] * len(shape)
            spec[axis] = self.tp_axis
            return NamedSharding(self.mesh, P(*spec))
        return self.replicated()


def param_shardings(executor, plan: MeshPlan) -> dict[str, NamedSharding]:
    """NamedSharding per runtime param, driven by each weight's graph role."""
    graph = executor.graph
    roles = _role_map(graph)
    out: dict[str, NamedSharding] = {}
    for name in executor.param_names:
        arr = graph.initializers[name]
        role, axis = roles.get(name, ("other", -1))
        if role == "other":
            out[name] = plan.replicated()
        else:
            out[name] = plan.param_sharding(arr.shape, role, axis)
    return out


def shard_params(executor, plan: MeshPlan, shardings_only: bool = False):
    """device_put every param with its sharding (or return just shardings)."""
    shardings = param_shardings(executor, plan)
    if shardings_only:
        return shardings
    graph = executor.graph
    import jax.numpy as jnp

    return {
        name: jax.device_put(jnp.asarray(graph.initializers[name]), shardings[name])
        for name in executor.param_names
    }


def shard_inputs(plan: MeshPlan, *arrays):
    return tuple(jax.device_put(a, plan.batch_sharding()) for a in arrays)
