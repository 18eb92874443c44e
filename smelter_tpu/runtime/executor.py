"""Graph executor: IR -> jittable JAX function -> compiled executable.

This is the TPU-native replacement for the reference's build-and-encode
path: where the reference dispatches converters per node to assemble an
MPSNNGraph that Apple's driver compiles (reference:
Sources/Smelter/ONNXGraph.swift:169-189), we walk the node list once under
jax tracing — each lowering emits XLA ops — and `jax.jit` compiles the
whole graph into one fused TPU executable. Weights become a params pytree
(shardable via NamedSharding), inputs are positional.

Shape inference falls out of the same walk via jax.eval_shape: the lowering
functions are the shape oracle, exactly as the reference reuses its padding
policies for build-time shape computation (Converters.swift:311-330).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..ir.errors import ShapeError, UnresolvedDimError
from ..ir.graph import Graph, TensorType
from ..ops import ALL_OPS_LOADED  # noqa: F401  (forces op registration)
from ..ops.registry import Ctx, lower_node
from ..utils import dtypes as dt
from .config import Config

def split_params(graph: Graph) -> tuple[list[str], list[str]]:
    """Partition initializer names into (runtime params, static-only).

    The static input positions are declared at each lowering's
    @register(..., static={...}) site (ops/registry.py) — an initializer
    used *only* in such positions never becomes a runtime param; it is
    folded into the compiled program (the analog of the reference
    folding Constant nodes into its tensor dict,
    Converters.swift:716-727)."""
    from ..ops.registry import static_positions

    dynamic: set[str] = set()
    static_only_candidates: set[str] = set(graph.initializers)
    for node in graph.nodes:
        static_pos = static_positions(node.op_type, graph.opset)
        for i, name in enumerate(node.inputs):
            if name in graph.initializers and i not in static_pos:
                dynamic.add(name)
    for name in graph.output_names:
        if name in graph.initializers:
            dynamic.add(name)
    params = sorted(dynamic)
    static_only = sorted(static_only_candidates - dynamic)
    return params, static_only


class Executor:
    """Builds and owns the jittable function for one graph."""

    def __init__(self, graph: Graph, config: Config | None = None):
        self.graph = graph
        self.config = config or Config()
        self.input_types = self._resolve_input_types()
        self.param_names, self.static_names = split_params(graph)
        # Fail at build time for unknown ops, like the reference's registry
        # dispatch (ONNXGraph.swift:172-176 throws unknownNodeOpType) —
        # jit tracing is lazy, so without this the error would only
        # surface on first call.
        from ..ops.registry import resolve

        for node in graph.nodes:
            resolve(node.op_type, graph.opset)

    # -- shapes ----------------------------------------------------------

    def _resolve_input_types(self) -> dict[str, TensorType]:
        out: dict[str, TensorType] = {}
        for vi in self.graph.inputs:
            if vi.type is None:
                raise ShapeError(f"graph input {vi.name!r} has no declared type")
            dims = []
            for axis, d in enumerate(vi.type.shape):
                r = self.config.resolve_dim(vi.name, axis, d)
                if r is None:
                    raise UnresolvedDimError(vi.name, axis, str(d))
                dims.append(r)
            out[vi.name] = TensorType(vi.type.dtype, tuple(dims))
        return out

    # -- params ----------------------------------------------------------

    def init_params(self, device=None) -> dict[str, jax.Array]:
        """Materialize the params pytree on device (weights stay in their
        stored dtype; quantized int8/fp16 arrays upload as-is). int4/uint4
        upcast to 8-bit off-CPU: s4 transfer AND on-device s4 convert are
        UNIMPLEMENTED on the TPU backend (probe: /tmp int4_check r4) —
        numerics are identical, only the storage halving is lost."""
        out = {}
        plat = getattr(device, "platform", None) or jax.default_backend()
        for name in self.param_names:
            arr = self._param_host(name, plat)
            out[name] = jax.device_put(jnp.asarray(arr), device)
        return out

    def _param_host(self, name: str, plat: str):
        arr = self.graph.initializers[name]
        if plat != "cpu" and arr.dtype.itemsize == 1 \
                and arr.dtype.name in ("int4", "uint4"):
            arr = arr.astype(np.int8 if arr.dtype.name == "int4"
                             else np.uint8)
        return arr

    def param_shapes(self) -> dict[str, jax.ShapeDtypeStruct]:
        plat = jax.default_backend()
        return {
            name: jax.ShapeDtypeStruct(
                self.graph.initializers[name].shape,
                self._param_host(name, plat).dtype,
            )
            for name in self.param_names
        }

    def input_shapes(self) -> list[jax.ShapeDtypeStruct]:
        return [
            jax.ShapeDtypeStruct(t.shape, self._compute_dtype(t))
            for t in (self.input_types[v.name] for v in self.graph.inputs)
        ]

    def _compute_dtype(self, t: TensorType):
        np_dtype = t.np_dtype
        if np_dtype.kind == "f" and self.config.compute_dtype != "float32":
            return jnp.dtype(self.config.compute_dtype)
        return np_dtype

    # -- the traced function --------------------------------------------

    def _preprocess_input(self, name: str, x):
        """Optional forced input rescale (ONNXGraph.swift:222-240 analog)."""
        cfg = self.config
        if cfg.input_scale is None:
            return x
        want = self.input_types[name].shape
        if x.ndim != 4:
            return x
        target = cfg.input_size or (want[2], want[3])
        if tuple(x.shape[2:]) == tuple(target):
            return x
        method = {"bilinear": "bilinear", "lanczos": "lanczos3"}[cfg.input_scale]
        return jax.image.resize(
            x, x.shape[:2] + tuple(target), method=method
        ).astype(x.dtype)

    def build_fn(self, return_all_edges: bool = False) -> Callable:
        graph, config = self.graph, self.config
        input_names = graph.input_names
        output_names = graph.output_names

        # Params that must keep full precision under a reduced compute
        # dtype: quantization scales/zero-points (rounding them to bf16
        # would corrupt dequantization).
        precision_critical: set[str] = set()
        _SCALE_POS = {
            "DequantizeLinear": (1, 2),
            "FusedDequantMatMul": (2,),
            # grouped scales (2) feed the int4 kernel's f32 partial-dot
            # epilogue; bf16-rounding them costs ~0.4% per group scale
            "FusedDequantMatMulI4": (2,),
            # scales (2) and bias (3) feed the kernel's f32 epilogue
            "PixelConvQ": (2, 3),
        }
        for node in graph.nodes:
            if node.op_type.startswith("Q"):
                # Every Q-op input may be a scale/zero-point (QuantizeLinear,
                # QLinearConv/MatMul, and the whole ORT QOperator family:
                # QGemm, QLinearAdd/Mul/Sigmoid/LeakyRelu/pools/Concat).
                # Quantized int8/uint8 data inputs are unaffected — the
                # bf16 cast below only touches float32 params.
                precision_critical.update(n for n in node.inputs if n)
                continue
            for pos in _SCALE_POS.get(node.op_type, ()):
                if pos < len(node.inputs):
                    precision_critical.add(node.inputs[pos])

        def fn(params: dict[str, Any], *inputs):
            if len(inputs) != len(input_names):
                raise TypeError(
                    f"model expects {len(input_names)} input(s) "
                    f"{input_names}, got {len(inputs)}")
            env: dict[str, Any] = {}
            cd0 = jnp.dtype(config.compute_dtype)
            for name in self.param_names:
                v = params[name]
                # Keep activations in the compute dtype end-to-end: a float32
                # param flowing into Concat/Add would otherwise promote the
                # whole downstream graph to f32 (jnp type promotion).
                if (cd0 != jnp.float32 and hasattr(v, "dtype")
                        and v.dtype == jnp.float32
                        and name not in precision_critical):
                    v = v.astype(cd0)
                env[name] = v
            cd = cd0
            for name, x in zip(input_names, inputs):
                x = jnp.asarray(x)
                if config.normalize is not None and x.ndim == 4:
                    mean, std = config.normalize
                    if x.dtype == jnp.uint8:
                        x = x.astype(cd) / jnp.asarray(255.0, cd)
                    m = jnp.asarray(mean, cd).reshape(1, -1, 1, 1)
                    sd = jnp.asarray(std, cd).reshape(1, -1, 1, 1)
                    x = (x.astype(cd) - m) / sd
                if jnp.issubdtype(x.dtype, jnp.floating) and x.dtype != cd:
                    x = x.astype(cd)
                env[name] = self._preprocess_input(name, x)
            ctx = Ctx(graph, env, config)
            for node in graph.nodes:
                lower_node(ctx, node)
            if return_all_edges:
                return dict(env)
            return tuple(env[o] for o in output_names)

        return fn

    # -- compile & run ---------------------------------------------------

    def jit(self, donate_params: bool = False) -> Callable:
        fn = self.build_fn()
        donate: tuple[int, ...] = (0,) if donate_params else ()
        if self.config.donate_inputs:
            # Donate input buffers (args 1..N): serving uploads a fresh
            # batch per call, so the previous buffer can be reused in-place.
            donate = donate + tuple(range(1, 1 + len(self.graph.inputs)))
        return jax.jit(fn, donate_argnums=donate)

    def infer_value_types(self) -> dict[str, TensorType]:
        """Populate graph.value_types for every edge via abstract eval."""
        fn = self.build_fn(return_all_edges=True)
        out = jax.eval_shape(fn, self.param_shapes(), *self.input_shapes())
        types = {}
        for name, s in out.items():
            if not hasattr(s, "dtype"):
                continue  # sequence-valued edge (tuple of tensors)
            try:
                code = dt.numpy_to_onnx_dtype(np.dtype(s.dtype))
            except ValueError:
                continue
            types[name] = TensorType(code, tuple(int(d) for d in s.shape))
        self.graph.value_types.update(types)
        return types


class CompiledModel:
    """User-facing handle: params resident on device + compiled callable.

    The analog of holding an MPSNNGraph ready to encode (reference:
    README.md:29-52 usage) — but ahead-of-time compiled and reusable across
    requests with zero per-call graph work.
    """

    def __init__(self, graph: Graph, config: Config | None = None):
        self.executor = Executor(graph, config)
        self.params = self.executor.init_params()
        self._fn = self.executor.jit()

    @property
    def graph(self) -> Graph:
        return self.executor.graph

    def __call__(self, *inputs) -> list[np.ndarray]:
        outs = self._fn(self.params, *inputs)
        return [np.asarray(o) for o in outs]

    def run_device(self, *inputs):
        """Run without host readback (stays on device for chaining)."""
        return self._fn(self.params, *inputs)
