"""Converted-artifact cache: preprocessed graph + AOT-compiled executable.

SURVEY.md §5.4: the direct analog of the reference's ONNX2MPS "MPS-flavor"
file (reference: ONNX2MPS.py:98 writes producer_name='ONNX2MPS';
ONNXGraph.swift:99-100 detects it and skips runtime weight transposition).
Here the artifact is a directory:

    artifact/
      model.onnx        optimized+quantized graph (smelter-tpu producer tag)
      meta.json         engine version, config, platform, input shapes
      exec_<key>.bin    jax.export-serialized compiled executable(s),
                        keyed by (platform, batch) — serving restarts skip
                        import, passes, trace AND XLA compile.

Loading falls back gracefully: exe missing or platform mismatch -> recompile
from the stored graph (still skipping import/optimize/quantize).
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path

import numpy as np

from .. import __version__
from ..ir.graph import Graph
from ..ir.importer import PREPROCESSED_PRODUCER, load_model, save_model
from .config import Config
from .executor import Executor

_FORMAT_VERSION = 1


def _exec_key(platform: str, shapes) -> str:
    flat = "_".join("x".join(map(str, s)) for s in shapes)
    return f"{platform}_{flat}"


def save_artifact(path: str | os.PathLike, graph: Graph,
                  config: Config | None = None, compile_now: bool = True) -> None:
    """Write the artifact dir; optionally AOT-compile for this host's
    default device platform and store the serialized executable."""
    import jax

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    graph.metadata.setdefault("optimized", "1")  # artifacts store final graphs
    save_model(graph, path / "model.onnx", producer=PREPROCESSED_PRODUCER)
    config = config or Config()
    meta = {
        "format_version": _FORMAT_VERSION,
        "engine_version": __version__,
        "jax_version": jax.__version__,
        "config": {k: v for k, v in dataclasses.asdict(config).items()
                   if isinstance(v, (int, float, str, bool, type(None)))},
        "executables": {},
    }
    if compile_now:
        ex = Executor(graph, config)
        fn = jax.jit(ex.build_fn())
        in_shapes = ex.input_shapes()
        platform = jax.devices()[0].platform
        exported = jax.export.export(fn)(ex.param_shapes(), *in_shapes)
        key = _exec_key(platform, [s.shape for s in in_shapes])
        (path / f"exec_{key}.bin").write_bytes(exported.serialize())
        meta["executables"][key] = {
            "platform": platform,
            "input_shapes": [list(s.shape) for s in in_shapes],
        }
    (path / "meta.json").write_text(json.dumps(meta, indent=2))


class ArtifactModel:
    """A loaded artifact: params on device + (deserialized or recompiled) fn."""

    def __init__(self, path: str | os.PathLike, config: Config | None = None):
        import jax

        path = Path(path)
        self.graph = load_model(path / "model.onnx")
        meta = json.loads((path / "meta.json").read_text())
        if meta.get("format_version") != _FORMAT_VERSION:
            raise ValueError(f"artifact format {meta.get('format_version')} unsupported")
        cfg_dict = dict(meta.get("config", {}))
        if config is None:
            known = {f.name for f in dataclasses.fields(Config)}
            config = Config(**{k: v for k, v in cfg_dict.items() if k in known})
        self.config = config
        self.executor = Executor(self.graph, config)
        self.params = self.executor.init_params()
        self._fn = None

        platform = jax.devices()[0].platform
        in_shapes = [tuple(s.shape) for s in self.executor.input_shapes()]
        key = _exec_key(platform, in_shapes)
        exe_path = path / f"exec_{key}.bin"
        self.used_serialized = False
        if exe_path.exists():
            try:
                rebuilt = jax.export.deserialize(exe_path.read_bytes())
                self._fn = rebuilt.call
                self.used_serialized = True
            except Exception:
                self._fn = None
        if self._fn is None:
            self._fn = self.executor.jit()

    def __call__(self, *inputs) -> list[np.ndarray]:
        import jax.numpy as jnp

        # The serialized executable's signature is strict (inputs in the
        # compute dtype); mirror the live executor's entry casts.
        expect = self.executor.input_shapes()
        cast = []
        for x, spec in zip(inputs, expect):
            xa = jnp.asarray(x)
            if (jnp.issubdtype(xa.dtype, jnp.floating)
                    and xa.dtype != spec.dtype):
                xa = xa.astype(spec.dtype)
            cast.append(xa)
        outs = self._fn(self.params, *cast)
        return [np.asarray(o) for o in outs]


def load_artifact(path: str | os.PathLike, config: Config | None = None) -> ArtifactModel:
    return ArtifactModel(path, config)
