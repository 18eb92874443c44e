"""Converted-artifact cache: preprocessed graph + AOT-compiled executable.

SURVEY.md §5.4: the direct analog of the reference's ONNX2MPS "MPS-flavor"
file (reference: ONNX2MPS.py:98 writes producer_name='ONNX2MPS';
ONNXGraph.swift:99-100 detects it and skips runtime weight transposition).
Here the artifact is a directory:

    artifact/
      model.onnx        optimized+quantized graph (smelter-tpu producer tag)
      meta.json         engine/jax versions, config, platform, input shapes
      exec_<key>.xla    TRUE AOT: the pickled compiled XLA executable
                        (jax.experimental.serialize_executable). Loading it
                        skips import, passes, trace AND the XLA compile —
                        but only on the same jax version + backend.
      exec_<key>.bin    portable fallback: jax.export-serialized StableHLO.
                        Honest scope: this skips import/passes/trace but
                        NOT the XLA compile — first call on a deserialized
                        export recompiles (only a persistent compile cache
                        makes that cheap, and remote backends may not have
                        one).

Load preference: .xla (true AOT) -> .bin (trace skipped) -> live re-jit
from the stored graph (still skipping import/optimize/quantize). An
engine/jax version mismatch warns and skips the .xla path.
"""

from __future__ import annotations

import dataclasses
import json
import os
import warnings
from pathlib import Path

import numpy as np

from .. import __version__
from ..ir.graph import Graph
from ..ir.importer import PREPROCESSED_PRODUCER, load_model, save_model
from .config import Config
from .executor import Executor

_FORMAT_VERSION = 2


def _exec_key(platform: str, shapes) -> str:
    flat = "_".join("x".join(map(str, s)) for s in shapes)
    return f"{platform}_{flat}"


def save_artifact(path: str | os.PathLike, graph: Graph,
                  config: Config | None = None, compile_now: bool = True,
                  aot: bool = True) -> None:
    """Write the artifact dir; optionally AOT-compile for this host's
    default device platform. aot=True additionally stores the compiled
    XLA executable itself (true zero-compile load on a matching host)."""
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
        # dims is a dict (dropped by the scalar filter above) but shape
        # overrides decide which executable key matches on load — persist
        # it with string keys (JSON) and restore int axes in __init__.
        "dims": {str(k): v for k, v in (config.dims or {}).items()},
        "executables": {},
    }
    if compile_now:
        ex = Executor(graph, config)
        fn = jax.jit(ex.build_fn())
        in_shapes = ex.input_shapes()
        platform = jax.devices()[0].platform
        key = _exec_key(platform, [s.shape for s in in_shapes])
        exported = jax.export.export(fn)(ex.param_shapes(), *in_shapes)
        (path / f"exec_{key}.bin").write_bytes(exported.serialize())
        entry = {
            "platform": platform,
            "input_shapes": [list(s.shape) for s in in_shapes],
            "aot": False,
        }
        if aot:
            try:
                import pickle

                from jax.experimental import serialize_executable

                compiled = fn.lower(ex.param_shapes(), *in_shapes).compile()
                payload = serialize_executable.serialize(compiled)
                (path / f"exec_{key}.xla").write_bytes(pickle.dumps(payload))
                entry["aot"] = True
                # deserialize_and_load defaults execution_devices to ALL
                # local devices; an executable compiled for 1 device then
                # demands N input shards at execution and is rejected.
                # Record the compile-time device count so load pins the
                # execution devices to match.
                try:
                    sh = jax.tree_util.tree_leaves(
                        compiled.input_shardings[0])[0]
                    entry["device_count"] = len(sh.device_set)
                except Exception:  # noqa: BLE001
                    entry["device_count"] = 1
            except Exception as e:  # noqa: BLE001 — backend may not support it
                warnings.warn(
                    f"executable serialization unavailable on {platform} "
                    f"({type(e).__name__}); artifact keeps the StableHLO "
                    f"fallback only", stacklevel=2)
        meta["executables"][key] = entry
    (path / "meta.json").write_text(json.dumps(meta, indent=2))


class ArtifactModel:
    """A loaded artifact: params on device + the best available callable.

    `load_kind` reports what actually loaded: "aot" (compiled executable,
    zero compile), "stablehlo" (trace skipped, XLA compile still paid on
    first call), or "jit" (recompiled from the stored graph)."""

    def __init__(self, path: str | os.PathLike, config: Config | None = None):
        import jax

        path = Path(path)
        self.graph = load_model(path / "model.onnx")
        meta = json.loads((path / "meta.json").read_text())
        if meta.get("format_version", 0) > _FORMAT_VERSION:
            raise ValueError(f"artifact format {meta.get('format_version')} unsupported")
        if meta.get("jax_version") != jax.__version__:
            warnings.warn(
                f"artifact was compiled with jax {meta.get('jax_version')}, "
                f"this host runs {jax.__version__}: skipping the serialized "
                f"executable, recompiling from the stored graph", stacklevel=2)
        if meta.get("engine_version") != __version__:
            warnings.warn(
                f"artifact from engine {meta.get('engine_version')}, host has "
                f"{__version__}: graph semantics are stored (safe), but "
                f"consider re-exporting", stacklevel=2)
        cfg_dict = dict(meta.get("config", {}))
        if meta.get("dims"):
            cfg_dict["dims"] = {int(k) if k.lstrip("-").isdigit() else k: v
                                for k, v in meta["dims"].items()}
        if config is None:
            known = {f.name for f in dataclasses.fields(Config)}
            config = Config(**{k: v for k, v in cfg_dict.items() if k in known})
        self.config = config
        self.executor = Executor(self.graph, config)
        self.params = self.executor.init_params()
        self._fn = None
        self.load_kind = "jit"

        platform = jax.devices()[0].platform
        in_shapes = [tuple(s.shape) for s in self.executor.input_shapes()]
        key = _exec_key(platform, in_shapes)
        version_ok = meta.get("jax_version") == jax.__version__
        self._exe_path = path / f"exec_{key}.bin"
        xla_path = path / f"exec_{key}.xla"
        n_exec = meta.get("executables", {}).get(key, {}).get(
            "device_count", 1)
        if version_ok and xla_path.exists() and len(jax.devices()) >= n_exec:
            try:
                import pickle

                from jax.experimental import serialize_executable

                payload = pickle.loads(xla_path.read_bytes())
                # pin execution devices to the compile-time count — the
                # default (all local devices) makes a 1-device executable
                # demand N input shards and reject at execution
                self._fn = serialize_executable.deserialize_and_load(
                    *payload, execution_devices=jax.devices()[:n_exec])
                self.load_kind = "aot"
            except Exception:  # noqa: BLE001 — fall through to StableHLO
                self._fn = None
        if self._fn is None:
            self._load_fallback()

    def _load_fallback(self) -> None:
        """StableHLO export if present (skips the trace), else live jit."""
        import jax

        self._fn = None
        if self._exe_path.exists():
            try:
                rebuilt = jax.export.deserialize(self._exe_path.read_bytes())
                self._fn = rebuilt.call
                self.load_kind = "stablehlo"
            except Exception:  # noqa: BLE001
                self._fn = None
        if self._fn is None:
            self._fn = self.executor.jit()
            self.load_kind = "jit"

    @property
    def used_serialized(self) -> bool:  # backwards-compat alias
        return self.load_kind in ("aot", "stablehlo")

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
        try:
            outs = self._fn(self.params, *cast)
        except Exception as e:  # noqa: BLE001
            if self.load_kind != "aot":
                raise
            # Deserialized executables can be rejected at execution time
            # (device-assignment / machine-feature mismatch despite a
            # matching platform string): self-heal onto the portable path.
            warnings.warn(
                f"serialized executable rejected at execution "
                f"({type(e).__name__}); falling back to "
                f"StableHLO/recompile", stacklevel=2)
            self._load_fallback()
            outs = self._fn(self.params, *cast)
        return [np.asarray(o) for o in outs]


def load_artifact(path: str | os.PathLike, config: Config | None = None) -> ArtifactModel:
    return ArtifactModel(path, config)
