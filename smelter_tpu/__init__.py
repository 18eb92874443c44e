"""smelter-tpu: a TPU-native ONNX inference framework.

Importer -> typed IR -> graph-rewrite passes -> weight-only quantization ->
JAX/XLA lowering with Pallas kernels for the hot ops -> sharded, jit-compiled
serving on TPU meshes.
"""

__version__ = "0.1.0"

from .ir.graph import Graph, Node, TensorType, ValueInfo  # noqa: F401
from .ir.importer import import_model, load_model, export_model, save_model  # noqa: F401
from .ir.build import GraphBuilder  # noqa: F401
from .runtime.config import Config  # noqa: F401,E402
from .runtime.executor import CompiledModel, Executor  # noqa: F401,E402
from .api import compile, serve  # noqa: F401,E402,A001
from .runtime.artifact import load_artifact, save_artifact  # noqa: F401,E402
from .runtime.generate import (  # noqa: F401,E402
    BatchedGenerator,
    FusedBatchedGenerator,
    FusedGenerator,
    Generator,
)
from .parallel import MeshPlan  # noqa: F401,E402
