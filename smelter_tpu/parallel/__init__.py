"""Parallelism: device meshes, sharding plans, multi-host runtime."""

from .mesh import MeshPlan, param_shardings, shard_inputs, shard_params  # noqa: F401
from .multihost import HostHealth, global_mesh, init_distributed, process_local_batch  # noqa: F401
from .pipeline import PipelinedModel, split_graph  # noqa: F401
from .ring_attention import ring_attention, sequence_sharded_attention  # noqa: F401
from .moe import MoELayer  # noqa: F401
