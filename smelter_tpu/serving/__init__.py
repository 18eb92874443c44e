"""Serving layer: continuous batching + metrics."""

from .kv_pool import PagePool, PoolExhausted  # noqa: F401
from .metrics import Metrics  # noqa: F401
from .server import InferenceServer  # noqa: F401
