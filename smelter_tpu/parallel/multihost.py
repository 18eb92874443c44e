"""Multi-host runtime: distributed init, global meshes, host health.

SURVEY.md §5.3/§5.8: the reference is strictly single-process/single-device;
the TPU build's multi-host story is jax.distributed + a global Mesh whose
collectives XLA emits over ICI/DCN (no hand-written wire protocol — the
runtime IS the backend). This module wraps:

- `init_distributed()`: jax.distributed.initialize from env or explicit
  coordinator (idempotent, no-op single-host);
- `global_mesh(dp, tp)`: Mesh over all hosts' devices, tp packed within a
  host so tensor-parallel collectives ride ICI, dp across hosts/DCN;
- `HostHealth`: heartbeat registry + deterministic re-init decision — the
  minimum viable failure-detection for serving (full elasticity is out of
  scope for inference v1, SURVEY.md §5.3).
"""

from __future__ import annotations

import dataclasses
import os
import time

import numpy as np


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed when running multi-process. Returns True
    if distributed mode is active. Safe to call repeatedly / single-host."""
    import jax

    if num_processes is None:
        num_processes = int(os.environ.get("SMELTER_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator or os.environ["SMELTER_COORDINATOR"],
            num_processes=num_processes,
            process_id=process_id
            if process_id is not None
            else int(os.environ["SMELTER_PROCESS_ID"]),
        )
    except RuntimeError:
        pass  # already initialized
    return True


def global_mesh(tp: int | None = None):
    """(dp, tp) Mesh over all global devices. tp is chosen (or validated) to
    divide the per-host device count, so tensor-parallel collectives stay on
    ICI within a host; dp spans hosts over DCN."""
    import jax
    from .mesh import MeshPlan

    devices = jax.devices()
    per_host = max(1, len(devices) // max(1, jax.process_count()))
    if tp is None:
        for cand in (8, 4, 2, 1):
            if per_host % cand == 0:
                tp = cand
                break
    if per_host % tp != 0:
        raise ValueError(f"tp={tp} does not divide per-host device count {per_host}")
    return MeshPlan.for_devices(tp=tp, devices=devices)


def process_local_batch(global_batch: np.ndarray) -> np.ndarray:
    """Shard a host-resident global batch to this process's slice (dp across
    processes). Used by per-host serving front-ends."""
    import jax

    n = jax.process_count()
    if n == 1:
        return global_batch
    idx = jax.process_index()
    per = global_batch.shape[0] // n
    return global_batch[idx * per:(idx + 1) * per]


@dataclasses.dataclass
class HostState:
    host_id: str
    last_heartbeat: float
    healthy: bool = True


class HostHealth:
    """Heartbeat-based host health for a serving fleet. The decision rule is
    deterministic so every healthy host computes the same surviving set and
    can re-init from the checkpointed/sharded weights identically."""

    def __init__(self, timeout_s: float = 10.0):
        self.timeout_s = timeout_s
        self._hosts: dict[str, HostState] = {}

    def heartbeat(self, host_id: str, t: float | None = None) -> None:
        t = time.monotonic() if t is None else t
        st = self._hosts.get(host_id)
        if st is None:
            self._hosts[host_id] = HostState(host_id, t)
        else:
            st.last_heartbeat = t
            st.healthy = True

    def sweep(self, now: float | None = None) -> list[str]:
        """Mark hosts stale past timeout; returns newly-unhealthy host ids."""
        now = time.monotonic() if now is None else now
        newly = []
        for st in self._hosts.values():
            if st.healthy and now - st.last_heartbeat > self.timeout_s:
                st.healthy = False
                newly.append(st.host_id)
        return newly

    def healthy_hosts(self) -> list[str]:
        return sorted(h for h, st in self._hosts.items() if st.healthy)

    def should_reinit(self, my_host: str) -> bool:
        """True when membership changed such that meshes must be rebuilt
        (deterministic across hosts given the same heartbeat view)."""
        return my_host in self.healthy_hosts() and any(
            not st.healthy for st in self._hosts.values())
