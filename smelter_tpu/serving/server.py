"""Continuous-batching inference server.

The reference's serving story is "the app encodes a command buffer per
image" (reference: README.md:29-52 — one image, one encode, synchronous
readback). For TPU serving the north star requires continuous batching of
concurrent requests (BASELINE.json:5). Design:

- requests enter a queue; a batcher thread drains up to max_batch of them,
  waiting at most max_wait_ms for stragglers;
- batch sizes are bucketed (powers of two up to max_batch) and one
  executable is compiled per bucket — no recompiles at serve time
  (SURVEY.md §7 hard part (d)); short batches are padded to the bucket;
- results fan back out through per-request futures;
- host readback synchronizes the device (see bench.py note on the axon
  tunnel) so measured latency is true end-to-end.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future

import numpy as np

from ..ir.graph import Graph
from ..runtime.config import Config
from ..runtime.executor import Executor
from .metrics import Metrics


class _Request:
    __slots__ = ("inputs", "future", "t_enqueue", "deadline")

    def __init__(self, inputs, timeout_ms: float | None = None):
        self.inputs = inputs
        self.future: Future = Future()
        self.t_enqueue = time.monotonic()
        self.deadline = (self.t_enqueue + timeout_ms / 1e3
                         if timeout_ms is not None else None)

    def expired(self, now: float) -> bool:
        return self.deadline is not None and now > self.deadline


class InferenceServer:
    def __init__(
        self,
        graph: Graph,
        config: Config | None = None,
        max_batch: int = 8,
        max_wait_ms: float = 2.0,
        buckets: tuple[int, ...] | None = None,
        eager_compile: bool = True,
        max_queue: int = 4096,
        health=None,
        host_id: str | None = None,
        heartbeat_interval_s: float = 2.0,
        on_membership_change=None,
    ):
        config = config or Config()
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        if buckets is None:
            buckets, b = [], 1
            while b < max_batch:
                buckets.append(b)
                b *= 2
            buckets.append(max_batch)
        self.buckets = tuple(sorted(set(buckets)))
        self.metrics = Metrics()

        # One executor per bucket: same graph, batch dim pinned per bucket.
        self._executors: dict[int, tuple[Executor, object, dict]] = {}
        self._shared_params: dict | None = None
        self._graph = graph
        self._config = config
        self._exec_lock = threading.Lock()

        # Bounded queue: overload sheds with a fast error instead of
        # unbounded latency growth (backpressure).
        self._queue: queue.Queue[_Request | None] = queue.Queue(maxsize=max_queue)
        self._running = True
        self._thread = threading.Thread(target=self._batch_loop, daemon=True)
        self._thread.start()
        # Warm every bucket OFF the request path (default): on a real TPU a
        # first-use compile inside the batch loop is a multi-minute
        # head-of-line stall. A request arriving before its bucket is warm
        # still compiles inline under the executor lock (correct, just
        # slow), so the warmer is pure benefit.
        self._warmer: threading.Thread | None = None
        if eager_compile:
            self._warmer = threading.Thread(target=self._warm_buckets,
                                            daemon=True)
            self._warmer.start()

        # Failure detection (SURVEY.md §5.3): the server emits its own
        # heartbeat into a shared HostHealth registry and sweeps it; when
        # membership shrinks it runs one deterministic re-init cycle
        # (callback to rebuild the mesh plan, then recompile executables).
        import os as _os

        self._health = health
        self._host_id = host_id or f"host-{_os.getpid()}"
        self._hb_interval = heartbeat_interval_s
        self._on_membership_change = on_membership_change
        self._health_thread: threading.Thread | None = None
        if health is not None:
            health.heartbeat(self._host_id)
            self._health_thread = threading.Thread(target=self._health_loop,
                                                   daemon=True)
            self._health_thread.start()

    def _warm_buckets(self) -> None:
        for b in self.buckets:
            if not self._running:
                return
            try:
                self._get_executor(b)
            except Exception:  # noqa: BLE001 — surface on first real use
                return

    # -- failure detection ----------------------------------------------

    def _health_loop(self) -> None:
        while self._running:
            self._health.heartbeat(self._host_id)
            lost = self._health.sweep()
            if lost and self._health.should_reinit(self._host_id):
                self._reinit_membership(lost)
            time.sleep(self._hb_interval)

    def _reinit_membership(self, lost: list[str]) -> None:
        """One recovery cycle: let the caller rebuild the mesh/config for
        the surviving set, then drop and re-warm every compiled bucket so
        new executables are laid out for the new topology."""
        self.metrics.record_reinit()
        if self._on_membership_change is not None:
            try:
                self._on_membership_change(lost, self._health.healthy_hosts())
            except Exception:  # noqa: BLE001 — recovery must not kill serving
                self.metrics.record_error()
        with self._exec_lock:
            self._executors.clear()
            self._shared_params = None
        self._warm_buckets()

    # -- compile ---------------------------------------------------------

    def _get_executor(self, bucket: int):
        with self._exec_lock:
            if bucket not in self._executors:
                import dataclasses

                cfg = dataclasses.replace(self._config, batch_size=bucket)
                ex = Executor(self._graph, cfg)
                plan = self._config.mesh  # a parallel.MeshPlan or None
                if plan is not None:
                    import jax

                    from ..parallel import param_shardings, shard_params

                    fn = jax.jit(
                        ex.build_fn(),
                        in_shardings=(param_shardings(ex, plan),
                                      plan.batch_sharding()),
                    )
                    if self._shared_params is None:
                        self._shared_params = shard_params(ex, plan)
                else:
                    fn = ex.jit()
                    if self._shared_params is None:
                        # Weights don't depend on the bucket: upload once and
                        # share device buffers across bucket executables.
                        self._shared_params = ex.init_params()
                self._executors[bucket] = (ex, fn, self._shared_params)
            return self._executors[bucket]

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    # -- public API ------------------------------------------------------

    def submit(self, *inputs: np.ndarray, timeout_ms: float | None = None) -> Future:
        """Enqueue one request (unbatched inputs, no leading batch dim).
        timeout_ms: end-to-end deadline — the future gets TimeoutError if
        the request is still queued at the deadline OR if its batch
        resolves after it (post-dispatch misses are counted in
        stats()['deadline_misses'])."""
        if not self._running:
            raise RuntimeError("server is shut down")
        req = _Request(inputs, timeout_ms)
        try:
            self._queue.put_nowait(req)
        except queue.Full:
            self.metrics.record_error()
            raise RuntimeError(
                f"server overloaded: queue depth {self._queue.maxsize} reached")
        return req.future

    def infer(self, *inputs: np.ndarray, timeout_ms: float | None = None):
        return self.submit(*inputs, timeout_ms=timeout_ms).result()

    def stats(self) -> dict:
        return self.metrics.snapshot()

    def shutdown(self, timeout: float = 10.0) -> None:
        self._running = False
        self._queue.put(None)
        self._thread.join(timeout)

    # -- batcher ---------------------------------------------------------

    def _collect(self, block: bool = True) -> list[_Request]:
        """Get the next batch. block=True waits for the first request;
        block=False returns [] almost immediately when the queue is idle
        (pipelined mode: the caller has a batch in flight to resolve)."""
        try:
            first = self._queue.get(timeout=None if block else 0.0005)
        except queue.Empty:
            return []
        if first is None:
            return []
        reqs = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(reqs) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                self._queue.put(None)
                break
            reqs.append(nxt)
        return reqs

    def _batch_loop(self) -> None:
        # Software pipeline: dispatch batch i, then collect batch i+1 while
        # the device executes i; resolve i's futures (host readback) only
        # after i+1 is dispatched. jax's async dispatch makes the device
        # and the host batcher overlap.
        pending: tuple[list[_Request], int, tuple] | None = None
        while self._running:
            # While a batch is in flight, don't block on the queue — an idle
            # queue must not delay resolving the in-flight batch's futures.
            reqs = self._collect(block=pending is None)
            if not reqs and not self._running:
                if pending is not None:
                    self._resolve(*pending)
                return
            now = time.monotonic()
            for r in [r for r in reqs if r.expired(now)]:
                self.metrics.record_error()
                r.future.set_exception(TimeoutError("request deadline exceeded"))
            reqs = [r for r in reqs if not r.expired(now)]
            dispatched = None
            if reqs:
                try:
                    dispatched = self._dispatch(reqs)
                except Exception as e:  # noqa: BLE001 — fail requests, not the loop
                    self.metrics.record_error(len(reqs))
                    for r in reqs:
                        if not r.future.done():
                            r.future.set_exception(e)
            if pending is not None:
                self._resolve(*pending)
            pending = dispatched
        # Shutdown: resolve the in-flight batch and fail anything queued.
        if pending is not None:
            self._resolve(*pending)
        while True:
            try:
                left = self._queue.get_nowait()
            except queue.Empty:
                break
            if left is not None and not left.future.done():
                left.future.set_exception(RuntimeError("server is shut down"))

    def _dispatch(self, reqs: list[_Request]):
        n = len(reqs)
        bucket = self._bucket_for(n)
        ex, fn, params = self._get_executor(bucket)
        n_inputs = len(reqs[0].inputs)
        batch_inputs = []
        for i in range(n_inputs):
            stacked = np.stack([r.inputs[i] for r in reqs])
            if bucket > n:
                pad = np.zeros((bucket - n,) + stacked.shape[1:], stacked.dtype)
                stacked = np.concatenate([stacked, pad])
            batch_inputs.append(stacked)
        outs = fn(params, *batch_inputs)  # async dispatch
        return reqs, bucket, outs

    def _resolve(self, reqs: list[_Request], bucket: int, outs) -> None:
        try:
            host_outs = [np.asarray(o) for o in outs]  # sync point
        except Exception as e:  # noqa: BLE001 — device-side failure
            self.metrics.record_error(len(reqs))
            for r in reqs:
                if not r.future.done():
                    r.future.set_exception(e)
            return
        t_done = time.monotonic()
        lat = [(t_done - r.t_enqueue) * 1e3 for r in reqs]
        self.metrics.record_batch(len(reqs), bucket, lat)
        for i, r in enumerate(reqs):
            if r.expired(t_done):
                # post-dispatch miss: the batch itself ran past the
                # deadline (e.g. a cold-bucket compile) — honor the SLA
                # and account for it rather than delivering late.
                self.metrics.record_deadline_miss()
                r.future.set_exception(
                    TimeoutError("request deadline exceeded during batch"))
            else:
                r.future.set_result([o[i] for o in host_outs])
