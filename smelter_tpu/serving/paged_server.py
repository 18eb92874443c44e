"""Paged continuous-batching decode server (single shared KV pool).

DecodeServer holds slots x max_len cache rows; BucketedDecodeServer
bounds that by length class. PagedDecodeServer removes the per-slot
reservation entirely: all slots share ONE pool of fixed-size pages per
layer (kernels/paged_decode_attention.py), each slot owns a page-table
row, and pages are allocated as sequences GROW and returned the moment
they finish — HBM is pages-in-use, fragmentation-free across arbitrary
length mixes (the vLLM serving memory model).

The step graph is BATCHED (models/llama_style.py::
build_decode_step_paged), not vmapped: the pool is one device buffer,
so slots cannot carry independent cache operands. Each tick runs one
jitted dispatch (argmax on device, pools donated) exactly like
DecodeServer's slot loop.

Two disciplines keep shared pages safe with zero in-graph masking:
- scratch page (kv_pool.PagePool(scratch=True)): dead/stalled slots'
  table rows point at reserved page 0, so their unconditional writes
  land there instead of corrupting re-assigned pages;
- backpressure, not eviction: when the pool cannot grow a slot this
  tick (PoolExhausted), the slot is STALLED — it still rides the
  batched dispatch (its row is pinned to the scratch page) but its
  result is not committed, and it resumes when pages free up. Requests
  are only rejected up front when they can never fit (> npg pages).

Reference scope: none (SURVEY.md §5.2 covers single-forward batching);
this is the BASELINE.json:5 serving-memory mandate carried to its end
state (docs/ROADMAP.md round-6 item 4).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future

import numpy as np

from .decode_server import _Slot, _heal_caches
from .kv_pool import PagePool, PoolExhausted


class PagedDecodeServer:
    """Continuous batching over a batched paged step graph.

    submit(prompt, n_new) -> Future of prompt+generated tokens (greedy;
    stop_tokens end early). Admission and growth are page-granular.
    """

    def __init__(self, step_graph, config=None,
                 stop_tokens: tuple[int, ...] = ()):
        import jax
        import jax.numpy as jnp

        from ..runtime.config import Config
        from ..runtime.executor import Executor

        cfg = config or Config()
        ex = Executor(step_graph, cfg)
        params = ex.init_params()
        self._params = params
        fn = ex.build_fn()
        self._input_names = [v.name for v in step_graph.inputs]
        shapes = {v.name: tuple(v.type.shape) for v in step_graph.inputs}
        self._pool_names = [n for n in self._input_names
                            if n.startswith(("k_pool_", "v_pool_",
                                             "k_scale_pool_",
                                             "v_scale_pool_"))]
        if not self._pool_names:
            raise ValueError("step graph has no k_pool_/v_pool_ inputs "
                             "(need build_decode_step_paged form)")
        self.slots, self.chunk = shapes["token"]
        if self.chunk != 1:
            raise NotImplementedError("paged server ticks at chunk=1")
        n_pages, page_size, _ = shapes[self._pool_names[0]]
        npg = shapes["page_table"][1]
        self.max_len = npg * page_size
        self.stop_tokens = set(stop_tokens)
        # ONE allocator for all layers: every layer's pool is indexed by
        # the same page table, so page p is "the" page p in all of them
        self.pool = PagePool(n_pages, page_size, self.slots, scratch=True)

        input_names = self._input_names
        pool_names = self._pool_names

        def step_all(prm, tokens, pos, table, pools):
            by = {"token": tokens, "pos": pos, "page_table": table}
            by.update(zip(pool_names, pools))
            outs = fn(prm, *[by[n] for n in input_names])
            # (B, 1, vocab) -> (B,) greedy tokens; readback stays tiny
            nxt = jnp.argmax(outs[0][:, -1, :], axis=-1).astype(jnp.int32)
            return nxt, list(outs[1:])

        self._step_all = jax.jit(step_all, donate_argnums=(4,))
        dts = {v.name: v.type.np_dtype for v in step_graph.inputs}
        self._pools = [jnp.zeros(shapes[n], dts[n]) for n in pool_names]
        self._table = self.pool.table(npg)
        self._npg = npg
        self._state = [_Slot() for _ in range(self.slots)]
        self._pending: queue.Queue = queue.Queue()
        self._lock = threading.Lock()
        self._shutdown = False
        self._wake = threading.Event()
        self._stall_ticks = 0  # observability: ticks with >=1 stalled slot
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- public API ------------------------------------------------------

    def submit(self, prompt: list[int], n_new: int,
               context=None) -> Future:
        fut: Future = Future()
        if context:
            fut.set_exception(ValueError(
                "PagedDecodeServer does not take context arrays"))
            return fut
        if not prompt:
            fut.set_exception(ValueError("prompt must be non-empty"))
            return fut
        if len(prompt) >= self.max_len:
            fut.set_exception(ValueError(
                f"prompt length {len(prompt)} >= table capacity "
                f"{self.max_len}"))
            return fut
        if n_new <= 0:
            fut.set_result(list(prompt))
            return fut
        self._pending.put((list(prompt), int(n_new), fut))
        self._wake.set()
        return fut

    def stats(self) -> dict:
        with self._lock:
            return {
                "slots": self.slots,
                "active": sum(s.active for s in self._state),
                "queued": self._pending.qsize(),
                "free_pages": self.pool.free_pages,
                "page_size": self.pool.page_size,
                "stall_ticks": self._stall_ticks,
            }

    def cache_bytes(self) -> int:
        """Device bytes of the shared pools (the whole pool is resident;
        pages-IN-USE is the scheduling quantity — see stats())."""
        return sum(int(np.prod(p.shape)) * p.dtype.itemsize
                   for p in self._pools)

    def shutdown(self) -> None:
        self._shutdown = True
        self._wake.set()
        self._thread.join(timeout=30)

    # -- slot loop -------------------------------------------------------

    def _admit(self) -> None:
        for i, s in enumerate(self._state):
            if s.active:
                continue
            try:
                prompt, n_new, fut = self._pending.get_nowait()
            except queue.Empty:
                return
            n_new = min(n_new, self.max_len - len(prompt))
            self._state[i] = _Slot(active=True, prompt=prompt, fed=0,
                                   generated=[], n_new=n_new,
                                   last_token=prompt[0], pos=0,
                                   future=fut)

    def _loop(self) -> None:
        import jax.numpy as jnp

        while not self._shutdown:
            with self._lock:
                self._admit()
                active = [i for i, s in enumerate(self._state)
                          if s.active]
            if not active:
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            # page growth BEFORE the dispatch; slots the pool cannot
            # grow are stalled (they ride along but do not commit)
            live: list[int] = []
            for i in active:
                s = self._state[i]
                try:
                    self.pool.ensure(i, s.pos + 1)
                    live.append(i)
                except PoolExhausted:
                    pass
            if not live:
                # every active slot is stalled: pages can only free when
                # a sequence finishes, and nothing can step — resolve the
                # deadlock by failing the least-progressed sequence(s)
                # until someone can move (their pages return to the pool)
                with self._lock:
                    self._stall_ticks += 1
                    for i in sorted(active,
                                    key=lambda j: self._state[j].pos):
                        s = self._state[i]
                        s.future.set_exception(PoolExhausted(
                            "page pool exhausted by longer sequences"))
                        self._state[i] = _Slot()
                        self.pool.release(i)
                        nxt_i = [j for j in active if self._state[j].active]
                        if any(self.pool.pages_for(self._state[j].pos + 1)
                               - len(self.pool.pages_of(j))
                               <= self.pool.free_pages for j in nxt_i):
                            break
                continue
            if len(live) < len(active):
                self._stall_ticks += 1
            self._table = self.pool.table(self._npg, out=self._table)
            tokens = np.zeros((self.slots, 1), np.int64)
            pos = np.zeros((self.slots,), np.int64)
            for i in active:
                # stalled slots ride with their REAL pos: pos >= their
                # page capacity, so table[i, pos // ps] hits the zero-
                # filled (scratch) region and their write is harmless;
                # only `live` slots commit results below
                s = self._state[i]
                tokens[i, 0] = s.last_token
                pos[i] = s.pos
            try:
                nxt, self._pools = self._step_all(
                    self._params, jnp.asarray(tokens), jnp.asarray(pos),
                    jnp.asarray(self._table), self._pools)
                nxt = np.asarray(nxt)
            except Exception as e:  # noqa: BLE001 — fail requests, keep
                # the serving thread; donated pools may be consumed
                with self._lock:
                    for i, s in enumerate(self._state):
                        if s.active and s.future is not None:
                            s.future.set_exception(e)
                        self._state[i] = _Slot()
                        self.pool.release(i)
                    self._pools, _ = _heal_caches(self._pools)
                continue
            with self._lock:
                for i in live:
                    s = self._state[i]
                    s.pos += 1
                    if s.fed + 1 < len(s.prompt):
                        s.fed += 1
                        s.last_token = s.prompt[s.fed]
                        continue
                    tok = int(nxt[i])
                    s.generated.append(tok)
                    s.last_token = tok
                    done = (len(s.generated) >= s.n_new
                            or tok in self.stop_tokens
                            or s.pos >= self.max_len)
                    if done:
                        s.future.set_result(list(s.prompt) + s.generated)
                        self._state[i] = _Slot()
                        self.pool.release(i)  # pages free THIS tick
        with self._lock:
            for s in self._state:
                if s.active and s.future is not None \
                        and not s.future.done():
                    s.future.set_exception(RuntimeError("server shut down"))
            while True:
                try:
                    *_rest, fut = self._pending.get_nowait()
                except queue.Empty:
                    break
                fut.set_exception(RuntimeError("server shut down"))
