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

from .decode_server import _Slot, _build_prefill_ladder, _heal_caches
from .kv_pool import PagePool, PoolExhausted


def _build_paged_prefill_ladder(graphs, params, host_map, cfg):
    """(plen, jitted prefill+pool-scatter) ladder: the DENSE prefill
    forward (build_prefill twins, weights merged by name+content) whose
    outputs[1:] — the filled cache rows in pool-input order, the
    DecodeServer positional contract — are paged-written into one
    slot's pages at pos 0, all in ONE dispatch. Pools are donated;
    callers heal via _heal_caches on failure."""
    import jax
    import jax.numpy as jnp

    from ..kernels.paged_decode_attention import paged_cache_update
    from ..runtime.generate import _merge_params

    out = []
    for g in graphs:
        pex = _merge_params(params, host_map, g, cfg)
        plen = next(v.type.shape[0] for v in g.inputs
                    if v.name == "tokens")

        def prefill_set(p_, toks, table_row, pools,
                        f=pex.build_fn(), plen=plen):
            outs = f(p_, toks)
            tb = table_row[None]
            z = jnp.zeros((1,), jnp.int32)
            new = [paged_cache_update(pool, tb, z, rows[:plen][None])
                   for pool, rows in zip(pools, outs[1:])]
            return outs[0], new

        out.append((plen, jax.jit(prefill_set, donate_argnums=(3,))))
    out.sort(key=lambda t: t[0])
    return out


class PagedDecodeServer:
    """Continuous batching over a batched paged step graph.

    submit(prompt, n_new) -> Future of prompt+generated tokens (greedy;
    stop_tokens end early). Admission and growth are page-granular.
    """

    def __init__(self, step_graph, config=None,
                 stop_tokens: tuple[int, ...] = (), prefill_graphs=(),
                 tick_steps: int = 1):
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
        T = self.tick_steps = max(1, int(tick_steps))

        def step_multi(prm, tokens, pos, forced, nf, table, pools):
            # T chained steps per dispatch (the probe83b amortization):
            # prompt tokens ride in `forced`, generated ones chain
            # on-device via argmax; readback is (B, T). Slots must have
            # T rows of page headroom (the host stalls them otherwise).
            from jax import lax

            def body(carry, j):
                pools_, tk = carry
                by = {"token": tk[:, None].astype(tokens.dtype),
                      "pos": pos + j, "page_table": table}
                by.update(zip(pool_names, pools_))
                outs = fn(prm, *[by[n] for n in input_names])
                out = jnp.argmax(outs[0][:, -1, :],
                                 axis=-1).astype(jnp.int32)
                nxt = jnp.where(j < nf,
                                forced[:, jnp.minimum(j, T - 2)], out)
                return (list(outs[1:]), nxt), out

            (pools_out, _), outs = lax.scan(
                body, (list(pools), tokens.astype(jnp.int32)),
                jnp.arange(T))
            # outs (T, B) -> (B, T)
            return outs.T, pools_out

        self._step_multi = (jax.jit(step_multi, donate_argnums=(6,))
                            if T > 1 else None)
        # Prefill admission: dense prefill + pool scatter in one
        # dispatch (_build_paged_prefill_ladder). Pad-up rows beyond
        # the prompt are write-before-read like everywhere else; rows
        # beyond the slot's owned pages land on the scratch page
        # (table zero-fill) and are rewritten when decode reaches them.
        host_map = {n: step_graph.initializers[n] for n in ex.param_names}
        self._prefills = _build_paged_prefill_ladder(
            prefill_graphs, params, host_map, cfg)
        # post-policy dtypes: floating pools come back in the executor's
        # compute dtype and are carried (scan at T>1, re-fed at T=1) —
        # a f32 seed against bf16 outputs is a carry-type error
        from ..runtime.generate import _cache_dtypes

        dts = _cache_dtypes(step_graph, cfg, pool_names)
        self._pools = [jnp.zeros(shapes[n], d)
                       for n, d in zip(pool_names, dts)]
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

    def _prefill_slot(self, i: int, prompt: list[int]):
        """Fill slot i's pages with one prefill forward (smallest
        bucket >= len(prompt), pad-up safe; longer prompts fill the
        largest bucket and feed the rest per tick). Allocates pages for
        the PROMPT rows only — pad rows beyond the owned pages land on
        the scratch page. Returns (fed, first_token|None) like
        DecodeServer._prefill_slot. Raises PoolExhausted when the pool
        cannot hold the prompt right now (caller falls back to per-tick
        feeding, which stalls gracefully)."""
        import jax.numpy as jnp

        n = len(prompt)
        buckets = [p for p, _ in self._prefills]
        ups = [p for p in buckets if p >= n]
        p_len = min(ups) if ups else max(buckets)
        eff = min(n, p_len)
        self.pool.ensure(i, eff)
        self._table = self.pool.table(self._npg, out=self._table)
        fn = dict(self._prefills)[p_len]
        toks = np.zeros((p_len,), np.int64)
        toks[:eff] = prompt[:eff]
        logits, self._pools = fn(self._params, jnp.asarray(toks),
                                 jnp.asarray(self._table[i]),
                                 self._pools)
        first = (int(np.asarray(logits[eff - 1]).argmax())
                 if eff == n else None)
        return eff - 1, first

    def _admit(self) -> None:
        for i, s in enumerate(self._state):
            if s.active:
                continue
            try:
                prompt, n_new, fut = self._pending.get_nowait()
            except queue.Empty:
                return
            n_new = min(n_new, self.max_len - len(prompt))
            fed = pos = 0
            last = prompt[0]
            generated: list[int] = []
            if self._prefills and len(prompt) > 1:
                try:
                    fed, first = self._prefill_slot(i, prompt)
                    if first is not None:
                        generated = [first]
                        pos, last = len(prompt), first
                        if (len(generated) >= n_new
                                or first in self.stop_tokens):
                            fut.set_result(list(prompt) + generated)
                            self.pool.release(i)
                            continue
                    else:  # partial prefill: feed the rest per tick
                        pos, last = fed, prompt[fed]
                except PoolExhausted:
                    fed = pos = 0  # per-tick feeding stalls gracefully
                except Exception:  # noqa: BLE001 — donated pools may be
                    # consumed by a failed prefill call: heal; zeroed
                    # pools destroy every occupant's cache, so fail the
                    # in-flight requests loudly instead of serving junk
                    fed = pos = 0
                    self._pools, n_lost = _heal_caches(self._pools)
                    if n_lost:
                        for k, sk in enumerate(self._state):
                            if sk.active and sk.future is not None:
                                sk.future.set_exception(RuntimeError(
                                    "prefill failure consumed the KV "
                                    "pools"))
                                self._state[k] = _Slot()
                                self.pool.release(k)
            self._state[i] = _Slot(active=True, prompt=prompt, fed=fed,
                                   generated=generated, n_new=n_new,
                                   last_token=last, pos=pos,
                                   future=fut)

    def _loop(self) -> None:
        import jax.numpy as jnp

        T = self.tick_steps
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
            # grow are stalled (they ride along but do not commit).
            # Multi-step ticks need T rows of headroom (capped at the
            # table capacity so the last tokens of a max-length
            # sequence do not stall forever).
            live: list[int] = []
            for i in active:
                s = self._state[i]
                try:
                    self.pool.ensure(i, min(s.pos + T, self.max_len))
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
            # stalled slots ride with their REAL pos: pos >= their page
            # capacity, so table[i, pos // ps] hits the zero-filled
            # (scratch) region and their writes are harmless; only
            # `live` slots commit results below
            if T > 1:
                tokens = np.zeros((self.slots,), np.int64)
                pos = np.zeros((self.slots,), np.int64)
                forced = np.zeros((self.slots, max(T - 1, 1)), np.int32)
                nf = np.zeros((self.slots,), np.int32)
                for i in active:
                    s = self._state[i]
                    tokens[i] = s.last_token
                    pos[i] = s.pos
                    nxt_prompt = s.prompt[s.pos + 1:s.pos + T]
                    nf[i] = len(nxt_prompt)
                    forced[i, :len(nxt_prompt)] = nxt_prompt
            else:
                tokens = np.zeros((self.slots, 1), np.int64)
                pos = np.zeros((self.slots,), np.int64)
                for i in active:
                    s = self._state[i]
                    tokens[i, 0] = s.last_token
                    pos[i] = s.pos
            try:
                if T > 1:
                    nxt, self._pools = self._step_multi(
                        self._params, jnp.asarray(tokens),
                        jnp.asarray(pos), jnp.asarray(forced),
                        jnp.asarray(nf), jnp.asarray(self._table),
                        self._pools)
                else:
                    nxt, self._pools = self._step_all(
                        self._params, jnp.asarray(tokens),
                        jnp.asarray(pos), jnp.asarray(self._table),
                        self._pools)
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
                    if T > 1:
                        # nxt[i, j] predicts sequence position
                        # s.pos + j + 1; those past the prompt are
                        # generated (greedy chain on device)
                        plen = len(s.prompt)
                        start = s.pos
                        s.pos = min(start + T, self.max_len)
                        s.fed = min(plen - 1, s.pos)
                        done = False
                        for j in range(T):
                            idx = start + j + 1
                            if idx < plen:
                                continue
                            tok = int(nxt[i, j])
                            s.generated.append(tok)
                            if (len(s.generated) >= s.n_new
                                    or tok in self.stop_tokens
                                    or idx >= self.max_len):
                                done = True
                                s.generated = s.generated[:s.n_new]
                                break
                        if done:
                            s.future.set_result(
                                list(s.prompt) + s.generated)
                            self._state[i] = _Slot()
                            self.pool.release(i)
                        else:
                            seq = s.prompt + s.generated
                            s.last_token = seq[s.pos] \
                                if s.pos < len(seq) else seq[-1]
                        continue
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


class SpecPagedDecodeServer:
    """Speculative continuous batching over the paged pool: every tick
    runs gamma vmapped draft steps (small dense per-slot caches) plus
    ONE batched paged chunk-verify across all slots — SpecDecodeServer's
    tick shape with the target's KV memory paged. The draft keeps flat
    slot-local caches (a 4L/256d draft's caches are ~1% of the target's
    — paging them would buy nothing); the target, where the bytes live,
    allocates pages as sequences grow and frees them on finish.

    chunk_graph must be a build_decode_step_paged(chunk=gamma+1, slots=B)
    graph; draft_graph a plain build_decode_step twin (merged into the
    same uploaded weight set by name+content, so an early-exit
    self-draft shares every layer buffer on device).

    Safety composes from the two servers' disciplines: rejected-draft
    target rows are overwritten before ever being attended (write-
    before-read, row i attends <= pos+i); stalled slots ride the
    dispatch with real pos so their target writes land on the scratch
    page and their round is simply not committed; draft-cache writes of
    a stalled slot hit its OWN rows and are rewritten on resume.
    """

    def __init__(self, chunk_graph, draft_graph, config=None,
                 draft_config=None, stop_tokens: tuple[int, ...] = (),
                 prefill_graphs=(), draft_prefill_graphs=(),
                 rounds_per_tick: int = 1):
        import jax
        import jax.numpy as jnp

        from ..runtime.config import Config
        from ..runtime.executor import Executor
        from ..runtime.generate import (_cache_dtypes, _decode_graph,
                                        _merge_params)

        cfg = config or Config()
        dcfg = draft_config or cfg
        draft_graph = _decode_graph(draft_graph, dcfg)
        ex_t = Executor(chunk_graph, cfg)
        params = ex_t.init_params()
        host = {n: chunk_graph.initializers[n] for n in ex_t.param_names}
        chunk_fn = ex_t.build_fn()
        ex_d = _merge_params(params, host, draft_graph, dcfg)
        draft_graph = ex_d.graph
        step_d = ex_d.build_fn()
        self._params = params

        in_t = [v.name for v in chunk_graph.inputs]
        in_d = [v.name for v in draft_graph.inputs]
        cn_d = [n for n in in_d if n.startswith(("k_cache_", "v_cache_"))]
        shapes_t = {v.name: tuple(v.type.shape)
                    for v in chunk_graph.inputs}
        shapes_d = {v.name: tuple(v.type.shape)
                    for v in draft_graph.inputs}
        dts_d = _cache_dtypes(draft_graph, dcfg, cn_d)
        self._pool_names = [n for n in in_t
                            if n.startswith(("k_pool_", "v_pool_",
                                             "k_scale_pool_",
                                             "v_scale_pool_"))]
        self.slots, c = shapes_t["token"]
        gamma = c - 1
        if gamma < 1:
            raise ValueError("chunk graph must take >= 2 tokens")
        self.gamma = gamma
        n_pages, page_size, _ = shapes_t[self._pool_names[0]]
        npg = shapes_t["page_table"][1]
        self.max_len = min(npg * page_size, shapes_d[cn_d[0]][0])
        self.stop_tokens = set(stop_tokens)
        self.pool = PagePool(n_pages, page_size, self.slots,
                             scratch=True)
        # target prefill: dense forward + pool scatter (paged ladder);
        # draft prefill: the flat per-slot ladder DecodeServer uses —
        # a zeroed draft cache only degrades acceptance, never
        # correctness (the verify chunk is the target)
        self._prefills = _build_paged_prefill_ladder(
            prefill_graphs, params, host, cfg)
        self._d_prefills = _build_prefill_ladder(
            draft_prefill_graphs, params, host, dcfg)

        def round_all(prm, tok, prev, pos, forced, n_forced, free,
                      table, t_pools, d_caches):
            # gamma vmapped draft steps (per-slot flat caches)
            def one(tk, pv, p, fo, nf, *dc):
                def dstep(carry, j):
                    dc_, t_ = carry
                    by = {"token": t_[None].astype(jnp.int32),
                          "pos": jnp.maximum(p + j, 0)[None]}
                    by.update(zip(cn_d, dc_))
                    outs = step_d(prm, *[by[n] for n in in_d])
                    nxt = jnp.argmax(outs[0][-1]).astype(jnp.int32)
                    nxt = jnp.where(j < nf,
                                    fo[jnp.minimum(jnp.maximum(j, 0),
                                                   gamma - 1)], nxt)
                    nxt = jnp.where(j < 0, tk, nxt)
                    return (list(outs[1:]), nxt), nxt
                (dc_out, _), outs_d = jax.lax.scan(
                    dstep, (list(dc), pv), jnp.arange(-1, gamma))
                return outs_d[1:], dc_out
            drafts, d_caches = jax.vmap(one)(
                tok, prev, pos, forced, n_forced, *d_caches)
            # ONE batched paged verify: (B, gamma+1) tokens
            toks = jnp.concatenate([tok[:, None], drafts], axis=1)
            by = {"token": toks, "pos": pos, "page_table": table}
            by.update(zip(self._pool_names, t_pools))
            outs = chunk_fn(prm, *[by[n] for n in in_t])
            t_pools = list(outs[1:])
            tnext = jnp.argmax(outs[0], axis=-1).astype(jnp.int32)
            ok = ((jnp.arange(gamma)[None] < n_forced[:, None])
                  | (free[:, None] & (drafts == tnext[:, :gamma])))
            a = jnp.cumprod(ok.astype(jnp.int32), axis=1).sum(axis=1)
            return tnext, a, t_pools, d_caches

        self._round_all = jax.jit(round_all, donate_argnums=(8, 9))
        # Multi-round ticks (the SpecDecodeServer rounds_per_tick
        # pattern, paged): R draft-and-verify rounds chained on device;
        # engaged only when every active slot is past its prompt with
        # R*(gamma+1) rows of PAGE headroom already ensured, so no
        # in-graph masking (and no masked pool writes) is needed.
        R = max(1, int(rounds_per_tick))
        self.rounds_per_tick = R

        def rounds_multi(prm, tok, prev, pos, table, t_pools, d_caches):
            zf = jnp.zeros((self.slots, gamma), jnp.int32)
            zn = jnp.zeros((self.slots,), jnp.int32)
            fr = jnp.ones((self.slots,), bool)

            def body(carry, _):
                t_p, d_c, tk, pv, ps_ = carry
                tnext, a, t_p, d_c = round_all(
                    prm, tk, pv, ps_, zf, zn, fr, table, t_p, d_c)
                new_pos = ps_ + a + 1
                new_tok = jnp.take_along_axis(
                    tnext, a[:, None], axis=1)[:, 0]
                new_prev = jnp.where(
                    a > 0,
                    jnp.take_along_axis(
                        tnext, jnp.maximum(a - 1, 0)[:, None],
                        axis=1)[:, 0],
                    tk)
                return (t_p, d_c, new_tok, new_prev, new_pos), (tnext, a)

            (t_p, d_c, *_), (emits, accs) = jax.lax.scan(
                body, (list(t_pools), list(d_caches), tok, prev, pos),
                None, length=R)
            # emits (R, B, g+1) -> (B, R, g+1); accs (R, B) -> (B, R)
            return (jnp.swapaxes(emits, 0, 1),
                    accs.T, t_p, d_c)

        self._rounds_multi = (jax.jit(rounds_multi,
                                      donate_argnums=(5, 6))
                              if R > 1 else None)
        # post-policy dtypes (see PagedDecodeServer): avoids a silent
        # double-compile when the first tick feeds f32 seeds and later
        # ticks re-feed the executor's bf16 outputs
        dts_t = _cache_dtypes(chunk_graph, cfg, self._pool_names)
        self._t_pools = [jnp.zeros(shapes_t[n], d)
                         for n, d in zip(self._pool_names, dts_t)]
        self._d_caches = [jnp.zeros((self.slots,) + shapes_d[n], d)
                          for n, d in zip(cn_d, dts_d)]
        self._table = self.pool.table(npg)
        self._npg = npg
        self._state = [_Slot() for _ in range(self.slots)]
        self._pending: queue.Queue = queue.Queue()
        self._lock = threading.Lock()
        self._shutdown = False
        self._wake = threading.Event()
        self._ticks = 0
        self._acc_num = 0
        self._acc_den = 0
        self._stall_ticks = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    shutdown = PagedDecodeServer.shutdown

    def submit(self, prompt: list[int], n_new: int,
               context=None) -> Future:
        fut: Future = Future()
        if context:
            fut.set_exception(ValueError(
                "SpecPagedDecodeServer does not take context arrays"))
            return fut
        if not prompt:
            fut.set_exception(ValueError("prompt must be non-empty"))
            return fut
        if len(prompt) + self.gamma >= self.max_len:
            fut.set_exception(ValueError(
                f"prompt length {len(prompt)} too long for max_len "
                f"{self.max_len} at gamma {self.gamma}"))
            return fut
        n_new = min(int(n_new), self.max_len - len(prompt) - self.gamma)
        if n_new <= 0:
            fut.set_result(list(prompt))
            return fut
        self._pending.put((list(prompt), n_new, fut))
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
                "ticks": self._ticks,
                "accept_rate": (self._acc_num / self._acc_den
                                if self._acc_den else None),
                "gamma": self.gamma,
            }

    def cache_bytes(self) -> int:
        return sum(int(np.prod(p.shape)) * p.dtype.itemsize
                   for p in self._t_pools + self._d_caches)

    def _admit(self) -> None:
        import jax.numpy as jnp

        for i, s in enumerate(self._state):
            if s.active:
                continue
            try:
                prompt, n_new, fut = self._pending.get_nowait()
            except queue.Empty:
                return
            fed = 0
            if self._prefills and len(prompt) > 1:
                # target prefill (paged): fed = index of the last prompt
                # token whose pool row is valid; the spec tick consumes
                # prompt[fed..] as forced drafts
                try:
                    n = len(prompt)
                    buckets = [p for p, _ in self._prefills]
                    ups = [p for p in buckets if p >= n]
                    p_len = min(ups) if ups else max(buckets)
                    eff = min(n, p_len)
                    self.pool.ensure(i, eff)
                    self._table = self.pool.table(self._npg,
                                                  out=self._table)
                    toks = np.zeros((p_len,), np.int64)
                    toks[:eff] = prompt[:eff]
                    _lg, self._t_pools = dict(self._prefills)[p_len](
                        self._params, jnp.asarray(toks),
                        jnp.asarray(self._table[i]), self._t_pools)
                    fed = eff - 1
                except PoolExhausted:
                    fed = 0  # forced-draft ingestion stalls gracefully
                except Exception:  # noqa: BLE001 — donated pools may be
                    # consumed: heal; a zeroed target pool destroys
                    # occupants' caches — fail them loudly
                    fed = 0
                    self._t_pools, n_lost = _heal_caches(self._t_pools)
                    if n_lost:
                        for k, sk in enumerate(self._state):
                            if sk.active and sk.future is not None:
                                sk.future.set_exception(RuntimeError(
                                    "prefill failure consumed the KV "
                                    "pools"))
                                self._state[k] = _Slot()
                                self.pool.release(k)
            if self._d_prefills and len(prompt) > 1:
                try:
                    buckets = [p for p, _ in self._d_prefills]
                    ups = [p for p in buckets if p >= len(prompt)]
                    p_len = min(ups) if ups else max(buckets)
                    eff = min(len(prompt), p_len)
                    toks = np.zeros((p_len,), np.int64)
                    toks[:eff] = prompt[:eff]
                    _lg, self._d_caches = dict(self._d_prefills)[p_len](
                        self._params, jnp.asarray(toks),
                        jnp.asarray(i, jnp.int32), self._d_caches)
                except Exception:  # noqa: BLE001 — a zeroed DRAFT cache
                    # only degrades acceptance; heal and continue
                    self._d_caches, _ = _heal_caches(self._d_caches)
            self._state[i] = _Slot(active=True, prompt=prompt, fed=fed,
                                   generated=[], n_new=n_new,
                                   last_token=prompt[fed], pos=fed,
                                   future=fut)

    def _loop(self) -> None:
        import jax.numpy as jnp

        g = self.gamma
        R = self.rounds_per_tick

        while not self._shutdown:
            with self._lock:
                self._admit()
                active = [i for i, s in enumerate(self._state)
                          if s.active]
            if not active:
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            # multi-round ticks need every active slot PAST its prompt
            # with R*(g+1) rows of both table capacity and PAGE headroom
            # (no in-graph masking, so no slot may run a round it
            # cannot safely commit)
            multi = (R > 1 and self._rounds_multi is not None
                     and all(self._state[i].pos + 1
                             >= len(self._state[i].prompt)
                             and self._state[i].pos + R * (g + 1)
                             < self.max_len
                             for i in active))
            if multi:
                try:
                    for i in active:
                        self.pool.ensure(
                            i, self._state[i].pos + R * (g + 1))
                except PoolExhausted:
                    multi = False  # fall back to single-round ensure
            live: list[int] = []
            for i in active:
                s = self._state[i]
                try:
                    # the verify writes rows pos..pos+gamma (per round)
                    self.pool.ensure(
                        i, s.pos + (R * (g + 1) if multi else g + 1))
                    live.append(i)
                except PoolExhausted:
                    pass
            if not live:
                with self._lock:
                    self._stall_ticks += 1
                    for i in sorted(active,
                                    key=lambda j: self._state[j].pos):
                        s = self._state[i]
                        s.future.set_exception(PoolExhausted(
                            "page pool exhausted by longer sequences"))
                        self._state[i] = _Slot()
                        self.pool.release(i)
                        rest = [j for j in active
                                if self._state[j].active]
                        if any(self.pool.pages_for(
                                self._state[j].pos + g + 1)
                               - len(self.pool.pages_of(j))
                               <= self.pool.free_pages for j in rest):
                            break
                continue
            if len(live) < len(active):
                self._stall_ticks += 1
            self._table = self.pool.table(self._npg, out=self._table)
            toks = np.zeros((self.slots,), np.int32)
            prevs = np.zeros((self.slots,), np.int32)
            pos = np.zeros((self.slots,), np.int32)
            forced = np.zeros((self.slots, g), np.int32)
            n_forced = np.zeros((self.slots,), np.int32)
            free = np.zeros((self.slots,), bool)
            for i in active:
                s = self._state[i]
                seq = s.prompt + s.generated
                toks[i] = seq[s.pos]
                prevs[i] = seq[max(s.pos - 1, 0)]
                pos[i] = s.pos
                rem = s.prompt[s.pos + 1:s.pos + 1 + g]
                n_forced[i] = len(rem)
                forced[i, :len(rem)] = rem
                free[i] = s.pos + 1 + len(rem) >= len(s.prompt)
            try:
                if multi:
                    emit, acc, self._t_pools, self._d_caches = \
                        self._rounds_multi(
                            self._params, jnp.asarray(toks),
                            jnp.asarray(prevs), jnp.asarray(pos),
                            jnp.asarray(self._table),
                            self._t_pools, self._d_caches)
                else:
                    emit, acc, self._t_pools, self._d_caches = \
                        self._round_all(
                            self._params, jnp.asarray(toks),
                            jnp.asarray(prevs), jnp.asarray(pos),
                            jnp.asarray(forced), jnp.asarray(n_forced),
                            jnp.asarray(free), jnp.asarray(self._table),
                            self._t_pools, self._d_caches)
                emit, acc = np.asarray(emit), np.asarray(acc)
            except Exception as e:  # noqa: BLE001
                with self._lock:
                    for i, s in enumerate(self._state):
                        if s.active and s.future is not None:
                            s.future.set_exception(e)
                        self._state[i] = _Slot()
                        self.pool.release(i)
                    self._t_pools, _ = _heal_caches(self._t_pools)
                    self._d_caches, _ = _heal_caches(self._d_caches)
                continue
            with self._lock:
                self._ticks += 1

                def apply(s, a, nf, row, was_free):
                    """Consume one round's (acceptance, emitted row);
                    returns True when the request finished."""
                    if was_free and g > nf:
                        self._acc_den += g - nf
                        self._acc_num += max(0, a - nf)
                    plen = len(s.prompt)
                    new = [int(row[j]) for j in range(nf, a + 1)
                           if s.pos + j + 1 >= plen]
                    s.pos += a + 1
                    for tok in new:
                        s.generated.append(tok)
                        if (len(s.generated) >= s.n_new
                                or tok in self.stop_tokens):
                            s.generated = s.generated[:s.n_new]
                            return True
                    return False

                for i in live:
                    s = self._state[i]
                    if multi:
                        # emit (B, R, g+1), acc (B, R): replay rounds;
                        # later rounds past a finish are discarded
                        # (their pool writes die with the released
                        # pages — write-before-read covers reuse)
                        done = False
                        for r in range(R):
                            done = apply(s, int(acc[i, r]), 0,
                                         emit[i, r], True)
                            if done:
                                break
                    else:
                        done = apply(s, int(acc[i]), int(n_forced[i]),
                                     emit[i], bool(free[i]))
                    if done:
                        s.future.set_result(list(s.prompt) + s.generated)
                        self._state[i] = _Slot()
                        self.pool.release(i)
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
