"""Continuous-batching decode serving (the vLLM-style slot loop).

FusedBatchedGenerator decodes equal-length prompt batches in one dispatch;
real LLM serving gets ragged, asynchronous requests. DecodeServer keeps B
slots of device-resident KV cache and runs ONE vmapped decode step per
tick across all slots: new requests are admitted into free slots mid-
flight (no barrier on the other slots), finished sequences free their
slot immediately.

Slot-reuse needs no cache reset: a sequence reads only rows <= its pos,
and it writes each row before first reading it, so whatever the previous
occupant left is never observed.

This extends the reference's batching story (the InferenceServer covers
the single-forward models; SURVEY §5.2) to autoregressive serving. The
per-token host round-trip makes it latency-bound over an RPC tunnel —
measured locally it is the right architecture (the dispatch is one fused
step for the whole batch); pair with FusedGenerator for offline batches.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field

import numpy as np


def _build_prefill_ladder(graphs, params, host_map, cfg):
    """(plen, jitted prefill+scatter) ladder shared by both servers.

    One dispatch per admission: per-cache .at[slot].set calls would cost
    one host round trip PER CACHE ARRAY (48 RPCs at 24 layers). The
    caches are donated; callers must heal via _heal_caches on failure.
    Positional contract: the prefill graph's outputs[1:] are the caches
    in the step graph's input order."""
    import jax

    from ..runtime.generate import _merge_params

    out = []
    for g in graphs:
        pex = _merge_params(params, host_map, g, cfg)
        plen = next(v.type.shape[0] for v in g.inputs
                    if v.name == "tokens")

        def prefill_set(p_, toks, slot, caches, f=pex.build_fn()):
            outs = f(p_, toks)
            new = [c.at[slot].set(v)
                   for c, v in zip(caches, outs[1:])]
            return outs[0], new

        out.append((plen, jax.jit(prefill_set, donate_argnums=(3,))))
    out.sort(key=lambda t: t[0])
    return out


def _heal_caches(caches, dtypes=None):
    """Rebuild any cache buffers a failed (donating) call consumed.
    Returns (caches, n_rebuilt); rebuilt slots come back zeroed, so the
    caller must fail the affected in-flight requests when n_rebuilt."""
    import jax.numpy as jnp

    healed, n = [], 0
    for i, c in enumerate(caches):
        if getattr(c, "is_deleted", lambda: False)():
            d = dtypes[i] if dtypes is not None else c.dtype
            healed.append(jnp.zeros(c.shape, d))
            n += 1
        else:
            healed.append(c)
    return healed, n


@dataclass
class _Slot:
    active: bool = False
    prompt: list[int] = field(default_factory=list)
    fed: int = 0                 # tokens of the prompt already consumed
    generated: list[int] = field(default_factory=list)
    n_new: int = 0
    last_token: int = 0
    pos: int = 0
    future: Future | None = None
    context: dict | None = None


class DecodeServer:
    """Continuous batching over a FusedGenerator-compatible step graph.

    submit(prompt, n_new) -> Future resolving to prompt+generated tokens.
    Greedy decoding; stop_tokens end a sequence early.
    """

    def __init__(self, step_graph, slots: int = 8, config=None,
                 stop_tokens: tuple[int, ...] = (), prefill_graphs=(),
                 shared_weights=None, tick_steps: int = 1):
        import jax
        import jax.numpy as jnp

        from ..runtime.config import Config
        from ..runtime.executor import Executor

        from ..runtime.generate import _decode_graph, _merge_params

        self.slots = slots
        self.stop_tokens = set(stop_tokens)
        cfg = config or Config()
        step_graph = _decode_graph(step_graph, cfg)
        if shared_weights is None:
            ex = Executor(step_graph, cfg)
            params = ex.init_params()
            host_map = {n: step_graph.initializers[n]
                        for n in ex.param_names}
        else:
            # share another server's uploaded weights (the bucket-ladder
            # case: same model, different cache max_len — weights match
            # by name+content, so no duplicate HBM)
            params, host_map = shared_weights
            ex = _merge_params(params, host_map, step_graph, cfg)
            step_graph = ex.graph
        self._params, self._host_map = params, host_map
        fn = ex.build_fn()
        self._input_names = [v.name for v in step_graph.inputs]
        self._cache_names = [n for n in self._input_names
                             if n.startswith(("k_cache_", "v_cache_"))]
        self._context_names = [n for n in self._input_names
                               if n not in ("token", "pos")
                               and n not in set(self._cache_names)]
        shapes = {v.name: tuple(v.type.shape) for v in step_graph.inputs}
        dtypes = {v.name: v.type.np_dtype for v in step_graph.inputs}
        self._ctx_shapes = {n: shapes[n] for n in self._context_names}
        self._ctx_dtypes = {n: dtypes[n] for n in self._context_names}
        self.max_len = shapes[self._cache_names[0]][0]

        input_names = self._input_names
        cache_names = self._cache_names
        context_names = self._context_names

        self.tick_steps = max(1, int(tick_steps))

        # params ride as ARGUMENTS, never closure constants: a closed-over
        # 0.66 GB weight dict gets serialized into the remote-compile
        # request on the axon tunnel (~30 min at 38 MB/s before the
        # transport gives up); as arguments only the small HLO ships
        def step_all(prm, tokens, pos, caches, ctxs):
            # one batched step; argmax on device so the readback is (B,)
            def one(tok, p, *rest):
                nc = len(cache_names)
                by = {"token": tok, "pos": p}
                by.update(zip(cache_names, rest[:nc]))
                by.update(zip(context_names, rest[nc:]))
                outs = fn(prm, *[by[n] for n in input_names])
                return (jnp.argmax(outs[0][0]).astype(jnp.int32),
                        list(outs[1:]))

            nxt, new_caches = jax.vmap(one)(tokens, pos, *caches, *ctxs)
            return nxt, new_caches

        T = self.tick_steps

        def step_all_multi(prm, tokens, pos, forced, n_forced, caches,
                           ctxs):
            # T chained steps per slot per dispatch: prompt tokens ride
            # in `forced`, generated ones chain on-device via argmax —
            # the per-tick host round trip (the slot loop's dominant
            # cost over an RPC tunnel) is paid once per T tokens.
            # Readback stays (B, T).
            from jax import lax

            def one(tok, p, fo, nf, *rest):
                nc = len(cache_names)

                def body(carry, j):
                    caches_, tk = carry
                    by = {"token": tk[None].astype(tokens.dtype),
                          "pos": (p + j)[None]}
                    by.update(zip(cache_names, caches_))
                    by.update(zip(context_names, rest[nc:]))
                    outs = fn(prm, *[by[n] for n in input_names])
                    out = jnp.argmax(outs[0][0]).astype(jnp.int32)
                    nxt = jnp.where(j < nf,
                                    fo[jnp.minimum(j, T - 2)], out)
                    return (list(outs[1:]), nxt), out

                (new_caches, _), outs = lax.scan(
                    body, (list(rest[:nc]), tok.astype(jnp.int32)),
                    jnp.arange(T))
                return outs, new_caches

            return jax.vmap(one)(tokens, pos, forced, n_forced,
                                 *caches, *ctxs)

        # donate the caches: the old buffers are dead after each tick, so
        # XLA updates them in place instead of copying the whole KV set
        self._step_all = jax.jit(step_all, donate_argnums=(3,))
        self._step_multi = (jax.jit(step_all_multi, donate_argnums=(5,))
                            if T > 1 else None)
        # Prefill admission: a ladder of full-sequence prefill graphs
        # (llama_style.build_prefill twins of the step graph) fills a new
        # slot's cache rows in ONE forward instead of one prompt token per
        # tick. Pad-up is safe — every cache row is written by the step
        # that reaches its position before it is ever attended — so the
        # smallest bucket >= len(prompt) serves any shorter prompt, and
        # longer prompts prefill the largest bucket then feed the rest.
        from ..runtime.generate import _cache_dtypes

        self._prefills = _build_prefill_ladder(
            prefill_graphs, params, host_map, cfg)

        cache_dts = _cache_dtypes(step_graph, cfg, self._cache_names)
        self._cache_dts = cache_dts
        self._caches = [jnp.zeros((slots,) + shapes[n], d)
                        for n, d in zip(self._cache_names, cache_dts)]
        self._ctxs = [jnp.zeros((slots,) + self._ctx_shapes[n],
                                self._ctx_dtypes[n])
                      for n in self._context_names]
        self._state = [_Slot() for _ in range(slots)]
        self._pending: queue.Queue = queue.Queue()
        self._lock = threading.Lock()
        self._shutdown = False
        self._wake = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- public API ------------------------------------------------------

    def submit(self, prompt: list[int], n_new: int,
               context: dict | None = None) -> Future:
        if not prompt:
            raise ValueError("prompt must be non-empty")
        fut: Future = Future()
        if len(prompt) >= self.max_len:
            fut.set_exception(ValueError(
                f"prompt length {len(prompt)} >= cache max_len {self.max_len}"))
            return fut
        if n_new <= 0:
            fut.set_result(list(prompt))  # FusedGenerator parity
            return fut
        self._pending.put((list(prompt), int(n_new), context, fut))
        self._wake.set()
        return fut

    def stats(self) -> dict:
        with self._lock:
            return {
                "slots": self.slots,
                "active": sum(s.active for s in self._state),
                "queued": self._pending.qsize(),
            }

    def cache_bytes(self) -> int:
        """Device bytes held by this server's KV caches (all slots)."""
        return sum(int(np.prod(c.shape)) * c.dtype.itemsize
                   for c in self._caches)

    def shutdown(self) -> None:
        self._shutdown = True
        self._wake.set()
        self._thread.join(timeout=30)

    # -- slot loop -------------------------------------------------------

    def _prefill_slot(self, i: int, prompt: list[int]):
        """Fill slot i's cache rows with one prefill forward. Returns
        (fed, first_token): `fed` is the index of the last prompt token
        whose row was written; `first_token` is the greedy first
        generation (from the prefill logits at the prompt's last
        position) when the WHOLE prompt fit the bucket, else None (the
        remaining prompt feeds per tick). Prompts longer than the
        largest bucket prefill that bucket; shorter ones pad up (pad
        rows are written-before-read by later steps, never observed)."""
        import jax.numpy as jnp

        n = len(prompt)
        buckets = [p for p, _ in self._prefills]
        ups = [p for p in buckets if p >= n]
        p_len = min(ups) if ups else max(buckets)
        fn = dict(self._prefills)[p_len]
        eff = min(n, p_len)
        toks = np.zeros((p_len,), np.int64)
        toks[:eff] = prompt[:eff]
        # slot index as a traced array — a python int would retrace the
        # prefill program once per slot
        logits, self._caches = fn(self._params, jnp.asarray(toks),
                                  jnp.asarray(i, jnp.int32),
                                  self._caches)
        first = (int(np.asarray(logits[eff - 1]).argmax())
                 if eff == n else None)
        return eff - 1, first

    def _admit(self) -> None:
        import jax.numpy as jnp

        for i, s in enumerate(self._state):
            if s.active:
                continue
            try:
                prompt, n_new, context, fut = self._pending.get_nowait()
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
                        # whole prompt prefilled: the prefill logits
                        # already yield the first generation
                        generated = [first]
                        pos, last = len(prompt), first
                        if (len(generated) >= n_new
                                or first in self.stop_tokens):
                            fut.set_result(list(prompt) + generated)
                            continue
                    else:  # partial prefill: feed the rest per tick
                        pos, last = fed, prompt[fed]
                except Exception:  # noqa: BLE001 — fall back to per-tick
                    fed = pos = 0
                    last = prompt[0]
                    generated = []
                    # the prefill donates the caches: if the failed call
                    # consumed them, rebuilt slots come back zeroed and
                    # the in-flight occupants' state is gone — fail
                    # those requests loudly instead of serving garbage
                    self._caches, n_lost = _heal_caches(
                        self._caches, self._cache_dts)
                    if n_lost:
                        for k, sk in enumerate(self._state):
                            if sk.active and sk.future is not None:
                                sk.future.set_exception(RuntimeError(
                                    "prefill failure consumed the KV "
                                    "caches"))
                                self._state[k] = _Slot()
            self._state[i] = _Slot(active=True, prompt=prompt, fed=fed,
                                   generated=generated, n_new=n_new,
                                   last_token=last, pos=pos, future=fut,
                                   context=context)
            try:
                for j, n in enumerate(self._context_names):
                    arr = np.asarray((context or {}).get(n, 0),
                                     self._ctx_dtypes[n])
                    self._ctxs[j] = self._ctxs[j].at[i].set(
                        jnp.broadcast_to(arr, self._ctx_shapes[n]))
            except Exception as e:  # noqa: BLE001 — bad context shape/dtype
                fut.set_exception(e)
                self._state[i] = _Slot()

    def _loop(self) -> None:
        import jax.numpy as jnp

        T = self.tick_steps
        while not self._shutdown:
            with self._lock:
                self._admit()
                active = [s for s in self._state if s.active]
            if not active:
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            if T > 1:
                tokens = np.zeros((self.slots,), np.int64)
                pos = np.zeros((self.slots,), np.int64)
                forced = np.zeros((self.slots, T - 1), np.int32)
                nf = np.zeros((self.slots,), np.int32)
                for i, s in enumerate(self._state):
                    if not s.active:
                        continue
                    tokens[i] = s.last_token
                    pos[i] = s.pos
                    nxt_prompt = s.prompt[s.pos + 1:s.pos + T]
                    nf[i] = len(nxt_prompt)
                    forced[i, :len(nxt_prompt)] = nxt_prompt
            else:
                tokens = np.zeros((self.slots, 1), np.int64)
                pos = np.zeros((self.slots, 1), np.int64)
                for i, s in enumerate(self._state):
                    if s.active:
                        tokens[i, 0] = s.last_token
                        pos[i, 0] = s.pos
            try:
                if T > 1:
                    nxt, self._caches = self._step_multi(
                        self._params, jnp.asarray(tokens),
                        jnp.asarray(pos), jnp.asarray(forced),
                        jnp.asarray(nf), self._caches, self._ctxs)
                else:
                    nxt, self._caches = self._step_all(
                        self._params, jnp.asarray(tokens),
                        jnp.asarray(pos), self._caches, self._ctxs)
                nxt = np.asarray(nxt)
            except Exception as e:  # noqa: BLE001 — an executor error must
                # fail the in-flight requests, not kill the serving thread
                with self._lock:
                    for i, s in enumerate(self._state):
                        if s.active and s.future is not None:
                            s.future.set_exception(e)
                        self._state[i] = _Slot()
                    # the failed call may have consumed the donated cache
                    # buffers: rebuild clean ones
                    self._caches, _ = _heal_caches(self._caches,
                                                   self._cache_dts)
                continue
            with self._lock:
                for i, s in enumerate(self._state):
                    if not s.active:
                        continue
                    if T > 1:
                        # outputs nxt[i, j] predict sequence position
                        # s.pos + j + 1; those past the prompt are
                        # generated tokens (greedy chain on device)
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
                        else:
                            seq = s.prompt + s.generated
                            s.last_token = seq[s.pos] \
                                if s.pos < len(seq) else seq[-1]
                        continue
                    s.pos += 1
                    if s.fed + 1 < len(s.prompt):
                        # still feeding the prompt
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
        # drain on shutdown: fail anything still outstanding
        with self._lock:
            for s in self._state:
                if s.active and s.future is not None and not s.future.done():
                    s.future.set_exception(RuntimeError("server shut down"))
            while True:
                try:
                    *_rest, fut = self._pending.get_nowait()
                except queue.Empty:
                    break
                fut.set_exception(RuntimeError("server shut down"))


class SpecDecodeServer:
    """Speculative continuous batching: every tick runs ONE vmapped
    draft-and-verify round across all slots (gamma draft steps + one
    (gamma+1)-token chunk verify per slot) instead of a single step —
    up to gamma+1 tokens per slot per tick at high draft acceptance,
    with greedy outputs token-identical to DecodeServer's.

    Prompt handling needs no separate program: a slot still consuming
    its prompt passes its next tokens as FORCED drafts (accepted
    unconditionally — they are ground truth), so prompts also ingest at
    gamma+1 tokens/tick and the draft model sees them naturally. With
    ``prefill_graphs`` (target twins) a new slot's target cache fills in
    one forward instead; the draft then starts blind for that prompt —
    acceptance suffers, correctness never does (the verify step is the
    target itself). Pass ``draft_prefill_graphs`` to prefill the draft
    too.

    Host keeps the full token sequence per slot, so all positions /
    previous-token bookkeeping stays host-side; the device returns only
    (emit (B, gamma+1), accepted (B,)) plus the updated caches.
    """

    def __init__(self, step_graph, chunk_graph, draft_graph,
                 slots: int = 4, config=None, draft_config=None,
                 stop_tokens: tuple[int, ...] = (), prefill_graphs=(),
                 draft_prefill_graphs=(), shared_weights=None,
                 rounds_per_tick: int = 1):
        import jax
        import jax.numpy as jnp

        from ..runtime.config import Config
        from ..runtime.executor import Executor
        from ..runtime.generate import (_cache_dtypes, _decode_graph,
                                        _merge_params)

        self.slots = slots
        self.stop_tokens = set(stop_tokens)
        cfg = config or Config()
        dcfg = draft_config or cfg
        step_graph = _decode_graph(step_graph, cfg)
        chunk_graph = _decode_graph(chunk_graph, cfg)
        draft_graph = _decode_graph(draft_graph, dcfg)
        if shared_weights is None:
            ex_t = Executor(step_graph, cfg)
            params_t = ex_t.init_params()
            host_t = {n: step_graph.initializers[n]
                      for n in ex_t.param_names}
        else:
            # bucket-ladder case: another server's uploaded weight set
            params_t, host_t = shared_weights
            ex_t = _merge_params(params_t, host_t, step_graph, cfg)
            step_graph = ex_t.graph
        ex_c = _merge_params(params_t, host_t, chunk_graph, cfg)
        chunk_fn = ex_c.build_fn()
        # merge the draft into the same uploaded set: an early-exit
        # self-draft (first K layers of the target, same weight dict)
        # then shares every layer weight on device by name+content; an
        # independent tiny draft simply adds its own params (colliding
        # auto-named constants are renamed by _merge_params)
        ex_d = _merge_params(params_t, host_t, draft_graph, dcfg)
        draft_graph = ex_d.graph
        params_d = params_t
        step_d = ex_d.build_fn()
        self._params, self._host_map = params_t, host_t

        def names(g):
            return [v.name for v in g.inputs]

        in_c, in_d = names(chunk_graph), names(draft_graph)
        cn_t = [n for n in names(step_graph)
                if n.startswith(("k_cache_", "v_cache_"))]
        cn_d = [n for n in in_d if n.startswith(("k_cache_", "v_cache_"))]
        shapes_t = {v.name: tuple(v.type.shape) for v in step_graph.inputs}
        shapes_d = {v.name: tuple(v.type.shape) for v in draft_graph.inputs}
        dts_t = _cache_dtypes(step_graph, cfg, cn_t)
        dts_d = _cache_dtypes(draft_graph, dcfg, cn_d)
        self.max_len = min(shapes_t[cn_t[0]][0], shapes_d[cn_d[0]][0])
        gamma = next(v.type.shape[0] for v in chunk_graph.inputs
                     if v.name == "token") - 1
        if gamma < 1:
            raise ValueError("chunk_graph must take >= 2 tokens")
        self.gamma = gamma

        # target- and draft-side prefill ladders (shared builder;
        # params_d IS params_t post-merge and host_t carries the
        # draft's entries, so both merge against the same maps)
        self._prefills = _build_prefill_ladder(
            prefill_graphs, params_t, host_t, cfg)
        self._d_prefills = _build_prefill_ladder(
            draft_prefill_graphs, params_d, host_t, dcfg)

        def ordered(nms, cnames, tok, pos, caches):
            by = {"token": tok, "pos": pos}
            by.update(zip(cnames, caches))
            return [by[n] for n in nms]

        # prm rides as an ARGUMENT (vmap in_axes=None): a closed-over
        # weight dict would be serialized into the remote-compile request
        def _round_core(prm, tok, prev, pos, forced, n_forced, free,
                        t_caches, d_caches):
            def dstep(c, j):
                dc, tk = c
                pp = jnp.maximum(pos + j, 0)
                outs = step_d(prm, *ordered(in_d, cn_d, tk[None],
                                            pp[None], dc))
                nxt = jnp.argmax(outs[0][-1]).astype(jnp.int32)
                nxt = jnp.where(j < n_forced,
                                forced[jnp.minimum(jnp.maximum(j, 0),
                                                   gamma - 1)], nxt)
                nxt = jnp.where(j < 0, tok, nxt)
                return (list(outs[1:]), nxt), nxt
            (d_caches, _), outs_d = jax.lax.scan(
                dstep, (d_caches, prev), jnp.arange(-1, gamma))
            drafts = outs_d[1:]

            toks = jnp.concatenate([tok[None], drafts])
            outs = chunk_fn(prm, *ordered(in_c, cn_t, toks,
                                          pos[None], t_caches))
            t_caches = list(outs[1:])
            tnext = jnp.argmax(outs[0], axis=-1).astype(jnp.int32)
            # beyond the forced (prompt) region, draft agreement counts
            # only once the prompt is fully consumed (`free`): mid-prompt
            # "agreement" would walk past prompt tokens without ever
            # ingesting them
            ok = ((jnp.arange(gamma) < n_forced)
                  | (free & (drafts == tnext[:gamma])))
            a = jnp.cumprod(ok.astype(jnp.int32)).sum()
            return tnext, a, t_caches, d_caches

        def round_one(prm, tok, prev, pos, forced, n_forced, free,
                      *caches):
            nc = len(cn_t)
            tnext, a, t_caches, d_caches = _round_core(
                prm, tok, prev, pos, forced, n_forced, free,
                list(caches[:nc]), list(caches[nc:]))
            return tnext, a, *t_caches, *d_caches

        self._round_all = jax.jit(
            jax.vmap(round_one,
                     in_axes=(None,) + (0,) * (6 + len(cn_t)
                                               + len(cn_d))),
            donate_argnums=tuple(
                range(7, 7 + len(cn_t) + len(cn_d))))

        # Multi-round ticks (rounds_per_tick=R): R draft-and-verify
        # rounds chained ON DEVICE — the per-tick host round trip is
        # paid once per up-to R*(gamma+1) tokens. Engaged only when
        # every active slot is past its prompt with R*(gamma+1)
        # headroom (the host falls back to single rounds otherwise),
        # so no in-graph masking — and no masked cache writes — is
        # ever needed.
        R = max(1, int(rounds_per_tick))
        self.rounds_per_tick = R

        def rounds_multi(prm, tok, prev, pos, *caches):
            nc = len(cn_t)

            def body(carry, _):
                t_c, d_c, tk, pv, ps = carry
                tnext, a, t_c, d_c = _round_core(
                    prm, tk, pv, ps,
                    jnp.zeros((gamma,), jnp.int32),
                    jnp.int32(0), jnp.bool_(True), t_c, d_c)
                new_pos = ps + a + 1
                new_tok = tnext[a]
                new_prev = jnp.where(a > 0,
                                     tnext[jnp.maximum(a - 1, 0)], tk)
                return (t_c, d_c, new_tok, new_prev, new_pos), (tnext, a)

            (t_c, d_c, *_), (emits, accs) = jax.lax.scan(
                body, (list(caches[:nc]), list(caches[nc:]),
                       tok, prev, pos), None, length=R)
            return emits, accs, *t_c, *d_c

        self._rounds_multi = (jax.jit(
            jax.vmap(rounds_multi,
                     in_axes=(None,) + (0,) * (3 + len(cn_t)
                                               + len(cn_d))),
            donate_argnums=tuple(
                range(4, 4 + len(cn_t) + len(cn_d))))
            if R > 1 else None)
        self._t_caches = [jnp.zeros((slots,) + shapes_t[n], d)
                          for n, d in zip(cn_t, dts_t)]
        self._d_caches = [jnp.zeros((slots,) + shapes_d[n], d)
                          for n, d in zip(cn_d, dts_d)]
        self._state = [_Slot() for _ in range(slots)]
        self._pending: queue.Queue = queue.Queue()
        self._lock = threading.Lock()
        self._shutdown = False
        self._wake = threading.Event()
        # acceptance accounting (voluntary draft positions only — forced
        # prompt ingestion always "accepts" and would inflate the rate)
        self._ticks = 0
        self._acc_num = 0
        self._acc_den = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # public API matches DecodeServer
    submit = DecodeServer.submit
    shutdown = DecodeServer.shutdown

    def stats(self) -> dict:
        with self._lock:
            return {
                "slots": self.slots,
                "active": sum(s.active for s in self._state),
                "queued": self._pending.qsize(),
                "ticks": self._ticks,
                "accept_rate": (self._acc_num / self._acc_den
                                if self._acc_den else None),
                "gamma": self.gamma,
            }

    def cache_bytes(self) -> int:
        """Device bytes held by the target AND draft KV caches."""
        return sum(int(np.prod(c.shape)) * c.dtype.itemsize
                   for c in self._t_caches + self._d_caches)

    def _admit(self) -> None:
        import jax.numpy as jnp

        for i, s in enumerate(self._state):
            if s.active:
                continue
            try:
                prompt, n_new, context, fut = self._pending.get_nowait()
            except queue.Empty:
                return
            if context:
                fut.set_exception(ValueError(
                    "SpecDecodeServer does not take context arrays"))
                continue
            n_new = min(n_new, self.max_len - len(prompt) - self.gamma)
            if n_new < 1:
                fut.set_result(list(prompt))
                continue
            fed = 0
            for graphs, store in ((self._prefills, "_t_caches"),
                                  (self._d_prefills, "_d_caches")):
                if not graphs or len(prompt) < 2:
                    continue
                try:
                    buckets = [p for p, _ in graphs]
                    ups = [p for p in buckets if p >= len(prompt)]
                    p_len = min(ups) if ups else max(buckets)
                    eff = min(len(prompt), p_len)
                    toks = np.zeros((p_len,), np.int64)
                    toks[:eff] = prompt[:eff]
                    _logits, new = dict(graphs)[p_len](
                        self._params, jnp.asarray(toks),
                        jnp.asarray(i, jnp.int32), getattr(self, store))
                    setattr(self, store, new)
                    if store == "_t_caches":
                        fed = eff - 1
                except Exception:  # noqa: BLE001 — forced-draft fallback
                    if store == "_t_caches":
                        fed = 0
                    # donated caches may be consumed by the failed call:
                    # heal; a TARGET-cache loss destroys occupants'
                    # state, but a zeroed DRAFT cache only degrades
                    # acceptance (the verify chunk is the target) — do
                    # not kill in-flight requests for that
                    healed, n_lost = _heal_caches(getattr(self, store))
                    setattr(self, store, healed)
                    if n_lost and store == "_t_caches":
                        for k, sk in enumerate(self._state):
                            if sk.active and sk.future is not None:
                                sk.future.set_exception(RuntimeError(
                                    "prefill failure consumed the KV "
                                    "caches"))
                                self._state[k] = _Slot()
            # fed = index of last prompt token whose TARGET row is valid;
            # pos = next position to process; the tick consumes tokens
            # prompt[fed..] as forced drafts until the prompt is done
            self._state[i] = _Slot(active=True, prompt=prompt, fed=fed,
                                   generated=[], n_new=n_new,
                                   last_token=prompt[fed], pos=fed,
                                   future=fut, context=None)

    def _loop(self) -> None:
        import jax.numpy as jnp

        g = self.gamma
        R = self.rounds_per_tick

        def apply_round(s, a, nf, emit_row):
            """Consume one round's (acceptance, emitted tokens) into a
            slot; returns True when the request finished."""
            if free_of(s) and g > nf:
                self._acc_den += g - nf
                self._acc_num += max(0, a - nf)
            plen = len(s.prompt)
            # a token emitted for sequence position pos+j+1 is
            # GENERATED only once past the prompt; a mid-prompt
            # bonus (window ends inside the prompt) is discarded
            new = [int(emit_row[j]) for j in range(nf, a + 1)
                   if s.pos + j + 1 >= plen]
            s.pos += a + 1
            for tok in new:
                s.generated.append(tok)
                if (len(s.generated) >= s.n_new
                        or tok in self.stop_tokens):
                    s.generated = s.generated[
                        :min(len(s.generated), s.n_new)]
                    return True
            return False

        def free_of(s):
            rem = len(s.prompt[s.pos + 1:s.pos + 1 + g])
            return s.pos + 1 + rem >= len(s.prompt)

        while not self._shutdown:
            with self._lock:
                self._admit()
                active = [s for s in self._state if s.active]
            if not active:
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            # multi-round ticks need every active slot PAST its prompt
            # with full acceptance headroom (no in-graph masking, so no
            # slot may run a round it cannot safely commit)
            multi = (R > 1 and self._rounds_multi is not None
                     and all(s.pos + 1 >= len(s.prompt)
                             and s.pos + R * (g + 1) < self.max_len
                             for s in active))
            toks = np.zeros((self.slots,), np.int32)
            prevs = np.zeros((self.slots,), np.int32)
            pos = np.zeros((self.slots,), np.int32)
            forced = np.zeros((self.slots, g), np.int32)
            n_forced = np.zeros((self.slots,), np.int32)
            free = np.zeros((self.slots,), bool)
            for i, s in enumerate(self._state):
                if not s.active:
                    continue
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
                    outs = self._rounds_multi(
                        self._params, jnp.asarray(toks),
                        jnp.asarray(prevs), jnp.asarray(pos),
                        *self._t_caches, *self._d_caches)
                else:
                    outs = self._round_all(
                        self._params, jnp.asarray(toks),
                        jnp.asarray(prevs), jnp.asarray(pos),
                        jnp.asarray(forced), jnp.asarray(n_forced),
                        jnp.asarray(free),
                        *self._t_caches, *self._d_caches)
                emit, acc = np.asarray(outs[0]), np.asarray(outs[1])
                nt = len(self._t_caches)
                self._t_caches = list(outs[2:2 + nt])
                self._d_caches = list(outs[2 + nt:])
            except Exception as e:  # noqa: BLE001 — fail requests, not
                # the serving thread; donated caches may be consumed
                with self._lock:
                    for i, s in enumerate(self._state):
                        if s.active and s.future is not None:
                            s.future.set_exception(e)
                        self._state[i] = _Slot()
                    self._t_caches, _ = _heal_caches(self._t_caches)
                    self._d_caches, _ = _heal_caches(self._d_caches)
                continue
            with self._lock:
                self._ticks += 1
                for i, s in enumerate(self._state):
                    if not s.active:
                        continue
                    if multi:
                        # emit (B, R, g+1), acc (B, R): replay each
                        # round; later rounds past a finish are
                        # discarded (their cache writes die with the
                        # slot — write-before-read covers reuse)
                        done = False
                        for r in range(R):
                            done = apply_round(s, int(acc[i, r]), 0,
                                               emit[i, r])
                            if done:
                                break
                    else:
                        done = apply_round(s, int(acc[i]),
                                           int(n_forced[i]), emit[i])
                    if done:
                        s.future.set_result(list(s.prompt) + s.generated)
                        self._state[i] = _Slot()
        with self._lock:
            for s in self._state:
                if s.active and s.future is not None and not s.future.done():
                    s.future.set_exception(RuntimeError("server shut down"))
            while True:
                try:
                    *_rest, fut = self._pending.get_nowait()
                except queue.Empty:
                    break
                fut.set_exception(RuntimeError("server shut down"))


class BucketedDecodeServer:
    """KV-cache bucket ladder over DecodeServer (VERDICT r4 #5).

    DecodeServer allocates ``slots x max_len`` cache rows up front, so a
    mixed-length workload pays the LONGEST request's cache for every
    slot — probe78 measured 8.6 GB of caches on a 16 GB chip at
    b16 x 4k. This server keeps several slot groups ("buckets"), each
    with its own cache length, all sharing ONE uploaded weight set
    (name+content-matched device buffers via _merge_params): cache HBM
    is sum(slots_i x len_i) instead of slots_total x max(len).

    ``buckets`` is a list of dicts: {"step": step_graph, "slots": n,
    "prefills": [prefill graphs built at THIS bucket's max_len]}.
    Build every bucket's graphs from the same weight dict, quantized
    identically, or weights are duplicated on device (a warning fires).

    Routing: a request goes to the smallest bucket whose cache fits
    len(prompt) + n_new; if that bucket has no free slot but a larger
    fitting one does, it spills up (latency over memory). Requests
    longer than every bucket are rejected like DecodeServer rejects
    prompts >= max_len.

    The per-bucket tick loops run independently (each vmapped step is
    its own executable; XLA queues them on the device stream). A paged
    single-pool design behind the ragged kernel is the documented
    extension if bucket fragmentation ever dominates; the ladder gives
    the memory win with the already-tested slot loop.
    """

    def __init__(self, buckets, config=None, stop_tokens=()):
        if not buckets:
            raise ValueError("need at least one bucket")
        self._servers = []
        shared = None
        # largest first: its server uploads the weights, the rest share
        for i, b in enumerate(buckets):
            if ("chunk" in b) != ("draft" in b):
                # validate BEFORE building anything: a mid-construction
                # raise would leak earlier buckets' serving threads and
                # uploaded weights with no handle to shut them down
                raise ValueError(
                    "speculative bucket needs BOTH 'chunk' and 'draft' "
                    f"graphs (bucket {i} has only one)")
        order = sorted(range(len(buckets)),
                       key=lambda i: -self._graph_max_len(
                           buckets[i]["step"]))
        built: dict[int, DecodeServer] = {}
        for i in order:
            b = buckets[i]
            if "chunk" in b and "draft" in b:
                # speculative bucket: vmapped draft-and-verify ticks at
                # this cache length (graphs built from the same weights)
                srv = SpecDecodeServer(
                    b["step"], b["chunk"], b["draft"],
                    slots=b.get("slots", 4), config=config,
                    stop_tokens=stop_tokens,
                    prefill_graphs=b.get("prefills", ()),
                    draft_prefill_graphs=b.get("draft_prefills", ()),
                    shared_weights=shared,
                    rounds_per_tick=b.get("rounds_per_tick", 1))
            else:
                srv = DecodeServer(b["step"], slots=b.get("slots", 4),
                                   config=config,
                                   stop_tokens=stop_tokens,
                                   prefill_graphs=b.get("prefills", ()),
                                   shared_weights=shared,
                                   tick_steps=b.get("tick_steps", 1))
            if shared is None:
                shared = (srv._params, srv._host_map)
            built[i] = srv
        self._servers = [built[i] for i in range(len(buckets))]
        self._servers.sort(key=lambda s: s.max_len)

    @staticmethod
    def _graph_max_len(g) -> int:
        for v in g.inputs:
            if v.name.startswith(("k_cache_", "v_cache_")):
                return int(v.type.shape[0])
        raise ValueError("step graph has no KV cache inputs")

    @property
    def max_len(self) -> int:
        return self._servers[-1].max_len

    def submit(self, prompt, n_new, context=None):
        need = len(prompt) + max(int(n_new), 0)
        # need == max_len fits exactly (plen + n_new tokens occupy rows
        # 0..max_len-1; DecodeServer only rejects plen >= max_len)
        fits = [s for s in self._servers if need <= s.max_len]
        if not fits:
            # fall back to the largest bucket; DecodeServer clamps n_new
            # or rejects an over-long prompt with its own error
            fits = [self._servers[-1]]
        target = fits[0]
        if fits[0].stats()["active"] >= fits[0].slots:
            for s in fits[1:]:
                st_ = s.stats()
                if st_["active"] < s.slots and st_["queued"] == 0:
                    target = s  # spill up: a longer-cache slot is idle
                    break
        return target.submit(prompt, n_new, context)

    def stats(self) -> dict:
        per = [s.stats() for s in self._servers]
        return {
            "buckets": [{"max_len": s.max_len, **st_}
                        for s, st_ in zip(self._servers, per)],
            "slots": sum(p["slots"] for p in per),
            "active": sum(p["active"] for p in per),
            "queued": sum(p["queued"] for p in per),
        }

    def cache_bytes(self) -> int:
        return sum(s.cache_bytes() for s in self._servers)

    def uniform_cache_bytes(self) -> int:
        """What the same slot count costs at the LARGEST bucket's length
        (the flat-DecodeServer allocation this ladder replaces). When
        the largest bucket is speculative, only its TARGET caches count
        — a flat DecodeServer would not hold draft caches."""
        big = self._servers[-1]
        t_caches = getattr(big, "_t_caches", None)
        if t_caches is not None:
            per_slot = sum(int(np.prod(c.shape)) * c.dtype.itemsize
                           for c in t_caches) // big.slots
        else:
            per_slot = big.cache_bytes() // big.slots
        return per_slot * sum(s.slots for s in self._servers)

    def shutdown(self) -> None:
        for s in self._servers:
            s.shutdown()
