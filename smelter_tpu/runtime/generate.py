"""Autoregressive decoding driver over a cache-step graph.

Beyond the reference's scope (single-forward CNN engine, SURVEY.md §0);
required for transformer serving (BASELINE.json:11 ViT path generalized).

Runs a compiled decode-step model (token, pos, *caches) -> (logits,
*new_caches) in a host loop with device-resident caches — the KV-cache
serving pattern. The executable is compiled once (static shapes); each
step is one dispatch.
"""

from __future__ import annotations

import numpy as np


def _arr_eq(a, b) -> bool:
    return a is b or (a.shape == b.shape and a.dtype == b.dtype
                      and np.array_equal(a, b))


def _shallow_clone(graph):
    """Structure-only clone: fresh node objects / input lists /
    initializer dict, arrays shared by reference — _merge_params renames
    edges, and mutating a caller-owned graph would corrupt OTHER
    generator instances built from the same object (their build_fn
    traces lazily, reading the graph at first call)."""
    import copy

    g2 = copy.copy(graph)
    g2.nodes = [copy.copy(n) for n in graph.nodes]
    for n in g2.nodes:
        n.inputs = list(n.inputs)
        n.outputs = list(n.outputs)
    g2.initializers = dict(graph.initializers)
    g2.inputs = list(graph.inputs)
    g2.outputs = list(graph.outputs)
    return g2


def _merge_params(params, host_map, graph, cfg):
    """Merge a companion graph's params into `params`, sharing the device
    buffer whenever name AND content match an already-uploaded array (the
    model builders name weights by their weight-dict key and quantization
    is deterministic, so prefill/chunk twins share every big weight).
    Colliding names with DIFFERENT content — auto-named small constants
    from separately built graphs — are renamed in a structure-only CLONE
    of `graph` (the caller's object stays untouched and reusable);
    a rename of anything weight-sized is warned, since it means the
    caller quantized the twins differently and HBM is being doubled.
    Returns the companion's Executor (built on the clone)."""
    import warnings

    import jax
    import jax.numpy as jnp

    from .executor import Executor

    graph = _shallow_clone(graph)
    renames = {}
    for name, want in list(graph.initializers.items()):
        have = host_map.get(name)
        if have is not None and not _arr_eq(have, want):
            new = name + "__p"
            while new in host_map or new in graph.initializers:
                new += "_"
            renames[name] = new
            if want.nbytes > (1 << 20):
                warnings.warn(
                    f"companion graph initializer {name!r} "
                    f"({want.nbytes >> 20} MB) differs from the step "
                    f"graph's — weights are being duplicated on device; "
                    f"build both graphs from one weight dict and "
                    f"quantize them identically", stacklevel=3)
    for old, new in renames.items():
        graph.initializers[new] = graph.initializers.pop(old)
    if renames:
        for node in graph.nodes:
            node.inputs = [renames.get(i, i) for i in node.inputs]
    ex = Executor(graph, cfg)
    plat = jax.default_backend()
    for name in ex.param_names:
        if name not in params:
            arr = ex._param_host(name, plat)
            params[name] = jax.device_put(jnp.asarray(arr))
            host_map[name] = graph.initializers[name]
    return ex


def _decode_graph(graph, cfg):
    """Apply the config's decode-graph rewrites on a structure-only clone
    (the caller's graph object stays untouched and reusable). Currently:
    Config.ragged_attention fuses the masked cache attention into
    RaggedDecodeAttention (passes/ragged_attention.py) so the TPU kernel
    reads only the live cache prefix per step."""
    if cfg is None or not getattr(cfg, "ragged_attention", False):
        return graph
    from ..passes.pass_manager import run_passes

    g2 = _shallow_clone(graph)
    run_passes(g2, ["fuse_ragged_attention", "dce"])
    return g2


def _cache_dtypes(step_graph, config, cache_names):
    """Dtypes to seed the KV caches with: the executor emits floating
    caches in its compute dtype, and the caches are CARRIED (lax.scan in
    the fused generators, re-fed outputs in the host-loop ones) — a f32
    seed against a bf16 step output is a scan carry-type error, and a
    silent double-compile in the host-loop forms."""
    import jax.numpy as jnp

    cd = jnp.dtype(config.compute_dtype)
    by = {v.name: (cd if np.issubdtype(v.type.np_dtype, np.floating)
                   else jnp.dtype(v.type.np_dtype))
          for v in step_graph.inputs}
    return [by[n] for n in cache_names]


class Generator:
    def __init__(self, step_graph, config=None, layers: int | None = None):
        from .config import Config
        from .executor import CompiledModel

        cfg = config or Config()
        step_graph = _decode_graph(step_graph, cfg)
        self.model = CompiledModel(step_graph, cfg)
        cache_inputs = [v for v in step_graph.inputs
                        if v.name.startswith(("k_cache_", "v_cache_"))]
        self.cache_shapes = [tuple(v.type.shape) for v in cache_inputs]
        self.cache_dtypes = _cache_dtypes(
            step_graph, cfg, [v.name for v in cache_inputs])
        self.max_len = self.cache_shapes[0][0]

    def generate(self, prompt: list[int], n_new: int,
                 sample=None) -> list[int]:
        """Greedy (or `sample(logits)->token`) decoding. Returns
        prompt + generated tokens."""
        import jax.numpy as jnp

        caches = [jnp.zeros(s, d)
                  for s, d in zip(self.cache_shapes, self.cache_dtypes)]
        tokens = list(prompt)
        logits = None
        for pos in range(min(len(tokens) + n_new - 1, self.max_len) ):
            if pos < len(tokens):
                tok = tokens[pos]
            else:
                if sample is None:
                    tok = int(np.asarray(logits).argmax())
                else:
                    tok = int(sample(np.asarray(logits)))
                tokens.append(tok)
            outs = self.model.run_device(
                np.asarray([tok], np.int64), np.asarray([pos], np.int64), *caches)
            logits = outs[0][0]
            caches = list(outs[1:])
        if len(tokens) < len(prompt) + n_new and logits is not None:
            tokens.append(int(np.asarray(logits).argmax()))
        return tokens


class BatchedGenerator:
    """Batched decoding by vmapping the batch-1 step graph — the
    TPU-idiomatic route: one executable, SPMD over the batch axis, no graph
    rebuild. Prompts must share a length (pad upstream); caches carry a
    leading batch axis."""

    def __init__(self, step_graph, batch: int, config=None):
        import jax

        from .config import Config
        from .executor import Executor

        self.batch = batch
        cfg = config or Config()
        step_graph = _decode_graph(step_graph, cfg)
        ex = Executor(step_graph, cfg)
        params = ex.init_params()
        fn = ex.build_fn()
        self._fn = jax.jit(jax.vmap(lambda *args: fn(params, *args)))
        cache_names = [v.name for v in step_graph.inputs
                       if v.name.startswith(("k_cache_", "v_cache_"))]
        self.cache_shapes = [tuple(v.type.shape) for v in step_graph.inputs
                             if v.name.startswith(("k_cache_", "v_cache_"))]
        self.cache_dtypes = _cache_dtypes(step_graph, cfg, cache_names)
        self.max_len = self.cache_shapes[0][0]

    def generate(self, prompts: list[list[int]], n_new: int) -> list[list[int]]:
        import jax.numpy as jnp

        assert len(prompts) == self.batch
        plen = len(prompts[0])
        assert all(len(p) == plen for p in prompts), "equal-length prompts (pad upstream)"
        caches = [jnp.zeros((self.batch,) + s, d)
                  for s, d in zip(self.cache_shapes, self.cache_dtypes)]
        tokens = [list(p) for p in prompts]
        logits = None
        for pos in range(min(plen + n_new - 1, self.max_len)):
            if pos < plen:
                tok = np.asarray([[t[pos]] for t in tokens], np.int64)
            else:
                nxt = np.asarray(logits).argmax(-1)
                for bi in range(self.batch):
                    tokens[bi].append(int(nxt[bi]))
                tok = nxt.reshape(self.batch, 1).astype(np.int64)
            posv = np.full((self.batch, 1), pos, np.int64)
            outs = self._fn(tok, posv, *caches)
            logits = outs[0][:, 0]
            caches = list(outs[1:])
        if logits is not None and len(tokens[0]) < plen + n_new:
            nxt = np.asarray(logits).argmax(-1)
            for bi in range(self.batch):
                tokens[bi].append(int(nxt[bi]))
        return tokens


class FusedGenerator:
    """Whole greedy decode loop fused into ONE dispatch.

    Generator pays one host->device dispatch per token — fine on a local
    host (~us), ruinous over any RPC hop (~3 ms/dispatch through the dev
    tunnel caps decode at ~300 tok/s regardless of model). Here the
    prefill-and-generate loop is a lax.scan inside a single jit: the chip
    feeds each argmax back into the next step on its own, and the host
    gets the finished token array. Sampling runs on-chip (temperature /
    top-k, key in the scan carry); prompt length and n_new are static per
    compilation (one recompile per (plen, n_new) pair).

    ``prefill_graph`` (optional): a full-sequence graph
    (tokens (plen,) -> logits (plen, vocab) + filled k/v caches, e.g.
    llama_style.build_prefill) replaces the plen-1 prompt-feeding scan
    steps — each of which re-reads EVERY weight — with ONE forward at
    MXU rates. Weights are shared with the step graph BY NAME: the model
    builders name initializers by their weight-dict key and quantization
    is deterministic, so both graphs carry identical arrays under
    identical names and one device copy serves both.
    """

    def __init__(self, step_graph, config=None, prefill_graph=None):
        import jax
        import jax.numpy as jnp

        from .config import Config
        from .executor import Executor

        cfg = config or Config()
        step_graph = _decode_graph(step_graph, cfg)
        ex = Executor(step_graph, cfg)
        self._params = ex.init_params()
        self._step = ex.build_fn()
        self._config = cfg
        # prefill bucket ladder: {prompt_len: (fn, input_names)}
        self._prefills: dict[int, tuple] = {}
        self._host_map = {n: step_graph.initializers[n]
                          for n in self._params}
        if prefill_graph is not None:
            graphs = (prefill_graph
                      if isinstance(prefill_graph, (list, tuple))
                      else [prefill_graph])
            for g in graphs:
                pex = _merge_params(self._params, self._host_map, g, cfg)
                plen = next(v.type.shape[0] for v in g.inputs
                            if v.name == "tokens")
                self._prefills[plen] = (pex.build_fn(),
                                        [v.name for v in g.inputs])
        self.input_names = [v.name for v in step_graph.inputs]
        self.cache_names = [n for n in self.input_names
                            if n.startswith(("k_cache_", "v_cache_"))]
        # Any other non-token/pos input is a per-call context (e.g. the
        # encoder memory of a cross-attention decoder). It is loop-invariant
        # inside the scan, so XLA hoists its projections (cross-attention
        # K/V) out of the decode loop — computed once per utterance.
        self.context_names = [n for n in self.input_names
                              if n not in ("token", "pos")
                              and n not in set(self.cache_names)]
        self.context_types = {v.name: v.type.np_dtype
                              for v in step_graph.inputs
                              if v.name in set(self.context_names)}
        shapes = {v.name: tuple(v.type.shape) for v in step_graph.inputs}
        self._ctx_shapes = {n: shapes[n] for n in self.context_names}
        self._ctx_dtypes = dict(self.context_types)
        self.cache_shapes = [shapes[n] for n in self.cache_names]
        self.cache_dtypes = _cache_dtypes(step_graph, cfg, self.cache_names)
        self.max_len = self.cache_shapes[0][0]
        self._decode = jax.jit(
            self._make_decode(),
            static_argnames=("plen", "n_new", "top_k", "do_sample"))
        self._decode_pf = {
            plen: jax.jit(
                self._make_decode(use_prefill=plen),
                static_argnames=("plen", "n_new", "top_k", "do_sample"))
            for plen in self._prefills
        }

    def _make_decode(self, use_prefill: int | None = None):
        import jax
        import jax.numpy as jnp
        from jax import lax

        step = self._step
        input_names = list(self.input_names)
        cache_names = list(self.cache_names)
        context_names = list(self.context_names)
        prefill_fn, prefill_inputs = (
            self._prefills[use_prefill] if use_prefill else (None, []))

        def decode(params, prompt, plen, n_new, caches, ctxs=(),
                   key=None, temperature=1.0, top_k=0, do_sample=False):
            def ordered(tok, pos, caches):
                by_name = {"token": tok, "pos": pos}
                by_name.update(zip(cache_names, caches))
                by_name.update(zip(context_names, ctxs))
                return [by_name[n] for n in input_names]

            def pick(logits, k):
                """Next token from (vocab,) logits — greedy or sampled
                on-chip (temperature / top-k), key threaded via the carry."""
                if not do_sample:
                    return jnp.argmax(logits), k
                k, sub = jax.random.split(k)
                lg = logits.astype(jnp.float32) / temperature
                if top_k:
                    kth = lax.top_k(lg, top_k)[0][-1]
                    lg = jnp.where(lg < kth, -jnp.inf, lg)
                return jax.random.categorical(sub, lg), k

            # Step at position p consumes token[p], emits logits for p+1.
            def body(carry, pos):
                caches, tok, k = carry
                outs = step(params, *ordered(tok, pos[None], caches))
                nxt, k = pick(outs[0][0], k)
                nxt = nxt.astype(tok.dtype)
                # while still inside the prompt, feed the given token
                nxt = jnp.where(pos + 1 < plen,
                                prompt[jnp.minimum(pos + 1, plen - 1)], nxt)
                return (list(outs[1:]), nxt[None], k), nxt

            if key is None:
                key = jax.random.PRNGKey(0)
            if prefill_fn is not None:
                # one full-sequence forward fills the caches and yields
                # the logits for every prompt position; decode scans only
                # the n_new-1 remaining steps
                by = {"tokens": prompt}
                by.update(zip(context_names, ctxs))
                outs = prefill_fn(params, *[by[n] for n in prefill_inputs])
                first, key = pick(outs[0][plen - 1], key)
                first = first.astype(prompt.dtype)[None]
                (_, _, _), toks = lax.scan(
                    body, (list(outs[1:]), first, key),
                    jnp.arange(plen, plen + n_new - 1))
                return jnp.concatenate([first, toks])
            total = plen - 1 + n_new
            (_, _, _), toks = lax.scan(body, (list(caches), prompt[0:1], key),
                                       jnp.arange(total))
            return toks[plen - 1:]  # the n_new generated tokens

        return decode

    def generate(self, prompt: list[int], n_new: int,
                 context: dict | None = None,
                 temperature: float | None = None, top_k: int = 0,
                 seed: int = 0) -> list[int]:
        """Greedy decode, or — when temperature/top_k is given — sampled
        decode with the PRNG key threaded through the on-chip scan (still
        ONE dispatch; a given seed is reproducible)."""
        import jax
        import jax.numpy as jnp

        ctxs = tuple(jnp.asarray((context or {})[n])
                     for n in self.context_names)
        n_new = min(n_new, self.max_len - len(prompt))
        if n_new < 1:
            return list(prompt)
        dec_pf = self._decode_pf.get(len(prompt))
        use_pf = dec_pf is not None
        # prefill builds the caches itself; seed zeros only for the
        # scan-through-the-prompt path
        caches = [] if use_pf else [
            jnp.zeros(s, d)
            for s, d in zip(self.cache_shapes, self.cache_dtypes)]
        do_sample = temperature is not None or bool(top_k)
        temp = np.float32(1.0 if temperature is None else temperature)
        aot_key = (len(prompt), n_new, int(top_k), bool(do_sample))
        # AOT executables are compiled for the scan-through-prompt form
        fn = None if use_pf else getattr(self, "_aot", {}).get(aot_key)
        toks = None
        if fn is not None:  # pre-compiled executable (aot_load)
            try:
                toks = fn(self._params, jnp.asarray(prompt, jnp.int32),
                          caches=caches, ctxs=ctxs,
                          key=jax.random.PRNGKey(seed), temperature=temp)
            except Exception as e:  # noqa: BLE001 — device-assignment or
                # machine-feature mismatch surfaces at execution time;
                # self-heal onto the live jit (same policy as ArtifactModel)
                import warnings

                warnings.warn(
                    f"AOT decode executable rejected at execution "
                    f"({type(e).__name__}); recompiling", stacklevel=2)
                del self._aot[aot_key]
        if toks is None:
            dec = dec_pf if use_pf else self._decode
            toks = dec(self._params, jnp.asarray(prompt, jnp.int32),
                       plen=len(prompt), n_new=n_new, caches=caches,
                       ctxs=ctxs, key=jax.random.PRNGKey(seed),
                       temperature=temp,
                       top_k=int(top_k), do_sample=do_sample)
        return list(prompt) + [int(t) for t in np.asarray(toks)]

    # -- AOT decode executables (the batched/fused compiles are the slow
    # part of serving restarts: 322 s for the b32 vmap on a remote chip) --

    def _decode_structs(self, plen: int, seed: int = 0):
        import jax
        import jax.numpy as jnp

        # pin to one device: on multi-device hosts an unpinned lowering
        # serializes an executable that then demands per-device shards
        dev = jax.sharding.SingleDeviceSharding(jax.devices()[0])

        def sds(shape, dtype):
            return jax.ShapeDtypeStruct(shape, dtype, sharding=dev)

        prompt = sds((plen,), jnp.int32)
        caches = [sds(s, d)
                  for s, d in zip(self.cache_shapes, self.cache_dtypes)]
        ctxs = tuple(sds(self._ctx_shapes[n], self._ctx_dtypes[n])
                     for n in self.context_names)
        ks = jax.eval_shape(lambda: jax.random.PRNGKey(seed))
        key = sds(ks.shape, ks.dtype)
        return prompt, caches, ctxs, key

    def aot_save(self, path, plen: int, n_new: int,
                 temperature: float | None = None, top_k: int = 0) -> str:
        """Compile the decode for (plen, n_new[, sampling]) and serialize
        the XLA executable into `path`; aot_load restores it with zero
        compile on a matching jax version + backend (same contract as
        runtime/artifact.py's exec_*.xla files)."""
        import pickle

        from pathlib import Path

        from jax.experimental import serialize_executable

        do_sample = temperature is not None or bool(top_k)
        prompt, caches, ctxs, key = self._decode_structs(plen)
        temp = np.float32(1.0 if temperature is None else temperature)
        lowered = self._decode.lower(
            self._params, prompt, plen=plen, n_new=n_new, caches=caches,
            ctxs=ctxs, key=key, temperature=temp,
            top_k=int(top_k), do_sample=do_sample)
        compiled = lowered.compile()
        payload = serialize_executable.serialize(compiled)
        # record the compile-time device count: deserialize_and_load
        # defaults execution_devices to ALL local devices, and an
        # executable compiled for 1 device then demands N input shards
        # at execution and is rejected (the runtime/artifact.py probe53
        # lesson, same fix)
        try:
            import jax

            sh = jax.tree_util.tree_leaves(compiled.input_shardings[0])[0]
            dc = len(sh.device_set)
        except Exception:  # noqa: BLE001
            dc = 1
        p = Path(path)
        p.mkdir(parents=True, exist_ok=True)
        f = p / (f"decode_{plen}_{n_new}_{int(top_k)}_{int(do_sample)}"
                 f"_{dc}.xla")
        f.write_bytes(pickle.dumps(payload))
        return str(f)

    def aot_load(self, path) -> int:
        """Load every decode_*.xla executable under `path`; returns how
        many installed. generate() uses them when (plen, n_new, top_k,
        do_sample) matches."""
        import pickle

        from pathlib import Path

        from jax.experimental import serialize_executable

        import jax

        self._aot = getattr(self, "_aot", {})
        n = 0
        for f in sorted(Path(path).glob("decode_*.xla")):
            try:
                fields = [int(v) for v in f.stem.split("_")[1:6]]
                plen, n_new, top_k, ds = fields[:4]
                # 5th field = compile-time device count (older files
                # lack it; assume 1). Pin execution_devices to it — the
                # default (all local devices) makes a 1-device
                # executable demand N input shards and reject.
                dc = fields[4] if len(fields) > 4 else 1
                if len(jax.devices()) < dc:
                    continue
                payload = pickle.loads(f.read_bytes())
                self._aot[(plen, n_new, top_k, bool(ds))] = \
                    serialize_executable.deserialize_and_load(
                        *payload, execution_devices=jax.devices()[:dc])
                n += 1
            except Exception:  # noqa: BLE001 — version-mismatched file
                continue
        return n


class FusedBatchedGenerator:
    """Batched one-dispatch decoding: vmap over FusedGenerator's scan.
    Equal-length prompts (pad upstream); one dispatch decodes the whole
    batch — the offline-batch / high-throughput serving shape."""

    def __init__(self, step_graph, batch: int, config=None,
                 prefill_graph=None):
        import jax

        self.batch = batch
        self._single = FusedGenerator(step_graph, config,
                                      prefill_graph=prefill_graph)
        decode = self._single._make_decode()
        # per-stream: prompt, caches, contexts, and the sampling key
        axes = (None, 0, None, None, 0, 0, 0, None, None, None)
        self._decode = jax.jit(jax.vmap(decode, in_axes=axes),
                               static_argnums=(2, 3, 8, 9))
        self._decode_pf = {
            plen: jax.jit(
                jax.vmap(self._single._make_decode(use_prefill=plen),
                         in_axes=axes),
                static_argnums=(2, 3, 8, 9))
            for plen in self._single._prefills
        }
        self.max_len = self._single.max_len

    def generate(self, prompts: list[list[int]], n_new: int,
                 context: dict | None = None,
                 temperature: float | None = None, top_k: int = 0,
                 seed: int = 0) -> list[list[int]]:
        import jax
        import jax.numpy as jnp

        assert len(prompts) == self.batch
        plen = len(prompts[0])
        assert all(len(p) == plen for p in prompts), "equal-length prompts (pad upstream)"
        n_new = min(n_new, self.max_len - plen)
        if n_new < 1:
            return [list(p) for p in prompts]
        dec_pf = self._decode_pf.get(plen)
        use_pf = dec_pf is not None
        caches = [] if use_pf else [
            jnp.zeros((self.batch,) + s, d)
            for s, d in zip(self._single.cache_shapes,
                            self._single.cache_dtypes)]
        ctxs = tuple(jnp.asarray((context or {})[n])  # leading batch axis
                     for n in self._single.context_names)
        do_sample = temperature is not None or bool(top_k)
        keys = jax.random.split(jax.random.PRNGKey(seed), self.batch)
        dec = dec_pf if use_pf else self._decode
        toks = dec(self._single._params,
                   jnp.asarray(prompts, jnp.int32), plen, n_new,
                   caches, ctxs, keys,
                   1.0 if temperature is None else float(temperature),
                   int(top_k), do_sample)
        toks = np.asarray(toks)
        return [list(p) + [int(t) for t in toks[i]]
                for i, p in enumerate(prompts)]
