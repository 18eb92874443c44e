"""Speculative decoding: draft-and-verify greedy generation in ONE dispatch.

A small DRAFT model proposes gamma tokens with cheap per-token steps; the
TARGET model verifies all gamma+1 positions in one chunked causal forward
(llama_style.build_decode_step(chunk=gamma+1)) that reads each weight
ONCE for the whole chunk. Greedy acceptance: the longest prefix of draft
tokens matching the target's argmax chain is kept, plus the target's own
token at the first mismatch (or the bonus token when all match) — so the
OUTPUT IS TOKEN-FOR-TOKEN IDENTICAL to plain greedy decoding of the
target, regardless of draft quality; only the number of rounds varies.
The whole rounds loop runs inside one jitted lax.while_loop: the host
gets back the finished token buffer.

Parity caveat (measured, probe75): "identical" means identical in the
target's own numerics. Under bfloat16 the chunk form (M=gamma+1) and
the step form (M=1) may round a logit differently at the last bf16 bit
(max |dlogit| ~= 0.06 at 1.3B scale), so chains can diverge where the
top-2 logit gap is EXACTLY zero at bf16 resolution — common for
repetition cycles of random-weight models, vanishingly rare for trained
ones. In float32 (and on CPU) parity is exact; the test suite pins it.

Weight-HBM economics (the decode bottleneck, probe67/69): a round costs
gamma draft-model reads + ONE target-model read for up to gamma+1
tokens; with acceptance rate alpha the target stream amortizes to
~1/(1 + alpha*gamma) of per-token decoding.

Cache-staleness discipline (why no rewind is needed): a step at position
p writes cache row p before any attention read of row p, and row i of a
chunk attends only positions <= pos+i — so rows written by REJECTED
speculation are overwritten by the chunk/step that later reaches those
positions, before they are ever attended.

Reference scope: none (the reference is a single-forward CNN engine,
SURVEY.md §0); this is the modern LLM serving feature set the build
mandate's continuous-batching north star implies (BASELINE.json:5).
"""

from __future__ import annotations

import numpy as np

from .generate import _cache_dtypes


class SpeculativeGenerator:
    """Greedy speculative decoding over (target step, target chunk-step,
    draft step) graphs.

    target_step / target_chunk must be built from ONE weight dict (they
    share device params by initializer name, like FusedGenerator's
    prefill); draft_step is a separate (smaller) model with its own
    params. ``prefill_graph`` optionally seeds the target caches with one
    full-sequence forward (llama_style.build_prefill)."""

    def __init__(self, target_step, target_chunk, draft_step, config=None,
                 draft_config=None, prefill_graph=None):
        import jax
        import jax.numpy as jnp

        from .config import Config
        from .executor import Executor

        cfg = config or Config()
        dcfg = draft_config or cfg
        from .generate import _decode_graph

        target_step = _decode_graph(target_step, cfg)
        target_chunk = _decode_graph(target_chunk, cfg)
        draft_step = _decode_graph(draft_step, dcfg)
        ex_t = Executor(target_step, cfg)
        self._params_t = ex_t.init_params()
        self._step_t = ex_t.build_fn()
        host_map = {n: target_step.initializers[n] for n in self._params_t}
        # content-aware share-by-name (generate._merge_params): the big
        # quantized weights are identical twins; colliding auto-named
        # constants get renamed in the companion graph
        from .generate import _merge_params

        ex_c = _merge_params(self._params_t, host_map, target_chunk, cfg)
        self._chunk_t = ex_c.build_fn()
        ex_d = Executor(draft_step, dcfg)
        self._params_d = ex_d.init_params()
        self._step_d = ex_d.build_fn()

        def names(g):
            return [v.name for v in g.inputs]

        self._in_t, self._in_c, self._in_d = (
            names(target_step), names(target_chunk), names(draft_step))
        self._cnames_t = [n for n in self._in_t
                          if n.startswith(("k_cache_", "v_cache_"))]
        self._cnames_d = [n for n in self._in_d
                          if n.startswith(("k_cache_", "v_cache_"))]
        shapes_t = {v.name: tuple(v.type.shape) for v in target_step.inputs}
        shapes_d = {v.name: tuple(v.type.shape) for v in draft_step.inputs}
        self._cshapes_t = [shapes_t[n] for n in self._cnames_t]
        self._cshapes_d = [shapes_d[n] for n in self._cnames_d]
        self._cdts_t = _cache_dtypes(target_step, cfg, self._cnames_t)
        self._cdts_d = _cache_dtypes(draft_step, dcfg, self._cnames_d)
        self.max_len = min(self._cshapes_t[0][0], self._cshapes_d[0][0])
        cshape = next(v.type.shape for v in target_chunk.inputs
                      if v.name == "token")
        self.gamma = int(cshape[0]) - 1
        if self.gamma < 1:
            raise ValueError("target_chunk must take >= 2 tokens")

        self._prefill_fn = None
        self._prefill_len = None
        if prefill_graph is not None:
            ex_p = _merge_params(self._params_t, host_map, prefill_graph,
                                 cfg)
            self._prefill_fn = ex_p.build_fn()
            self._in_p = names(prefill_graph)
            self._prefill_len = next(
                v.type.shape[0] for v in prefill_graph.inputs
                if v.name == "tokens")

        self._decode = jax.jit(self._make_decode(),
                               static_argnames=("plen", "n_new",
                                                "use_prefill", "top_k",
                                                "do_sample"))
        # measured per-call acceptance (host-visible diagnostics)
        self.last_rounds = None
        self.last_accept_rate = None

    def _make_decode(self):
        import jax.numpy as jnp
        from jax import lax

        gamma = self.gamma
        max_len = self.max_len
        step_t, chunk_t, step_d = self._step_t, self._chunk_t, self._step_d
        prefill_fn = self._prefill_fn
        in_t, in_c, in_d = self._in_t, self._in_c, self._in_d
        cn_t, cn_d = list(self._cnames_t), list(self._cnames_d)

        def ordered(names, cnames, tok, pos, caches):
            by = {"token": tok, "pos": pos}
            by.update(zip(cnames, caches))
            return [by[n] for n in names]

        def decode(pt, pd, prompt, plen, n_new, t_caches, d_caches,
                   use_prefill=False, key=None, temperature=1.0,
                   top_k=0, do_sample=False):
            import jax

            buf = jnp.zeros((n_new + gamma + 1,), jnp.int32)
            if key is None:
                key = jax.random.PRNGKey(0)

            def dist(logits):
                """The sampling distribution (temperature / top-k) —
                applied identically to draft (q) and target (p) rows, as
                the rejection-sampling guarantee requires."""
                lg = logits.astype(jnp.float32) / temperature
                if top_k:
                    kth = lax.top_k(lg, top_k)[0][..., -1:]
                    lg = jnp.where(lg < kth, -jnp.inf, lg)
                return jax.nn.softmax(lg, axis=-1)

            def sample_from(probs, k):
                k, sub = jax.random.split(k)
                return (jax.random.categorical(
                    sub, jnp.log(probs + 1e-30)).astype(jnp.int32), k)

            # ---- prompt phase ------------------------------------------
            if use_prefill:
                outs = prefill_fn(pt, prompt)
                t_caches = list(outs[1:])
                if do_sample:
                    first, key = sample_from(dist(outs[0][plen - 1]), key)
                else:
                    first = jnp.argmax(outs[0][plen - 1]).astype(jnp.int32)
                buf = buf.at[0].set(first)
                pos0, last0, done0 = plen, first, 1
                d_len = plen  # draft consumes the whole prompt
            else:
                def t_feed(carry, pos):
                    caches, tok = carry
                    outs = step_t(pt, *ordered(in_t, cn_t, tok[None],
                                               pos[None], caches))
                    return (list(outs[1:]), prompt[pos + 1]), 0
                (t_caches, _), _ = lax.scan(
                    t_feed, (list(t_caches), prompt[0]),
                    jnp.arange(plen - 1))
                pos0, last0, done0 = plen - 1, prompt[plen - 1], 0
                d_len = plen - 1

            def d_feed(carry, pos):
                caches, tok = carry
                outs = step_d(pd, *ordered(in_d, cn_d, tok[None],
                                           pos[None], caches))
                nxt = prompt[jnp.minimum(pos + 1, plen - 1)]
                return (list(outs[1:]), nxt), 0
            (d_caches, _), _ = lax.scan(
                d_feed, (list(d_caches), prompt[0]), jnp.arange(d_len))

            # ---- speculative rounds ------------------------------------
            limit = max_len  # chunk scatters rows pos..pos+gamma

            def cond(carry):
                return ((carry[6] < n_new)
                        & (carry[2] <= limit - 1 - gamma))

            def round_(carry):
                (t_caches, d_caches, pos, last, prev, buf, n_done,
                 rounds, k) = carry

                # Draft scan with a CATCH-UP step (j = -1): after a fully
                # accepted round the draft never ingested the last draft
                # token, so each round re-feeds the token at pos-1 first —
                # idempotent when already ingested (same row, same value),
                # and exactly the missing ingest otherwise.
                def dstep(c, j):
                    caches, tok, kk = c
                    pp = jnp.maximum(pos + j, 0)
                    outs = step_d(pd, *ordered(
                        in_d, cn_d, tok[None], pp[None], caches))
                    if do_sample:
                        q = dist(outs[0][-1])
                        nxt, kk = sample_from(q, kk)
                    else:
                        q = jnp.zeros((1,), jnp.float32)  # unused in greedy
                        nxt = jnp.argmax(outs[0][-1]).astype(jnp.int32)
                    nxt = jnp.where(j < 0, last, nxt)
                    return (list(outs[1:]), nxt, kk), (nxt, q)
                (d_caches, _, k), (outs_d, q_all) = lax.scan(
                    dstep, (list(d_caches), prev, k), jnp.arange(-1, gamma))
                drafts = outs_d[1:]  # d_1..d_gamma
                q_rows = q_all[1:]   # (gamma, vocab) draft distributions

                toks = jnp.concatenate([last[None], drafts])  # (gamma+1,)
                outs = chunk_t(pt, *ordered(in_c, cn_t, toks, pos[None],
                                            t_caches))
                t_caches = list(outs[1:])
                if do_sample:
                    # rejection sampling (Leviathan/Chen): accept draft i
                    # with prob min(1, p_i(x_i)/q_i(x_i)); at the first
                    # rejection resample from norm(max(p-q, 0)); bonus
                    # token from p_gamma when all accepted — the output
                    # distribution equals plain sampling from the target.
                    p_rows = dist(outs[0])                   # (g+1, vocab)
                    p_d = jnp.take_along_axis(
                        p_rows[:gamma], drafts[:, None], -1)[:, 0]
                    q_d = jnp.take_along_axis(
                        q_rows, drafts[:, None], -1)[:, 0]
                    k, sub = jax.random.split(k)
                    u = jax.random.uniform(sub, (gamma,))
                    ok = u * q_d <= p_d
                    acc = jnp.cumprod(ok.astype(jnp.int32))
                    a = acc.sum()
                    p_a = p_rows[a]
                    q_a = jnp.where(a < gamma,
                                    q_rows[jnp.minimum(a, gamma - 1)],
                                    jnp.zeros_like(p_a))
                    resid = jnp.maximum(p_a - q_a, 0.0)
                    base = jnp.where(resid.sum() > 1e-9, resid, p_a)
                    resamp, k = sample_from(base, k)
                    emit = jnp.concatenate(
                        [drafts, drafts[-1:]]).at[a].set(resamp)
                else:
                    tnext = jnp.argmax(outs[0], axis=-1).astype(jnp.int32)
                    acc = jnp.cumprod(
                        (drafts == tnext[:gamma]).astype(jnp.int32))
                    a = acc.sum()
                    emit = tnext
                # emit tokens 1..a+1; entries beyond a+1 are provisional
                # and get overwritten by the next round's write at n_done+a+1
                buf = lax.dynamic_update_slice(buf, emit, (n_done,))
                # token at the new pos-1 (next round's catch-up ingest):
                # position pos+a holds draft a (accepted) when a > 0
                prev2 = jnp.where(a > 0, drafts[jnp.maximum(a - 1, 0)],
                                  last)
                return (t_caches, d_caches, pos + a + 1, emit[a], prev2,
                        buf, n_done + a + 1, rounds + 1, k)

            prev0 = (prompt[plen - 1] if use_prefill
                     else prompt[max(plen - 2, 0)]).astype(jnp.int32)
            carry = (list(t_caches), list(d_caches),
                     jnp.asarray(pos0, jnp.int32), last0.astype(jnp.int32),
                     prev0, buf, jnp.asarray(done0, jnp.int32),
                     jnp.asarray(0, jnp.int32), key)
            carry = lax.while_loop(cond, round_, carry)
            t_caches2, _, pos, last, _, buf, n_done, rounds, key = carry

            # ---- plain-step tail --------------------------------------
            # Near the cache end the chunk's gamma+1-row scatter would
            # spill past max_len, so the rounds loop stops early (cond's
            # pos bound) with at most `gamma` tokens outstanding; finish
            # them with single steps so the token contract matches
            # FusedGenerator exactly (n_new = max_len - plen).
            def tail(c, _):
                t_caches, pos, last, buf, n_done, k = c
                outs = step_t(pt, *ordered(in_t, cn_t, last[None],
                                           pos[None], t_caches))
                if do_sample:
                    nxt, k = sample_from(dist(outs[0][0]), k)
                else:
                    nxt = jnp.argmax(outs[0][0]).astype(jnp.int32)
                do = n_done < n_new
                buf = jnp.where(
                    do, lax.dynamic_update_slice(buf, nxt[None], (n_done,)),
                    buf)
                pos = jnp.where(do, pos + 1, pos)
                last = jnp.where(do, nxt, last)
                n_done = jnp.where(do, n_done + 1, n_done)
                return (list(outs[1:]), pos, last, buf, n_done, k), 0

            def run_tail(op):
                return lax.scan(tail, op, None, length=gamma)[0]

            op = (t_caches2, pos, last, buf, n_done, key)
            emitted_rounds = n_done - done0  # tokens from spec rounds only
            op = lax.cond(n_done < n_new, run_tail, lambda o: o, op)
            return op[3][:n_new], rounds, emitted_rounds

        return decode

    def generate(self, prompt: list[int], n_new: int,
                 temperature: float | None = None, top_k: int = 0,
                 seed: int = 0) -> list[int]:
        """Greedy decode — identical tokens to FusedGenerator.generate on
        the target model; rounds/acceptance recorded on self.last_*.

        With temperature/top_k: SAMPLED speculative decoding via
        rejection sampling (accept draft i with prob min(1, p/q), first
        rejection resamples from norm(max(p-q, 0)), full acceptance
        samples the bonus from p) — the output DISTRIBUTION equals plain
        sampling from the target (distribution-tested); individual
        tokens differ from FusedGenerator's sampled chain because the
        PRNG key is consumed in a different order."""
        import jax
        import jax.numpy as jnp

        n_new = min(n_new, self.max_len - len(prompt))
        if n_new < 1:
            return list(prompt)
        use_pf = (self._prefill_fn is not None
                  and len(prompt) == self._prefill_len)
        do_sample = temperature is not None or bool(top_k)
        t_caches = [jnp.zeros(s, d)
                    for s, d in zip(self._cshapes_t, self._cdts_t)]
        d_caches = [jnp.zeros(s, d)
                    for s, d in zip(self._cshapes_d, self._cdts_d)]
        toks, rounds, emitted = self._decode(
            self._params_t, self._params_d,
            jnp.asarray(prompt, jnp.int32), plen=len(prompt), n_new=n_new,
            t_caches=t_caches, d_caches=d_caches, use_prefill=use_pf,
            key=jax.random.PRNGKey(seed),
            temperature=np.float32(1.0 if temperature is None
                                   else temperature),
            top_k=int(top_k), do_sample=do_sample)
        self.last_rounds = int(rounds)
        # tokens per round = 1 + accepted drafts; plain-step tail tokens
        # (near max_len) are excluded — they carry no acceptance signal
        self.last_accept_rate = (
            (int(emitted) / self.last_rounds - 1.0) / self.gamma
            if self.last_rounds else None)
        return list(prompt) + [int(t) for t in np.asarray(toks)]
