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


class Generator:
    def __init__(self, step_graph, config=None, layers: int | None = None):
        from .config import Config
        from .executor import CompiledModel

        self.model = CompiledModel(step_graph, config or Config())
        cache_inputs = [v for v in step_graph.inputs
                        if v.name.startswith(("k_cache_", "v_cache_"))]
        self.cache_shapes = [tuple(v.type.shape) for v in cache_inputs]
        self.max_len = self.cache_shapes[0][0]

    def generate(self, prompt: list[int], n_new: int,
                 sample=None) -> list[int]:
        """Greedy (or `sample(logits)->token`) decoding. Returns
        prompt + generated tokens."""
        import jax.numpy as jnp

        caches = [jnp.zeros(s, jnp.float32) for s in self.cache_shapes]
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
        ex = Executor(step_graph, config or Config())
        params = ex.init_params()
        fn = ex.build_fn()
        self._fn = jax.jit(jax.vmap(lambda *args: fn(params, *args)))
        self.cache_shapes = [tuple(v.type.shape) for v in step_graph.inputs
                             if v.name.startswith(("k_cache_", "v_cache_"))]
        self.max_len = self.cache_shapes[0][0]

    def generate(self, prompts: list[list[int]], n_new: int) -> list[list[int]]:
        import jax.numpy as jnp

        assert len(prompts) == self.batch
        plen = len(prompts[0])
        assert all(len(p) == plen for p in prompts), "equal-length prompts (pad upstream)"
        caches = [jnp.zeros((self.batch,) + s, jnp.float32)
                  for s in self.cache_shapes]
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
