"""Autoregressive decoding driver over a cache-step graph.

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
