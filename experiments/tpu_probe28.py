"""TPU campaign #28: llama-style decode throughput (FusedGenerator).

tiny-GPT (4L/256d, LN+GELU) measured 4,348 tok/s single-stream fused
decode (probe10). The llama-style family adds rotary embeddings, GQA
head-sharing and a SwiGLU MLP per step — this measures what those cost
through the same one-dispatch scan, plus the batched (vmap) form and
sampled decoding (on-chip top-k), at a comparable size.
"""

import time

import numpy as np


def main():
    import jax

    from smelter_tpu.models import llama_style
    from smelter_tpu.runtime.generate import (FusedBatchedGenerator,
                                              FusedGenerator)

    print("devices:", jax.devices())
    cfg = dict(vocab=512, dim=256, heads=8, kv_heads=4, ffn=1024, layers=4)
    max_len = 256
    n_new = 200
    step_g, _ = llama_style.build_decode_step(max_len=max_len, **cfg)

    gen = FusedGenerator(step_g)
    t0 = time.perf_counter()
    out = gen.generate([1, 2, 3, 4], n_new)
    t_compile = time.perf_counter() - t0
    print(f"single-stream compile+first: {t_compile:.1f}s")
    t0 = time.perf_counter()
    out = gen.generate([1, 2, 3, 4], n_new)
    dt = time.perf_counter() - t0
    print(f"greedy single: {n_new / dt:,.0f} tok/s ({dt*1e3:.0f} ms)")

    t0 = time.perf_counter()
    out = gen.generate([1, 2, 3, 4], n_new, temperature=0.8, top_k=40)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = gen.generate([1, 2, 3, 4], n_new, temperature=0.8, top_k=40)
    dt = time.perf_counter() - t0
    print(f"sampled single (top-k 40): {n_new / dt:,.0f} tok/s "
          f"(compile {t_compile:.1f}s)")

    b = 16
    bgen = FusedBatchedGenerator(step_g, batch=b)
    prompts = [[1, 2, 3, 4]] * b
    t0 = time.perf_counter()
    bgen.generate(prompts, n_new)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    bgen.generate(prompts, n_new)
    dt = time.perf_counter() - t0
    print(f"greedy batched b{b}: {b * n_new / dt:,.0f} tok/s aggregate "
          f"({n_new / dt:,.0f}/seq; compile {t_compile:.1f}s)")
    print("DONE")


if __name__ == "__main__":
    main()
