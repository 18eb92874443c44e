"""TPU probe #78: int8 KV cache at long context (7B, max_len=4096).

The decode step reads the full static-shape cache every step, so at 4k
context the bf16 caches add 537 MB/step (32L x 2 x 4096 x 1024 x 2B) on
top of the 3.2 GB int4 weight stream; kv_quant halves that. Interleaved
bf16-cache vs int8-cache arms, same weights, same harness. Capacity
math (the other half of the feature): b16 slots x 4k context = 8.6 GB
of bf16 caches on a 16 GB chip that also holds 3.7 GB of weights —
int8 caches make the difference between fitting and not.
"""

import gc
import time

CFG = dict(vocab=32000, dim=4096, heads=32, kv_heads=8, ffn=11008,
           layers=32)
MAX_LEN = 4096


def main():
    import jax

    import smelter_tpu as st
    from smelter_tpu.models import llama_style
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import quantize_weights
    from smelter_tpu.runtime.generate import FusedGenerator

    print("devices:", jax.devices(), flush=True)
    t0 = time.perf_counter()
    w = llama_style.make_weights(max_len=MAX_LEN, **CFG)
    print(f"weights built in {time.perf_counter()-t0:.0f}s", flush=True)

    gens = {}
    for arm, kvq in (("bf16-cache", False), ("int8-cache", True)):
        t0 = time.perf_counter()
        g, _ = llama_style.build_decode_step(w, max_len=MAX_LEN,
                                             kv_quant=kvq, **CFG)
        quantize_weights(g, "int4-g128", min_elements=1 << 16)
        run_passes(g, ["fuse_dequant_matmul", "dce"])
        gens[arm] = FusedGenerator(g, st.Config(compute_dtype="bfloat16"))
        gens[arm].generate(list(range(1, 9)), 16)
        gens[arm].generate(list(range(1, 9)), 80)
        print(f"[{arm}] ready in {time.perf_counter()-t0:.0f}s", flush=True)
    del w
    gc.collect()

    p8 = list(range(1, 9))

    def timed(gen, n):
        t0 = time.perf_counter()
        gen.generate(p8, n)
        return time.perf_counter() - t0

    best = {a: float("inf") for a in gens}
    for _ in range(5):
        for arm, gen in gens.items():
            lo = min(timed(gen, 16), timed(gen, 16))
            hi = min(timed(gen, 80), timed(gen, 80))
            best[arm] = min(best[arm], (hi - lo) / 64)
    for arm, t in best.items():
        print(f"[7b ctx4096 {arm}] {t*1e3:.2f} ms/tok = "
              f"{1/t:,.0f} tok/s", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
