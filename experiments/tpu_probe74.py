"""TPU probe #74: int4 kernel block_n — INTERLEAVED e2e sweep at 1.3B.

The story so far is inconsistent: micro (probe70) says full-row blocks
beat bn=512 by 2-5x, but e2e 1.3B decode measured 1.40 ms/tok at bn=512
(probe69), 1.48 with auto-v1 (session 2) and 2.65 with auto-v2
(session 3) — sequential sessions on a +-10% multi-tenant chip. This
probe holds ALL arms resident and interleaves rounds (the probe32/55
discipline: never believe a cross-session delta) to settle the policy.

Arms: block_n = auto(None) / 512 / 2048, same weights, same harness.
"""

import time


def main():
    import gc

    import jax

    import smelter_tpu as st
    from smelter_tpu.models import llama_style
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import quantize_weights
    from smelter_tpu.runtime.generate import FusedGenerator

    CFG = dict(vocab=32000, dim=2048, heads=16, kv_heads=8, ffn=5632,
               layers=24)
    MAX_LEN = 512
    print("devices:", jax.devices(), flush=True)
    t0 = time.perf_counter()
    w = llama_style.make_weights(max_len=MAX_LEN, **CFG)
    print(f"weights built in {time.perf_counter()-t0:.0f}s", flush=True)

    step_g, _ = llama_style.build_decode_step(w, max_len=MAX_LEN, **CFG)
    quantize_weights(step_g, "int4-g128", min_elements=1 << 16)
    run_passes(step_g, ["fuse_dequant_matmul", "dce"])
    del w
    gc.collect()

    gens = {}
    for bn in (None, 512, 2048):
        t0 = time.perf_counter()
        gens[bn] = FusedGenerator(
            step_g, st.Config(compute_dtype="bfloat16", int4_block_n=bn))
        gens[bn].generate(list(range(1, 9)), 16)   # compile lo
        gens[bn].generate(list(range(1, 9)), 80)   # compile hi
        print(f"[bn={bn}] ready in {time.perf_counter()-t0:.0f}s",
              flush=True)

    p8 = list(range(1, 9))

    def timed(gen, n):
        t0 = time.perf_counter()
        gen.generate(p8, n)
        return time.perf_counter() - t0

    best = {bn: float("inf") for bn in gens}
    for _ in range(5):  # interleave: each round touches every arm
        for bn, gen in gens.items():
            lo = min(timed(gen, 16), timed(gen, 16))
            hi = min(timed(gen, 80), timed(gen, 80))
            best[bn] = min(best[bn], (hi - lo) / 64)
    for bn, t in best.items():
        print(f"[1.3b int4 bn={bn}] {t*1e3:.2f} ms/tok = "
              f"{1/t:,.0f} tok/s", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
