"""TPU probe #76: the decode quant ladder, INTERLEAVED (final numbers).

probe74 proved cross-session deltas on this chip reach 90% (sequential
sessions measured the same 1.3B int4 arm at 1.40/1.48/2.65 ms/tok; the
interleaved truth is 0.55). probe69's ladder (bf16/int8/int4) was
sequential — re-measure with every arm resident and rounds interleaved.

1.3B: bf16 / int8-pc / int4-g128.   7B: int8-pc / int4-g128.
"""

import gc
import time

CONFIGS = {
    "1.3b": (dict(vocab=32000, dim=2048, heads=16, kv_heads=8, ffn=5632,
                  layers=24), ["bf16", "int8", "int4-g128"]),
    "7b": (dict(vocab=32000, dim=4096, heads=32, kv_heads=8, ffn=11008,
                layers=32), ["int8", "int4-g128"]),
}
MAX_LEN = 512


def main():
    import jax

    import smelter_tpu as st
    from smelter_tpu.models import llama_style
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import quantize_weights
    from smelter_tpu.runtime.generate import FusedGenerator

    print("devices:", jax.devices(), flush=True)
    p8 = list(range(1, 9))

    def timed(gen, n):
        t0 = time.perf_counter()
        gen.generate(p8, n)
        return time.perf_counter() - t0

    for size, (cfg, arms) in CONFIGS.items():
        t0 = time.perf_counter()
        w = llama_style.make_weights(max_len=MAX_LEN, **cfg)
        print(f"\n=== {size}: weights in {time.perf_counter()-t0:.0f}s ===",
              flush=True)
        gens = {}
        wbytes = {}
        for arm in arms:
            t0 = time.perf_counter()
            g, _ = llama_style.build_decode_step(w, max_len=MAX_LEN, **cfg)
            if arm != "bf16":
                quantize_weights(g, arm, min_elements=1 << 16)
                run_passes(g, ["fuse_dequant_matmul", "dce"])
            wbytes[arm] = sum(
                (a.nbytes // 2 if arm == "bf16" and a.dtype.kind == "f"
                 else a.nbytes)
                for nm, a in g.initializers.items() if nm != "wte")
            gens[arm] = FusedGenerator(
                g, st.Config(compute_dtype="bfloat16"))
            gens[arm].generate(p8, 16)
            gens[arm].generate(p8, 80)
            print(f"[{arm}] ready in {time.perf_counter()-t0:.0f}s",
                  flush=True)
        del w
        gc.collect()
        best = {a: float("inf") for a in arms}
        for _ in range(5):
            for arm in arms:
                lo = min(timed(gens[arm], 16), timed(gens[arm], 16))
                hi = min(timed(gens[arm], 80), timed(gens[arm], 80))
                best[arm] = min(best[arm], (hi - lo) / 64)
        for arm in arms:
            t = best[arm]
            print(f"[{size}/{arm}] {t*1e3:6.2f} ms/tok = {1/t:7,.0f} tok/s"
                  f"   apparent weight stream "
                  f"{wbytes[arm]/t/1e9:6.0f} GB/s", flush=True)
        del gens
        gc.collect()
        jax.clear_caches()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
