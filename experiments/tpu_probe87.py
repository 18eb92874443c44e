"""TPU probe #87: wide-span validation of the 7B headline + ragged
block-size sweep (the two numbers still resting on short-span data).

  a) 7B int4-g128 single-stream: the published 4.76 ms/tok came from a
     64-step (305 ms) span — above the ~100 ms danger window but worth
     one 128-step (>600 ms) confirmation since it is a README headline.
     Floor: ~3.5 GB weights+scales -> 4.3 ms/tok at 819 GB/s.
  b) 1.3B ctx4096 ragged block 1024 vs 256: probe82's sweep rows were
     invalidated by the span artifact; the kernel's default block
     (1024) is currently justified only by the broken readings.
"""

import gc
import time

CFG7 = dict(vocab=32000, dim=4096, heads=32, kv_heads=8, ffn=11008,
            layers=32)
CFG13 = dict(vocab=32000, dim=2048, heads=16, kv_heads=8, ffn=5632,
             layers=24)


def main():
    import jax

    import smelter_tpu as st
    from smelter_tpu.models import llama_style
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import quantize_weights
    from smelter_tpu.runtime.generate import FusedGenerator

    print("devices:", jax.devices(), flush=True)

    def q4(g):
        quantize_weights(g, "int4-g128", min_elements=1 << 16)
        run_passes(g, ["fuse_dequant_matmul", "dce"])
        return g

    p8 = list(range(1, 9))

    def measure(gen, n_lo, n_hi, rounds=4):
        best = float("inf")
        for _ in range(rounds):
            ts = {}
            for n in (n_lo, n_hi):
                t0 = time.perf_counter()
                gen.generate(p8, n)
                t1 = time.perf_counter()
                gen.generate(p8, n)
                ts[n] = min(t1 - t0, time.perf_counter() - t1)
            best = min(best, (ts[n_hi] - ts[n_lo]) / (n_hi - n_lo))
        return best

    # -- a) 7B wide-span -------------------------------------------------
    t0 = time.perf_counter()
    w7 = llama_style.make_weights(max_len=512, **CFG7)
    print(f"7B weights in {time.perf_counter()-t0:.0f}s", flush=True)
    g7 = q4(llama_style.build_decode_step(w7, max_len=512, **CFG7)[0])
    gen7 = FusedGenerator(g7, st.Config(compute_dtype="bfloat16"))
    gen7.generate(p8, 16)
    gen7.generate(p8, 144)
    t = measure(gen7, 16, 144)
    print(f"[7b int4 wide(16->144)] {t*1e3:6.2f} ms/tok = "
          f"{1/t:6,.0f} tok/s (floor ~4.3 ms; published 4.76)",
          flush=True)
    del gen7, g7, w7
    gc.collect()
    jax.clear_caches()

    # -- b) 1.3B ragged block sweep, wide spans, interleaved -------------
    t0 = time.perf_counter()
    w = llama_style.make_weights(max_len=4096, **CFG13)
    print(f"1.3B weights in {time.perf_counter()-t0:.0f}s", flush=True)
    arms = {}
    for name, blk in (("rag1024", None), ("rag256", 256)):
        g = q4(llama_style.build_decode_step(w, max_len=4096, **CFG13)[0])
        gen = FusedGenerator(
            g, st.Config(compute_dtype="bfloat16", ragged_attention=True,
                         ragged_block=blk))
        gen.generate(p8, 16)
        gen.generate(p8, 528)
        arms[name] = gen
        print(f"[{name}] ready", flush=True)
    best = {n: float("inf") for n in arms}
    for _ in range(4):
        for name, gen in arms.items():
            best[name] = min(best[name], measure(gen, 16, 528, rounds=1))
    for name, t in best.items():
        print(f"[1.3b ctx4096 {name}] {t*1e3:6.3f} ms/tok = "
              f"{1/t:6,.0f} tok/s", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
