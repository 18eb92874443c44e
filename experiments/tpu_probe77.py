"""TPU probe #77: 7B speculative-round economics + bench --decode smoke.

The 1.3B interleaved numbers (probe75): round = 1.40x a plain step ->
3.0x tok/s at 80% acceptance. At 7B the target step is 4.76 ms (probe76)
and a 4L/256d draft step is ~0.15 ms, so the draft overhead fraction
shrinks — measure t_round interleaved with the plain step, plus the
prefill form, at the flagship geometry.
"""

import gc
import time

CFG = dict(vocab=32000, dim=4096, heads=32, kv_heads=8, ffn=11008,
           layers=32)
DCFG = dict(vocab=32000, dim=256, heads=8, kv_heads=4, ffn=1024, layers=4)
MAX_LEN = 512
GAMMA = 4


def main():
    import jax

    import smelter_tpu as st
    from smelter_tpu.models import llama_style
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import quantize_weights
    from smelter_tpu.runtime.generate import FusedGenerator
    from smelter_tpu.runtime.speculative import SpeculativeGenerator

    print("devices:", jax.devices(), flush=True)
    t0 = time.perf_counter()
    w = llama_style.make_weights(max_len=MAX_LEN, **CFG)
    wd = llama_style.make_weights(max_len=MAX_LEN, seed=7, **DCFG)
    print(f"weights built in {time.perf_counter()-t0:.0f}s", flush=True)

    def q4(g):
        quantize_weights(g, "int4-g128", min_elements=1 << 16)
        run_passes(g, ["fuse_dequant_matmul", "dce"])
        return g

    bf = st.Config(compute_dtype="bfloat16")
    step_g = q4(llama_style.build_decode_step(w, max_len=MAX_LEN, **CFG)[0])
    chunk_g = q4(llama_style.build_decode_step(w, max_len=MAX_LEN,
                                               chunk=GAMMA + 1, **CFG)[0])
    pf_g = q4(llama_style.build_prefill(w, prompt_len=448,
                                        max_len=MAX_LEN, **CFG))
    draft_g, _ = llama_style.build_decode_step(wd, max_len=MAX_LEN, **DCFG)
    del w, wd
    gc.collect()

    plain = FusedGenerator(step_g, bf, prefill_graph=pf_g)
    spec = SpeculativeGenerator(step_g, chunk_g, draft_g, config=bf)
    p8 = list(range(1, 9))
    for g in (plain, spec):
        t0 = time.perf_counter()
        g.generate(p8, 16)
        g.generate(p8, 80)
        print(f"[{type(g).__name__}] compiled in "
              f"{time.perf_counter()-t0:.0f}s", flush=True)

    def timed(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    best_p = best_s = float("inf")
    for _ in range(4):
        lo = min(timed(lambda: plain.generate(p8, 16)) for _ in range(2))
        hi = min(timed(lambda: plain.generate(p8, 80)) for _ in range(2))
        best_p = min(best_p, (hi - lo) / 64)
        lo = min(timed(lambda: spec.generate(p8, 16)) for _ in range(2))
        hi = min(timed(lambda: spec.generate(p8, 80)) for _ in range(2))
        best_s = min(best_s, (hi - lo) / 64)
    print(f"[7b interleaved] plain {best_p*1e3:.2f} ms/tok "
          f"({1/best_p:,.0f} tok/s); spec round {best_s*1e3:.2f} ms",
          flush=True)
    for alpha in (0.0, 0.5, 0.8, 1.0):
        tps = (1 + alpha * GAMMA) / best_s
        print(f"    projected tok/s @ accept {alpha:.1f}: {tps:,.0f} "
              f"({tps*best_p:.2f}x plain)", flush=True)

    # prefill at 7B: prompt phase cost via the pf-vs-scan difference
    p448 = [1 + (i % 31000) for i in range(448)]
    plain.generate(p448, 16)  # compile prefill form
    gen_scan = FusedGenerator(step_g, bf)
    gen_scan.generate(p448, 16)
    t_pf = min(timed(lambda: plain.generate(p448, 16)) for _ in range(3))
    t_scan = min(timed(lambda: gen_scan.generate(p448, 16))
                 for _ in range(3))
    print(f"[7b prefill 448] pf-total {t_pf*1e3:.0f} ms vs scan-total "
          f"{t_scan*1e3:.0f} ms -> prompt phase saves "
          f"{(t_scan-t_pf)*1e3:.0f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
