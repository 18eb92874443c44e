"""TPU probe #79: the full 7B serving stack composed — int4-g128 weights
+ int8 KV caches + 448-token prefill + speculative decode (gamma=4,
4L/256d draft), vs the plain int4 step, interleaved in one session.

Each piece measured separately in probes 76-78; this is the composition
check and the flagship configuration a serving deployment would run.
"""

import gc
import time

CFG = dict(vocab=32000, dim=4096, heads=32, kv_heads=8, ffn=11008,
           layers=32)
DCFG = dict(vocab=32000, dim=256, heads=8, kv_heads=4, ffn=1024, layers=4)
MAX_LEN = 1024
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
    kw = dict(max_len=MAX_LEN, kv_quant=True)
    step_g = q4(llama_style.build_decode_step(w, **kw, **CFG)[0])
    chunk_g = q4(llama_style.build_decode_step(w, chunk=GAMMA + 1, **kw,
                                               **CFG)[0])
    pf_g = q4(llama_style.build_prefill(w, prompt_len=448, **kw, **CFG))
    draft_g, _ = llama_style.build_decode_step(wd, max_len=MAX_LEN, **DCFG)
    del w, wd
    gc.collect()

    plain = FusedGenerator(step_g, bf, prefill_graph=pf_g)
    spec = SpeculativeGenerator(step_g, chunk_g, draft_g, config=bf,
                                prefill_graph=pf_g)
    p8 = list(range(1, 9))
    p448 = [1 + (i % 31000) for i in range(448)]
    for g, pl in ((plain, p8), (spec, p8)):
        t0 = time.perf_counter()
        g.generate(pl, 16)
        g.generate(pl, 80)
        print(f"[{type(g).__name__}] compiled in "
              f"{time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    spec.generate(p448, 16)  # prefill + spec composition compiles
    print(f"[spec+prefill448] compiled in {time.perf_counter()-t0:.0f}s",
          flush=True)

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
    print(f"[7b full-stack ctx{MAX_LEN}] plain {best_p*1e3:.2f} ms/tok "
          f"({1/best_p:,.0f} tok/s); spec round {best_s*1e3:.2f} ms",
          flush=True)
    for alpha in (0.0, 0.5, 0.8, 1.0):
        tps = (1 + alpha * GAMMA) / best_s
        print(f"    projected tok/s @ accept {alpha:.1f}: {tps:,.0f} "
              f"({tps*best_p:.2f}x plain)", flush=True)
    # end-to-end long-prompt request: prefill + spec in one dispatch
    t_req = min(timed(lambda: spec.generate(p448, 64)) for _ in range(3))
    print(f"[7b request] 448-token prompt + 64 tokens via prefill+spec: "
          f"{t_req*1e3:.0f} ms total", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
