"""TPU probe #71: prefill + speculative decode economics at 1.3B int4.

Three questions, one chip session:
1. Prefill: generate(plen=448, n=16) with the prefill graph vs the
   scan-through-the-prompt path — the scan pays plen-1 full weight
   streams, the prefill ONE forward at MXU rates.
2. Speculative round economics: the round cost is acceptance-INDEPENDENT
   (gamma tiny-draft steps + one (gamma+1)-token chunk forward), so the
   alpha=0 end-to-end run measures t_round exactly; projected
   tok/s(alpha) = (1 + alpha*gamma) / t_round. Validated at alpha=0
   (parity + rate) here; alpha=1 round mechanics validated on CPU
   (tests/test_speculative.py self-draft).
3. Chunk-step cost vs single step (the weight-bound claim: M=5 reads the
   same bytes as M=1) and the auto-bn int4 kernel after probe70's fix.
"""

import time

import numpy as np

CFG = dict(vocab=32000, dim=2048, heads=16, kv_heads=8, ffn=5632,
           layers=24)
DCFG = dict(vocab=32000, dim=256, heads=8, kv_heads=4, ffn=1024, layers=4)
MAX_LEN = 512
GAMMA = 4


def main():
    import gc

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

    def timed(fn, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    # ---- 1) plain decode target (auto-bn kernel) + prefill --------------
    step_g = q4(llama_style.build_decode_step(w, max_len=MAX_LEN, **CFG)[0])
    pf_g = q4(llama_style.build_prefill(w, prompt_len=448, max_len=MAX_LEN,
                                        **CFG))
    gen = FusedGenerator(step_g, bf, prefill_graph=pf_g)
    p8 = list(range(1, 9))
    gen.generate(p8, 16)  # compile short form
    t_lo = timed(lambda: gen.generate(p8, 16))
    t_hi = timed(lambda: gen.generate(p8, 80))
    per_tok = (t_hi - t_lo) / 64
    print(f"[decode int4 auto-bn] {per_tok*1e3:.2f} ms/tok = "
          f"{1/per_tok:,.0f} tok/s (was 1.40 ms at bn=512, probe69)",
          flush=True)

    p448 = [1 + (i % 31000) for i in range(448)]
    gen.generate(p448, 16)  # compile prefill form
    t_pf = timed(lambda: gen.generate(p448, 16))
    gen_nopf = FusedGenerator(step_g, bf)
    gen_nopf.generate(p448, 16)
    t_scan = timed(lambda: gen_nopf.generate(p448, 16))
    # subtract the16 decode steps + dispatch measured above (t_lo)
    pf_ms = (t_pf - t_lo) * 1e3
    scan_ms = (t_scan - t_lo) * 1e3
    print(f"[prefill 448] prefill-graph {pf_ms:.0f} ms vs prompt-scan "
          f"{scan_ms:.0f} ms -> {scan_ms/max(pf_ms,1e-9):.1f}x; "
          f"prefill {448/max(pf_ms,1e-9)*1e3:,.0f} tok/s", flush=True)
    del gen_nopf
    gc.collect()

    # ---- 2) speculative: tiny draft, alpha=0 round economics ------------
    chunk_g = q4(llama_style.build_decode_step(w, max_len=MAX_LEN,
                                               chunk=GAMMA + 1, **CFG)[0])
    draft_g, _ = llama_style.build_decode_step(wd, max_len=MAX_LEN, **DCFG)
    spec = SpeculativeGenerator(step_g, chunk_g, draft_g, config=bf,
                                prefill_graph=pf_g)
    out_plain = FusedGenerator(step_g, bf).generate(p8, 64)
    out_spec = spec.generate(p8, 64)
    print(f"[spec] parity: {out_spec == out_plain}; rounds "
          f"{spec.last_rounds} accept {spec.last_accept_rate:.2f}",
          flush=True)
    t_spec_lo = timed(lambda: spec.generate(p8, 16))
    t_spec_hi = timed(lambda: spec.generate(p8, 80))
    # alpha=0: one round per token -> t_round = d(t)/d(n_new)
    t_round = (t_spec_hi - t_spec_lo) / 64
    print(f"[spec] t_round(gamma={GAMMA}) = {t_round*1e3:.2f} ms "
          f"(plain step {per_tok*1e3:.2f} ms)", flush=True)
    for alpha in (0.0, 0.5, 0.7, 0.8, 0.9, 1.0):
        tps = (1 + alpha * GAMMA) / t_round
        print(f"    projected tok/s @ accept {alpha:.1f}: {tps:,.0f}"
              f" ({tps*per_tok:.2f}x plain)", flush=True)
    breakeven = (t_round / per_tok - 1) / GAMMA
    print(f"[spec] breakeven acceptance: {breakeven:.2f}", flush=True)
    del spec
    gc.collect()
    jax.clear_caches()

    # ---- 3) batched decode aggregate (custom_vmap folds batch into M) --
    from smelter_tpu.runtime.generate import FusedBatchedGenerator

    for b in (8, 16):
        bgen = FusedBatchedGenerator(step_g, batch=b, config=bf)
        prompts = [p8] * b
        bgen.generate(prompts, 16)
        t_lo = timed(lambda: bgen.generate(prompts, 16))
        t_hi = timed(lambda: bgen.generate(prompts, 80))
        per_step = (t_hi - t_lo) / 64
        print(f"[batched b{b}] {per_step*1e3:.2f} ms/step = "
              f"{b/per_step:,.0f} tok/s aggregate "
              f"({1/per_step:,.0f}/stream)", flush=True)
        del bgen
        gc.collect()
        jax.clear_caches()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
