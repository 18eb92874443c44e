"""TPU probe #80: speculative gamma sweep at 1.3B int4, interleaved.

Round cost = gamma draft steps + one (gamma+1)-token chunk forward; the
benefit is (1 + alpha*gamma) tokens per round. Larger gamma amortizes
the target read over more potential tokens but pays more draft steps
and more wasted work at low acceptance — measure t_round(gamma) for
gamma = 2/4/8 with all arms resident, plus the plain step anchor, and
print the alpha crossover table.
"""

import gc
import time

CFG = dict(vocab=32000, dim=2048, heads=16, kv_heads=8, ffn=5632,
           layers=24)
DCFG = dict(vocab=32000, dim=256, heads=8, kv_heads=4, ffn=1024, layers=4)
MAX_LEN = 512
GAMMAS = (2, 4, 8)


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
    draft_g, _ = llama_style.build_decode_step(wd, max_len=MAX_LEN, **DCFG)
    arms = {"plain": FusedGenerator(step_g, bf)}
    for gm in GAMMAS:
        chunk = q4(llama_style.build_decode_step(w, max_len=MAX_LEN,
                                                 chunk=gm + 1, **CFG)[0])
        arms[f"g{gm}"] = SpeculativeGenerator(step_g, chunk, draft_g,
                                              config=bf)
    del w, wd
    gc.collect()
    p8 = list(range(1, 9))
    for name, g in arms.items():
        t0 = time.perf_counter()
        g.generate(p8, 16)
        g.generate(p8, 80)
        print(f"[{name}] compiled in {time.perf_counter()-t0:.0f}s",
              flush=True)

    def timed(gen, n):
        t0 = time.perf_counter()
        gen.generate(p8, n)
        return time.perf_counter() - t0

    best = {a: float("inf") for a in arms}
    for _ in range(5):
        for name, gen in arms.items():
            lo = min(timed(gen, 16), timed(gen, 16))
            hi = min(timed(gen, 80), timed(gen, 80))
            best[name] = min(best[name], (hi - lo) / 64)
    t_plain = best["plain"]
    print(f"\n[plain] {t_plain*1e3:.2f} ms/tok ({1/t_plain:,.0f} tok/s)",
          flush=True)
    for gm in GAMMAS:
        t_r = best[f"g{gm}"]
        print(f"[gamma={gm}] round {t_r*1e3:.2f} ms "
              f"({t_r/t_plain:.2f}x step); tok/s @ alpha "
              + "  ".join(f"{a:.1f}:{(1+a*gm)/t_r:,.0f}"
                          for a in (0.5, 0.7, 0.8, 0.9, 1.0)),
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
