"""TPU probe #82: ragged attention follow-ups, INTERLEAVED (1.3B).

probe81 measured dense->ragged 3.4x (bf16 KV) / 3.0x (int8 KV) at short
positions and 1.33x at pos~2k, with two open questions:
  (a) the two ragged arms split 2x (0.60 vs 0.29 ms/tok) though both
      should be weight-bound — is the bf16-cache arm paying a
      cache-size-proportional cost (scan-carry copies)? -> anchor arm
      at max_len=512, same program.
  (b) ragged@2k shows ~5 us/grid-step overhead -> block 1024 (new auto
      default) vs 256 A/B.
Plus: on-chip TOKEN PARITY dense vs ragged (both cache dtypes), and the
slot-server shape — FusedBatchedGenerator b4, where the dense cache
read scales with batch but the ragged one doesn't.
"""

import gc
import time

CFG = dict(vocab=32000, dim=2048, heads=16, kv_heads=8, ffn=5632,
           layers=24)
MAX_LEN = 4096
PLONG = 2048


def main():
    import jax

    import smelter_tpu as st
    from smelter_tpu.models import llama_style
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import quantize_weights
    from smelter_tpu.runtime.generate import (FusedBatchedGenerator,
                                              FusedGenerator)

    print("devices:", jax.devices(), flush=True)
    t0 = time.perf_counter()
    w = llama_style.make_weights(max_len=MAX_LEN, **CFG)
    print(f"weights in {time.perf_counter()-t0:.0f}s", flush=True)

    def q4(g):
        quantize_weights(g, "int4-g128", min_elements=1 << 16)
        run_passes(g, ["fuse_dequant_matmul", "dce"])
        return g

    def cfgj(ragged, block=None):
        return st.Config(compute_dtype="bfloat16", ragged_attention=ragged,
                         ragged_block=block)

    pf = q4(llama_style.build_prefill(w, prompt_len=PLONG,
                                      max_len=MAX_LEN, **CFG))
    g_bf = q4(llama_style.build_decode_step(w, max_len=MAX_LEN, **CFG)[0])
    g_i8 = q4(llama_style.build_decode_step(w, max_len=MAX_LEN,
                                            kv_quant=True, **CFG)[0])
    g512 = q4(llama_style.build_decode_step(w, max_len=512, **CFG)[0])

    arms = {}
    specs = [
        ("bf-dense", g_bf, cfgj(False), [pf]),
        ("bf-rag1024", g_bf, cfgj(True), [pf]),
        ("bf-rag256", g_bf, cfgj(True, 256), [pf]),
        ("i8-dense", g_i8, cfgj(False), None),
        ("i8-ragged", g_i8, cfgj(True), None),
        ("bf-rag-ml512", g512, cfgj(True), None),
    ]
    p8 = list(range(1, 9))
    plong = [t % 31999 + 1 for t in range(PLONG)]
    for name, g, cfg, pfs in specs:
        t0 = time.perf_counter()
        gen = FusedGenerator(g, cfg, prefill_graph=pfs)
        gen.generate(p8, 16)
        gen.generate(p8, 80)
        if pfs:
            gen.generate(plong, 16)
            gen.generate(plong, 80)
        arms[name] = gen
        print(f"[{name}] ready in {time.perf_counter()-t0:.0f}s",
              flush=True)

    # on-chip token parity (bf16 argmax ties may flip — count, not assert)
    for a, b in (("bf-dense", "bf-rag1024"), ("i8-dense", "i8-ragged")):
        ta = arms[a].generate(p8, 48)
        tb = arms[b].generate(p8, 48)
        diff = sum(x != y for x, y in zip(ta, tb))
        print(f"parity {a} vs {b}: {diff}/48 tokens differ "
              f"(first: {ta[:14]} / {tb[:14]})", flush=True)

    bat = {}
    for name, ragged in (("b4-dense", False), ("b4-ragged", True)):
        t0 = time.perf_counter()
        gen = FusedBatchedGenerator(g_bf, 4, cfgj(ragged))
        gen.generate([p8] * 4, 16)
        gen.generate([p8] * 4, 80)
        bat[name] = gen
        print(f"[{name}] ready in {time.perf_counter()-t0:.0f}s",
              flush=True)
    gc.collect()

    def timed(gen, prompt, n, batched=False):
        t0 = time.perf_counter()
        gen.generate([prompt] * 4 if batched else prompt, n)
        return time.perf_counter() - t0

    rows = ([(n, p8, False) for n in arms]
            + [(n + "@2k", plong, False) for n in arms
               if n.startswith("bf-") and "ml512" not in n]
            + [(n, p8, True) for n in bat])
    best = {r[0]: float("inf") for r in rows}
    for _ in range(5):
        for label, prompt, batched in rows:
            gen = (bat if batched else arms)[label.split("@")[0]]
            lo = min(timed(gen, prompt, 16, batched),
                     timed(gen, prompt, 16, batched))
            hi = min(timed(gen, prompt, 80, batched),
                     timed(gen, prompt, 80, batched))
            best[label] = min(best[label], (hi - lo) / 64)
    for label, _, batched in rows:
        t = best[label]
        agg = 4 / t if batched else 1 / t
        print(f"[1.3b {label}] {t*1e3:6.2f} ms/tick = {agg:8,.0f} tok/s"
              f"{' aggregate' if batched else ''}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
