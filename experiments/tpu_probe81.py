"""TPU probe #81: ragged decode attention, INTERLEAVED (1.3B, 4k cache).

The decode step reads the full static cache every token (probe78: 537
MB/step at 7B/4k). Config.ragged_attention fuses the masked attention
into the Pallas prefix-reader (kernels/ragged_decode_attention.py);
this probe measures the dense-vs-ragged delta with all arms resident
in ONE session, rounds interleaved (probe74/75/76 discipline):

  short positions (p8 scan, pos 8..96):     dense reads 4096 rows/layer,
                                            ragged reads 1-2 blocks
  long positions (p2048 prefill, pos ~2k):  ragged should sit ~halfway
  int8-KV caches (kv_quant):                both halved; same ratio

1.3B geometry (probe76): dense bf16 cache read = 24L x 2 x 4096 x 1024
x 2B = 402 MB/step on top of the 0.66 GB int4 weight stream.
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
    from smelter_tpu.runtime.generate import FusedGenerator

    print("devices:", jax.devices(), flush=True)
    t0 = time.perf_counter()
    w = llama_style.make_weights(max_len=MAX_LEN, **CFG)
    print(f"weights in {time.perf_counter()-t0:.0f}s", flush=True)

    def q4(g):
        quantize_weights(g, "int4-g128", min_elements=1 << 16)
        run_passes(g, ["fuse_dequant_matmul", "dce"])
        return g

    pf = q4(llama_style.build_prefill(w, prompt_len=PLONG,
                                      max_len=MAX_LEN, **CFG))
    arms = {}
    for kvq in (False, True):
        g = q4(llama_style.build_decode_step(w, max_len=MAX_LEN,
                                             kv_quant=kvq, **CFG)[0])
        for ragged in (False, True):
            name = f"{'int8kv' if kvq else 'bf16kv'}-" \
                   f"{'ragged' if ragged else 'dense'}"
            t0 = time.perf_counter()
            cfgj = st.Config(compute_dtype="bfloat16",
                             ragged_attention=ragged)
            # prefill twin only for the bf16-cache pair (the long-pos
            # A/B); int8-KV arms measure the short-pos scan only
            gen = FusedGenerator(g, cfgj,
                                 prefill_graph=None if kvq else [pf])
            gen.generate(list(range(1, 9)), 16)
            gen.generate(list(range(1, 9)), 80)
            if not kvq:
                pl_ = [t % 31999 + 1 for t in range(PLONG)]
                gen.generate(pl_, 16)
                gen.generate(pl_, 80)
            arms[name] = gen
            print(f"[{name}] ready in {time.perf_counter()-t0:.0f}s",
                  flush=True)
    del w
    gc.collect()

    p8 = list(range(1, 9))
    plong = [t % 31999 + 1 for t in range(PLONG)]

    def timed(gen, prompt, n):
        t0 = time.perf_counter()
        gen.generate(prompt, n)
        return time.perf_counter() - t0

    rows = [(n, p8) for n in arms] + \
           [(n + "@2k", plong) for n in arms if n.startswith("bf16kv")]
    best = {r[0]: float("inf") for r in rows}
    for _ in range(5):
        for label, prompt in rows:
            gen = arms[label.split("@")[0]]
            lo = min(timed(gen, prompt, 16), timed(gen, prompt, 16))
            hi = min(timed(gen, prompt, 80), timed(gen, prompt, 80))
            best[label] = min(best[label], (hi - lo) / 64)
    for label, _ in rows:
        t = best[label]
        print(f"[1.3b ctx4096 {label}] {t*1e3:6.2f} ms/tok = "
              f"{1/t:7,.0f} tok/s", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
