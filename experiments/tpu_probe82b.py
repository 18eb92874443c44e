"""TPU probe #82b: ragged-attention re-measurement with WIDE spans.

probe82's short-position rows came out physically impossible (bf-dense
0.25 ms/tok, ml512 0.04 = 16 TB/s effective), and retro-auditing the
record shows probe74's 0.55 and probe81's 0.60/0.29 ms/tok ALSO sit
below the 1.3B int4 weight-stream floor (0.635 GB/token / 819 GB/s =
0.775 ms/tok — no schedule can decode faster without skipping weight
reads). Diagnosis: the n=16-vs-80 K-difference spans only ~50 ms of
chip time, comparable to the tunnel's RPC/pipelining window, so on a
deeply-pipelined tunnel day the difference collapses toward zero.
probe76's canonical 0.89 used the same spans and happened to be honest
— the artifact is intermittent, which is worse than being always-on.

Fix: spans where the chip-time delta dwarfs any overlap window
(n 16 vs 528 -> >= 400 ms of mandatory weight streaming), plus a
physics assertion: any ms/tok below the weight-stream floor is flagged
INVALID in the output rather than printed as a result. Arms (resident,
interleaved): 1.3B int4 ctx4096 {bf16,int8}-KV x {dense,ragged} + the
max_len=512 anchor — the probe81/82 matrix re-done honestly.
"""

import gc
import time

CFG = dict(vocab=32000, dim=2048, heads=16, kv_heads=8, ffn=5632,
           layers=24)
MAX_LEN = 4096
# 1.3B int4-g128: ~0.635 GB of weights+scales stream per decoded token
FLOOR_MS = 0.635e9 / 819e9 * 1e3  # 0.775 ms/tok


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

    g_bf = q4(llama_style.build_decode_step(w, max_len=MAX_LEN, **CFG)[0])
    g_i8 = q4(llama_style.build_decode_step(w, max_len=MAX_LEN,
                                            kv_quant=True, **CFG)[0])
    g512 = q4(llama_style.build_decode_step(w, max_len=512, **CFG)[0])

    def cfgj(ragged):
        return st.Config(compute_dtype="bfloat16",
                         ragged_attention=ragged)

    arms = {}
    for name, g, ragged in [("bf-dense", g_bf, False),
                            ("bf-ragged", g_bf, True),
                            ("i8-dense", g_i8, False),
                            ("i8-ragged", g_i8, True),
                            ("ml512-ragged", g512, True)]:
        t0 = time.perf_counter()
        gen = FusedGenerator(g, cfgj(ragged))
        gen.generate(list(range(1, 9)), 16)
        gen.generate(list(range(1, 9)), 528)
        arms[name] = gen
        print(f"[{name}] ready in {time.perf_counter()-t0:.0f}s",
              flush=True)
    gc.collect()

    p8 = list(range(1, 9))
    N_LO, N_HI = 16, 528

    def timed(gen, n):
        t0 = time.perf_counter()
        gen.generate(p8, n)
        return time.perf_counter() - t0

    def span_for(gen):
        # the generator clamps n_new to max_len - plen: divide by the
        # steps that actually ran (the ml512 arm runs 504, not 520)
        hi = min(N_HI, gen.max_len - len(p8))
        return hi, hi - N_LO

    best = {n: float("inf") for n in arms}
    raw = {n: [] for n in arms}
    for _ in range(4):
        for name, gen in arms.items():
            n_hi, sp = span_for(gen)
            lo = min(timed(gen, N_LO), timed(gen, N_LO))
            hi = min(timed(gen, N_HI), timed(gen, N_HI))
            raw[name].append((lo, hi))
            best[name] = min(best[name], (hi - lo) / sp)
    for name in arms:
        t = best[name] * 1e3
        flag = "" if t >= FLOOR_MS * 0.95 else \
            f"  << INVALID (below {FLOOR_MS:.2f} ms weight floor)"
        walls = " ".join(f"({lo*1e3:.0f},{hi*1e3:.0f})"
                         for lo, hi in raw[name])
        print(f"[1.3b {name:12s}] {t:6.3f} ms/tok = {1e3/t:7,.0f} tok/s"
              f"{flag}   walls_ms={walls}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
