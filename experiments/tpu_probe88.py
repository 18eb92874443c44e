"""TPU probe #88: multi-round speculative ticks vs multi-step plain
ticks, head-to-head at b8, INTERLEAVED (1.3B int4 + int8-KV).

probe83b: plain tick_steps T8 = 1,046 tok/s aggregate; spec-self
single-round = 341 (acc 0.844). rounds_per_tick chains R rounds per
dispatch: at acc~0.85, gamma 4, R4 emits up to ~17.6 tokens/slot/
dispatch vs T8's 8 — if the chip-side round cost doesn't swamp the
dispatch saving, spec should now beat plain amortization. Arms:
plain-T8, spec-self R1, spec-self R4 (gamma 4).
"""

import gc
import time

CFG = dict(vocab=32000, dim=2048, heads=16, kv_heads=8, ffn=5632,
           layers=24)
MAX_LEN = 512
SLOTS = 8
N_NEW = 32


def main():
    import jax
    import numpy as np

    import smelter_tpu as st
    from smelter_tpu.models import llama_style
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import quantize_weights
    from smelter_tpu.serving.decode_server import (DecodeServer,
                                                   SpecDecodeServer)

    print("devices:", jax.devices(), flush=True)
    cfgj = st.Config(compute_dtype="bfloat16")

    def q4(g):
        quantize_weights(g, "int4-g128", min_elements=1 << 16)
        run_passes(g, ["fuse_dequant_matmul", "dce"])
        return g

    t0 = time.perf_counter()
    w = llama_style.make_weights(max_len=MAX_LEN, **CFG)
    print(f"weights in {time.perf_counter()-t0:.0f}s", flush=True)
    rng = np.random.default_rng(0)

    def workload(n_req):
        return [[int(t) for t in rng.integers(1, 31999, 8)]
                for _ in range(n_req)]

    def run(srv, n_req):
        t0 = time.perf_counter()
        futs = [srv.submit(p, N_NEW) for p in workload(n_req)]
        tot = sum(len(f.result(timeout=3600)) - 8 for f in futs)
        return tot / (time.perf_counter() - t0)

    def spec(R):
        step = q4(llama_style.build_decode_step(
            w, max_len=MAX_LEN, kv_quant=True, **CFG)[0])
        chunk = q4(llama_style.build_decode_step(
            w, max_len=MAX_LEN, chunk=5, kv_quant=True, **CFG)[0])
        sstep = q4(llama_style.build_decode_step(
            w, max_len=MAX_LEN, kv_quant=True, **CFG)[0])
        return SpecDecodeServer(step, chunk, sstep, slots=SLOTS,
                                config=cfgj, rounds_per_tick=R)

    stepT = q4(llama_style.build_decode_step(
        w, max_len=MAX_LEN, kv_quant=True, **CFG)[0])
    arms = {
        "plain-T8": DecodeServer(stepT, slots=SLOTS, config=cfgj,
                                 tick_steps=8),
        "spec-R1": spec(1),
        "spec-R4": spec(4),
    }
    for name, srv in arms.items():
        tw = time.perf_counter()
        run(srv, 2)
        print(f"[{name}] warm in {time.perf_counter()-tw:.0f}s",
              flush=True)
    best = {n: 0.0 for n in arms}
    for _ in range(3):
        for name, srv in arms.items():
            best[name] = max(best[name], run(srv, 2 * SLOTS))
    for name, srv in arms.items():
        stats = srv.stats()
        acc = stats.get("accept_rate")
        print(f"[1.3b int4+int8kv b{SLOTS} {name:9s}] "
              f"{best[name]:8,.0f} tok/s aggregate"
              + (f"  acc={acc:.3f}" if acc is not None else ""),
              flush=True)
    for srv in arms.values():
        srv.shutdown()
    gc.collect()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
