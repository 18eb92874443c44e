"""TPU probe #83b: DecodeServer tick_steps on the chip, INTERLEAVED.

probe83 measured the slot loop tunnel-tick-bound (b4 plain = 104 tok/s
aggregate ≈ one ~38 ms host round trip per token row). tick_steps=T
chains T decode steps inside one dispatch — the round trip is paid once
per T tokens, so the aggregate should scale ~T× until the chip-side
step cost (~1 ms/step at 1.3B int4) takes over. Arms resident, rounds
interleaved: T = 1 / 4 / 8 at b8, 1.3B int4-g128 + int8-KV, plus a
spec-self comparator (gamma=4) — the two dispatch-amortization
strategies head-to-head on the same workload.
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

    arms = {}
    for name, T in (("T1", 1), ("T4", 4), ("T8", 8)):
        step = q4(llama_style.build_decode_step(
            w, max_len=MAX_LEN, kv_quant=True, **CFG)[0])
        arms[name] = DecodeServer(step, slots=SLOTS, config=cfgj,
                                  tick_steps=T)
    step = q4(llama_style.build_decode_step(
        w, max_len=MAX_LEN, kv_quant=True, **CFG)[0])
    chunk = q4(llama_style.build_decode_step(
        w, max_len=MAX_LEN, chunk=5, kv_quant=True, **CFG)[0])
    sstep = q4(llama_style.build_decode_step(
        w, max_len=MAX_LEN, kv_quant=True, **CFG)[0])
    arms["spec-self-g4"] = SpecDecodeServer(step, chunk, sstep,
                                            slots=SLOTS, config=cfgj)
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
        print(f"[1.3b int4+int8kv b{SLOTS} {name:12s}] "
              f"{best[name]:8,.0f} tok/s aggregate"
              + (f"  acc={acc:.3f}" if acc is not None else ""),
              flush=True)
    for srv in arms.values():
        srv.shutdown()
    gc.collect()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
