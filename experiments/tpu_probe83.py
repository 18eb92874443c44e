"""TPU probe #83: decode SERVING through the slot loop, INTERLEAVED.

VERDICT r4 #2: SpecDecodeServer shipped with CPU tests only — measure
aggregate tok/s vs plain DecodeServer at b4/b8/b16, 1.3B int4-g128 +
int8-KV, with (a) the real independent 4L/256d draft (MEASURED
acceptance — random weights, so expect ~0: the honest lower bound) and
(b) self-draft (acceptance 1.0: the upper bound). All arms at one batch
size are RESIDENT simultaneously and rounds INTERLEAVED (probe74/76
discipline); batch sizes run sequentially (each needs fresh server
compiles — cross-batch comparisons are within-arm trends only).

Caveat by design: every tick pays the dev tunnel's ~29 ms host RPC, so
absolute tok/s here is tunnel-bound; what the probe establishes is the
SERVING ratio — tokens per tick (1 vs 1+acc*gamma per slot) survives
any dispatch floor, and the on-prem number scales with 1/tick-cost.

Stage 2 (VERDICT r4 #5 on-chip confirmation): BucketedDecodeServer
{512: 6, 4096: 2} vs flat 8x4096 — mixed 8/400/2000-token prompts serve
correctly with cache_bytes() at ~27% of the flat allocation.
"""

import gc
import time

CFG = dict(vocab=32000, dim=2048, heads=16, kv_heads=8, ffn=5632,
           layers=24)
DCFG = dict(vocab=32000, dim=256, heads=8, kv_heads=4, ffn=1024,
            layers=4)
MAX_LEN = 512
GAMMA = 4
N_NEW = 32


def main():
    import jax
    import numpy as np

    import smelter_tpu as st
    from smelter_tpu.models import llama_style
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import quantize_weights
    from smelter_tpu.serving.decode_server import (BucketedDecodeServer,
                                                   DecodeServer,
                                                   SpecDecodeServer)

    print("devices:", jax.devices(), flush=True)
    cfgj = st.Config(compute_dtype="bfloat16")

    def q4(g):
        quantize_weights(g, "int4-g128", min_elements=1 << 16)
        run_passes(g, ["fuse_dequant_matmul", "dce"])
        return g

    t0 = time.perf_counter()
    w = llama_style.make_weights(max_len=MAX_LEN, **CFG)
    dw = llama_style.make_weights(max_len=MAX_LEN, seed=7, **DCFG)
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

    for slots in (4, 8, 16):
        # fresh graphs per batch size (server jits close over them)
        step = q4(llama_style.build_decode_step(
            w, max_len=MAX_LEN, kv_quant=True, **CFG)[0])
        chunk = q4(llama_style.build_decode_step(
            w, max_len=MAX_LEN, chunk=GAMMA + 1, kv_quant=True, **CFG)[0])
        dstep = llama_style.build_decode_step(dw, max_len=MAX_LEN,
                                              **DCFG)[0]
        sstep = q4(llama_style.build_decode_step(
            w, max_len=MAX_LEN, kv_quant=True, **CFG)[0])
        t0 = time.perf_counter()
        arms = {
            "plain": DecodeServer(step, slots=slots, config=cfgj),
            "spec-tiny": SpecDecodeServer(step, chunk, dstep, slots=slots,
                                          config=cfgj),
            "spec-self": SpecDecodeServer(step, chunk, sstep, slots=slots,
                                          config=cfgj),
        }
        if slots == 8:
            # early-exit self-draft (first 12 of 24 layers, shared
            # weights) — the deployable no-extra-model config
            ecfg = dict(CFG, layers=CFG["layers"] // 2)
            estep = q4(llama_style.build_decode_step(
                w, max_len=MAX_LEN, **ecfg)[0])
            arms["spec-early"] = SpecDecodeServer(
                step, chunk, estep, slots=slots, config=cfgj)
        # warm/compile each arm outside the clock
        for name, srv in arms.items():
            tw = time.perf_counter()
            run(srv, 2)
            print(f"[b{slots} {name}] warm in "
                  f"{time.perf_counter()-tw:.0f}s", flush=True)
        print(f"[b{slots}] all arms ready "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)
        best = {n: 0.0 for n in arms}
        for _ in range(3):
            for name, srv in arms.items():
                best[name] = max(best[name], run(srv, 2 * slots))
        for name, srv in arms.items():
            stats = srv.stats()
            acc = stats.get("accept_rate")
            print(f"[1.3b int4+int8kv b{slots} {name}] "
                  f"{best[name]:8,.0f} tok/s aggregate"
                  + (f"  acc={acc:.3f}" if acc is not None else ""),
                  flush=True)
        for srv in arms.values():
            srv.shutdown()
        arms.clear()
        gc.collect()
        jax.clear_caches()

    # -- stage 2: bucket ladder on chip ---------------------------------
    print("stage 2: BucketedDecodeServer {512:6, 4096:2}", flush=True)
    s512 = q4(llama_style.build_decode_step(
        w, max_len=512, kv_quant=True, **CFG)[0])
    w4k = llama_style.make_weights(max_len=4096, **CFG)
    s4k = q4(llama_style.build_decode_step(
        w4k, max_len=4096, kv_quant=True, **CFG)[0])
    srv = BucketedDecodeServer([
        {"step": s512, "slots": 6},
        {"step": s4k, "slots": 2},
    ], config=cfgj)
    try:
        cb, ub = srv.cache_bytes(), srv.uniform_cache_bytes()
        print(f"cache_bytes {cb/1e9:.2f} GB vs flat 8x4096 "
              f"{ub/1e9:.2f} GB ({cb/ub:.0%})", flush=True)
        t0 = time.perf_counter()
        futs = [srv.submit([int(t) for t in rng.integers(1, 31999, n)], 16)
                for n in (8, 8, 400, 8, 2000, 8)]
        outs = [f.result(timeout=3600) for f in futs]
        assert all(len(o) >= 16 for o in outs)
        print(f"mixed 8/400/2000-token workload served in "
              f"{time.perf_counter()-t0:.0f}s "
              f"(incl. compiles) — stats {srv.stats()}", flush=True)
    finally:
        srv.shutdown()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
