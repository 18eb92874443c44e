"""TPU probe #75: speculative-decode parity numerics + interleaved economics.

Session-3 flags to resolve:
1. spec parity read False ON CHIP (exact on CPU, tests/test_speculative).
   Hypothesis: bf16 chunk-form (M=gamma+1) vs step-form (M=1) matmuls
   round differently at SOME op (XLA picks shape-dependent layouts), so
   greedy argmax flips at near-ties and the chains diverge — a numerics
   property, not a logic bug. Measure directly: one chunk forward vs
   gamma+1 step forwards from the SAME state — max |dlogits| and argmax
   agreement per position.
2. Cross-arm timings were sequential on a +-10% multi-tenant chip;
   re-measure plain-vs-spec-round INTERLEAVED.
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
    import jax.numpy as jnp

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
    draft_g, _ = llama_style.build_decode_step(wd, max_len=MAX_LEN, **DCFG)
    del w, wd
    gc.collect()

    # ---- 1) chunk-vs-step numerics from the same state -----------------
    from smelter_tpu.runtime.executor import Executor

    ex_s = Executor(step_g, bf)
    ps = ex_s.init_params()
    fs = jax.jit(ex_s.build_fn())
    from smelter_tpu.runtime.generate import _merge_params

    host = {n: step_g.initializers[n] for n in ps}
    ex_c = _merge_params(ps, host, chunk_g, bf)
    fc = jax.jit(ex_c.build_fn())
    kvd = CFG["kv_heads"] * CFG["dim"] // CFG["heads"]
    caches = [jnp.zeros((MAX_LEN, kvd), jnp.bfloat16)
              for _ in range(2 * CFG["layers"])]
    toks = [1, 7, 1000, 4096, 2, 31999, 17, 256, 9, 77]
    # feed 5 tokens step-wise, then compare positions 5..9 both ways
    for p in range(5):
        outs = fs(ps, jnp.asarray([toks[p]]), jnp.asarray([p]), *caches)
        caches = list(outs[1:])
    c2 = [jnp.array(c) for c in caches]
    step_logits = []
    for p in range(5, 10):
        outs = fs(ps, jnp.asarray([toks[p]]), jnp.asarray([p]), *caches)
        caches = list(outs[1:])
        step_logits.append(np.asarray(outs[0][0], np.float32))
    outs = fc(ps, jnp.asarray(toks[5:10]), jnp.asarray([5]), *c2)
    chunk_logits = np.asarray(outs[0], np.float32)
    agree = 0
    for i in range(5):
        a, b = step_logits[i], chunk_logits[i]
        am, bm = int(a.argmax()), int(b.argmax())
        agree += am == bm
        srt = np.sort(a)[-2:]
        print(f"  pos {5+i}: step argmax {am} chunk {bm} "
              f"max|dlogit| {np.abs(a-b).max():.4f} "
              f"top2 gap {srt[1]-srt[0]:.4f}", flush=True)
    print(f"[numerics] argmax agreement {agree}/5", flush=True)

    del ps, fs, fc, caches, c2
    gc.collect()
    jax.clear_caches()

    # ---- 2) interleaved plain vs spec economics -------------------------
    plain = FusedGenerator(step_g, bf)
    spec = SpeculativeGenerator(step_g, chunk_g, draft_g, config=bf)
    p8 = list(range(1, 9))
    for g in (plain, spec):
        g.generate(p8, 16)
        g.generate(p8, 80)

    def timed(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    best_p = best_s = float("inf")
    for _ in range(5):
        lo = min(timed(lambda: plain.generate(p8, 16)) for _ in range(2))
        hi = min(timed(lambda: plain.generate(p8, 80)) for _ in range(2))
        best_p = min(best_p, (hi - lo) / 64)
        lo = min(timed(lambda: spec.generate(p8, 16)) for _ in range(2))
        hi = min(timed(lambda: spec.generate(p8, 80)) for _ in range(2))
        best_s = min(best_s, (hi - lo) / 64)
    print(f"[interleaved] plain {best_p*1e3:.2f} ms/tok "
          f"({1/best_p:,.0f} tok/s); spec round (accept~0) "
          f"{best_s*1e3:.2f} ms/round", flush=True)
    for alpha in (0.0, 0.5, 0.8, 1.0):
        tps = (1 + alpha * GAMMA) / best_s
        print(f"    projected tok/s @ accept {alpha:.1f}: {tps:,.0f} "
              f"({tps*best_p:.2f}x plain)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
