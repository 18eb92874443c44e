"""TPU probe #69: llama-geometry decode throughput, end-to-end engine path.

probe67/68 established the int4 kernel at micro scale; this is the
end-to-end proof at real-model geometry: build_decode_step at 1.3B- and
7B-class llama configs, weight-only grouped quantization through the
public pipeline (quantize_weights + fuse_dequant_matmul ->
FusedDequantMatMulI4 Pallas kernel), whole decode loop in one
FusedGenerator dispatch. Reports ms/token and effective weight-stream
GB/s vs the HBM roofline.

Arms per size (bf16 only where the f32 upload+cast fits; int8 is
per-channel — grouped int8 stays on the unfused XLA path where the
dequant would be hoisted out of the scan as a full bf16 copy):
  1.3B (d2048 L24 ffn5632 h16 kv8 v32000): bf16, int8, int4-g128
  7B   (d4096 L32 ffn11008 h32 kv8 v32000): int8, int4-g128

Methodology: K-differenced n_new (16 vs 80) cancels dispatch+readback;
min over reps (multi-tenant chip, docs/DESIGN.md). max_len=512 caches.
"""

import gc
import time

import numpy as np

CONFIGS = {
    "1.3b": dict(vocab=32000, dim=2048, heads=16, kv_heads=8,
                 ffn=5632, layers=24),
    "7b": dict(vocab=32000, dim=4096, heads=32, kv_heads=8,
               ffn=11008, layers=32),
}
ARMS = {"1.3b": ["bf16", "int8", "int4-g128"],
        "7b": ["int8", "int4-g128"]}
MAX_LEN = 512
PLEN = 8
N_LO, N_HI = 16, 80
REPS = 3


def param_count(cfg):
    d, f, l, v = cfg["dim"], cfg["ffn"], cfg["layers"], cfg["vocab"]
    kvd = cfg["kv_heads"] * d // cfg["heads"]
    per = d * d * 2 + d * kvd * 2 + 3 * d * f
    return l * per + 2 * v * d


def main(smoke: bool = False):
    import jax

    import smelter_tpu as st
    from smelter_tpu.models import llama_style
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import quantize_weights
    from smelter_tpu.runtime.generate import FusedGenerator

    print("devices:", jax.devices(), flush=True)

    global MAX_LEN, N_LO, N_HI, REPS
    configs = CONFIGS
    if smoke:  # CPU structural check of the exact arm pipeline
        configs = {"smoke": dict(vocab=512, dim=256, heads=4, kv_heads=2,
                                 ffn=512, layers=2)}
        ARMS["smoke"] = ["bf16", "int8", "int4-g128"]
        MAX_LEN, N_LO, N_HI, REPS = 32, 4, 8, 1

    for size, cfg in configs.items():
        print(f"\n=== {size}: {cfg} (~{param_count(cfg)/1e9:.2f}B params) "
              f"===", flush=True)
        t0 = time.perf_counter()
        w = llama_style.make_weights(max_len=MAX_LEN, **cfg)
        print(f"weights built in {time.perf_counter()-t0:.0f}s", flush=True)
        for arm in ARMS[size]:
            t0 = time.perf_counter()
            step_g, _ = llama_style.build_decode_step(
                weights=w, max_len=MAX_LEN, **cfg)
            if arm != "bf16":
                quantize_weights(step_g, arm, min_elements=1 << 16)
                run_passes(step_g, ["fuse_dequant_matmul", "dce"])
                n_fused = sum(nd.op_type.startswith("FusedDequantMatMul")
                              for nd in step_g.nodes)
                n_dq = sum(nd.op_type == "DequantizeLinear"
                           for nd in step_g.nodes)
                print(f"[{arm}] fused matmul nodes: {n_fused}, residual "
                      f"DQL: {n_dq}", flush=True)
                if n_dq:
                    left = [nd.inputs[0] for nd in step_g.nodes
                            if nd.op_type == "DequantizeLinear"]
                    print(f"  unfused: {left[:6]}", flush=True)
            # weight-stream bytes per token: every initializer the matmuls
            # read each step (exclude the embedding table - gathered row).
            # bf16 arm: f32 storage is cast to a bf16 copy once per
            # dispatch (hoisted out of the scan); the per-token stream
            # reads the bf16 copy -> count 2 bytes per f32 weight.
            wbytes = sum(
                (a.nbytes // 2 if arm == "bf16"
                 and a.dtype == np.float32 else a.nbytes)
                for nm, a in step_g.initializers.items() if nm != "wte")
            cache_bytes = (2 * 2 * cfg["layers"] * MAX_LEN
                           * cfg["kv_heads"] * cfg["dim"] // cfg["heads"])
            print(f"[{arm}] graph ready in {time.perf_counter()-t0:.0f}s; "
                  f"weight stream {wbytes/1e9:.2f} GB/tok "
                  f"(+~{cache_bytes/1e9:.2f} GB caches@bf16)", flush=True)
            t0 = time.perf_counter()
            gen = FusedGenerator(step_g,
                                 st.Config(compute_dtype="bfloat16"))
            print(f"[{arm}] params on device in "
                  f"{time.perf_counter()-t0:.0f}s", flush=True)
            prompt = list(range(1, PLEN + 1))

            def timed(n_new):
                best = float("inf")
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    out = gen.generate(prompt, n_new)
                    best = min(best, time.perf_counter() - t0)
                return best, out

            t0 = time.perf_counter()
            _, out = timed(N_LO)  # first call compiles
            print(f"[{arm}] compile+3x n={N_LO}: "
                  f"{time.perf_counter()-t0:.0f}s; tokens {out[PLEN:PLEN+6]}",
                  flush=True)
            t_lo, _ = timed(N_LO)
            t_hi, _ = timed(N_HI)
            per_tok = (t_hi - t_lo) / (N_HI - N_LO)
            gbs = wbytes / per_tok / 1e9
            print(f"[{size}/{arm}] {per_tok*1e3:8.2f} ms/tok = "
                  f"{1/per_tok:7.1f} tok/s   weight-stream {gbs:6.1f} GB/s",
                  flush=True)
            del gen
            gc.collect()
            jax.clear_caches()
        del w
        gc.collect()
    print("DONE", flush=True)


if __name__ == "__main__":
    import sys

    if "--only" in sys.argv:  # e.g. --only 7b:int4-g128 (auto-bn rerun)
        size, arm = sys.argv[sys.argv.index("--only") + 1].split(":")
        CONFIGS = {size: CONFIGS[size]}
        ARMS[size] = [arm]
    main(smoke="--smoke" in sys.argv)
