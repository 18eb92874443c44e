"""LLM decode-serving walkthrough: int4 weights, prefill, speculative
decoding, and the continuous-batching decode server — on one tiny
llama-style model (seeded random weights; the environment has no
pretrained checkpoints, so token IDs are arbitrary but deterministic).

Run: JAX_PLATFORMS=cpu python examples/llm_generate.py
"""

import os

import jax

jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))

import smelter_tpu as st
from smelter_tpu.models import llama_style
from smelter_tpu.passes.pass_manager import run_passes
from smelter_tpu.quant import quantize_weights
from smelter_tpu.runtime.generate import FusedGenerator
from smelter_tpu.runtime.speculative import SpeculativeGenerator
from smelter_tpu.serving.decode_server import DecodeServer

CFG = dict(vocab=512, dim=256, heads=8, kv_heads=4, ffn=512, layers=4)
MAX_LEN = 64


def q4(graph):
    """Weight-only int4, group 128 along K (opset-21 blocked DQL), then
    fuse into the packed-int4 kernel path."""
    quantize_weights(graph, "int4-g128", min_elements=1 << 14)
    run_passes(graph, ["fuse_dequant_matmul", "dce"])
    return graph


def main():
    weights = llama_style.make_weights(max_len=MAX_LEN, **CFG)
    bf = st.Config(compute_dtype="bfloat16")

    # one weight dict -> decode step + prefill + verify-chunk twins
    step = q4(llama_style.build_decode_step(weights, max_len=MAX_LEN,
                                            **CFG)[0])
    prefill = q4(llama_style.build_prefill(weights, prompt_len=8,
                                           max_len=MAX_LEN, **CFG))
    chunk = q4(llama_style.build_decode_step(weights, max_len=MAX_LEN,
                                             chunk=5, **CFG)[0])

    prompt = [1, 17, 42, 300, 7, 99, 5, 256]

    # 1) fused one-dispatch decode, prompt prefilled in ONE forward
    gen = FusedGenerator(step, bf, prefill_graph=prefill)
    print("greedy :", gen.generate(prompt, 12))
    print("sampled:", gen.generate(prompt, 12, temperature=0.8, top_k=40))

    # 2) speculative decoding: a small draft proposes, the target
    # verifies 5 positions per forward — same tokens, fewer weight reads
    draft = llama_style.build_decode_step(
        max_len=MAX_LEN, seed=7, vocab=512, dim=64, heads=4, kv_heads=2,
        ffn=128, layers=1)[0]
    spec = SpeculativeGenerator(step, chunk, draft, config=bf,
                                prefill_graph=prefill)
    out = spec.generate(prompt, 12)
    print("spec   :", out, f"(rounds={spec.last_rounds}, "
          f"accept={spec.last_accept_rate:.2f})")

    # 3) continuous batching with prefill admission
    srv = DecodeServer(step, slots=4, config=bf, prefill_graphs=[prefill])
    try:
        futs = [srv.submit(prompt, 8), srv.submit([3, 9], 8),
                srv.submit([256, 1, 300, 4, 17], 8)]
        for f in futs:
            print("served :", f.result(timeout=300))
    finally:
        srv.shutdown()


if __name__ == "__main__":
    main()
