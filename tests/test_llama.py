"""LLaMA-style family (models/llama_style.py): contrib-op full graph vs
primitive-op KV-cache decode step parity, and FusedGenerator decode."""

import numpy as np

import smelter_tpu as st
from smelter_tpu.models import llama_style

CFG = dict(vocab=60, dim=32, heads=4, kv_heads=2, ffn=64, layers=2)


def test_full_forward_runs_through_compile():
    w = llama_style.make_weights(max_len=16, **CFG)
    g = llama_style.build_full(w, seq_len=8, **CFG)
    g = st.import_model(st.export_model(g))  # serialization roundtrip
    m = st.compile(g)
    toks = np.arange(8, dtype=np.int64) % CFG["vocab"]
    logits = m(toks)[0]
    assert logits.shape == (8, CFG["vocab"])
    assert np.isfinite(logits).all()


def test_decode_step_matches_full():
    max_len = 12
    w = llama_style.make_weights(max_len=max_len, **CFG)
    step_g, _ = llama_style.build_decode_step(w, max_len=max_len, **CFG)
    full_g = llama_style.build_full(w, seq_len=6, **CFG)
    step = st.CompiledModel(step_g)
    full = st.CompiledModel(full_g)
    toks = np.array([3, 17, 41, 8, 55, 2], np.int64)
    want = full(toks)[0]  # (6, vocab)
    kvd = CFG["kv_heads"] * CFG["dim"] // CFG["heads"]
    caches = [np.zeros((max_len, kvd), np.float32) for _ in range(2 * CFG["layers"])]
    for p in range(6):
        outs = step(np.array([toks[p]]), np.array([p], np.int64), *caches)
        logits, caches = outs[0], list(outs[1:])
        np.testing.assert_allclose(
            logits[0], want[p], rtol=2e-4, atol=2e-4,
            err_msg=f"position {p}")


def test_fused_generator_greedy():
    from smelter_tpu.runtime.generate import FusedGenerator

    max_len = 16
    step_g, w = llama_style.build_decode_step(max_len=max_len, **CFG)
    gen = FusedGenerator(step_g)
    out = gen.generate([5, 9, 2], 8)
    assert len(out) == 11
    # greedy rollout must agree with the full graph's argmax chain
    full_g = llama_style.build_full(w, seq_len=11, **CFG)
    full = st.CompiledModel(full_g)
    toks = list(out)
    logits = full(np.asarray(toks, np.int64))[0]
    for p in range(2, 10):
        assert int(np.argmax(logits[p])) == toks[p + 1], f"position {p}"


def test_llama_tp_parity(eight_devices):
    """Full llama graph under tensor parallelism (tp=2 over the virtual
    mesh): sharded weights produce identical logits (BASELINE config 5's
    sharded-transformer pattern on the GQA/RoPE/SwiGLU stack)."""
    import jax
    from smelter_tpu.parallel.mesh import (MeshPlan, param_shardings,
                                           shard_params)

    w = llama_style.make_weights(max_len=16, **CFG)
    g = llama_style.build_full(w, seq_len=8, **CFG)
    ex = st.Executor(g)
    toks = np.arange(8, dtype=np.int64) % CFG["vocab"]
    want = st.CompiledModel(g)(toks)[0]
    plan = MeshPlan.for_devices(8, tp=2)
    with plan.mesh:
        params = shard_params(ex, plan)
        fn = jax.jit(ex.build_fn(),
                     in_shardings=(param_shardings(ex, plan),
                                   plan.replicated()))
        got = np.asarray(fn(params, toks)[0])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestMixtralStyle:
    """llama family with MoE FFNs (contrib MoE op): decode-vs-full parity
    and one-dispatch generation."""

    CFGM = dict(vocab=60, dim=32, heads=4, kv_heads=2, ffn=64, layers=2)

    def test_decode_matches_full(self):
        max_len = 12
        w = llama_style.make_weights(max_len=max_len, n_experts=4,
                                     **self.CFGM)
        step_g, _ = llama_style.build_decode_step(w, max_len=max_len,
                                                  **self.CFGM)
        full_g = llama_style.build_full(w, seq_len=6, **self.CFGM)
        ops = {n.op_type for n in full_g.nodes}
        assert "MoE" in ops
        step = st.CompiledModel(step_g)
        full = st.CompiledModel(full_g)
        toks = np.array([3, 17, 41, 8, 55, 2], np.int64)
        want = full(toks)[0]
        kvd = self.CFGM["kv_heads"] * self.CFGM["dim"] // self.CFGM["heads"]
        caches = [np.zeros((max_len, kvd), np.float32)
                  for _ in range(2 * self.CFGM["layers"])]
        for p in range(6):
            outs = step(np.array([toks[p]]), np.array([p], np.int64), *caches)
            logits, caches = outs[0], list(outs[1:])
            np.testing.assert_allclose(logits[0], want[p], rtol=5e-4,
                                       atol=5e-4, err_msg=f"position {p}")

    def test_fused_generate(self):
        from smelter_tpu.runtime.generate import FusedGenerator

        w = llama_style.make_weights(max_len=16, n_experts=4, **self.CFGM)
        step_g, _ = llama_style.build_decode_step(w, max_len=16, **self.CFGM)
        out = FusedGenerator(step_g).generate([5, 9], 8)
        assert len(out) == 10 and all(0 <= t < 60 for t in out)


def test_bf16_compute_decode():
    """compute_dtype=bfloat16 decode: the scan carries the KV caches, so
    they must be seeded in the step's emit dtype (regression: f32 seeds
    against bf16 cache outputs was a carry-type error)."""
    from smelter_tpu.runtime.generate import FusedBatchedGenerator, FusedGenerator

    cfg = dict(vocab=60, dim=128, heads=4, kv_heads=2, ffn=128, layers=2)
    step_g, _ = llama_style.build_decode_step(max_len=16, **cfg)
    bf = st.Config(compute_dtype="bfloat16")
    out = FusedGenerator(step_g, bf).generate([5, 9, 2], 8)
    assert len(out) == 11 and all(0 <= t < 60 for t in out)
    outs = FusedBatchedGenerator(step_g, batch=2, config=bf).generate(
        [[5, 9, 2], [1, 4, 7]], 4)
    assert len(outs) == 2 and all(len(o) == 7 for o in outs)


def test_int4_grouped_decode_matches_full():
    """Weight-only int4-g32 (grouped/blocked DequantizeLinear): the
    decode step and the full graph quantize the SAME weights with the
    same algorithm, so greedy decode must agree token-for-token with the
    quantized full graph's argmax chain."""
    from smelter_tpu.quant import quantize_weights
    from smelter_tpu.runtime.generate import FusedGenerator

    cfg = dict(vocab=60, dim=128, heads=4, kv_heads=2, ffn=128, layers=2)
    max_len = 16
    step_g, w = llama_style.build_decode_step(max_len=max_len, **cfg)
    quantize_weights(step_g, "int4-g32", min_elements=64)
    n_blocked = sum(1 for nd in step_g.nodes
                    if nd.op_type == "DequantizeLinear"
                    and nd.attr("block_size"))
    assert n_blocked >= 2 * cfg["layers"], n_blocked
    gen = FusedGenerator(step_g)
    out = gen.generate([5, 9, 2], 8)
    assert len(out) == 11

    full_g = llama_style.build_full(w, seq_len=11, **cfg)
    quantize_weights(full_g, "int4-g32", min_elements=64)
    full = st.CompiledModel(full_g)
    logits = full(np.asarray(out, np.int64))[0]
    for p in range(2, 10):
        assert int(np.argmax(logits[p])) == out[p + 1], f"position {p}"


class TestPrefill:
    """Sequence-level prefill (build_prefill + FusedGenerator
    prefill_graph): one full-sequence forward fills the KV caches;
    greedy decode must be token-for-token identical to the
    scan-through-the-prompt path."""

    CFG = dict(vocab=60, dim=128, heads=4, kv_heads=2, ffn=128, layers=2)

    def _pair(self, max_len=24, plen=5, quant=None):
        from smelter_tpu.passes.pass_manager import run_passes
        from smelter_tpu.quant import quantize_weights

        w = llama_style.make_weights(max_len=max_len, **self.CFG)
        step_g, _ = llama_style.build_decode_step(w, max_len=max_len,
                                                  **self.CFG)
        pf_g = llama_style.build_prefill(w, prompt_len=plen,
                                         max_len=max_len, **self.CFG)
        if quant:
            for g in (step_g, pf_g):
                quantize_weights(g, quant, min_elements=64)
                run_passes(g, ["fuse_dequant_matmul", "dce"])
        return step_g, pf_g

    def test_greedy_parity(self):
        from smelter_tpu.runtime.generate import FusedGenerator

        step_g, pf_g = self._pair()
        plain = FusedGenerator(step_g)
        pf = FusedGenerator(step_g, prefill_graph=pf_g)
        p = [5, 9, 2, 17, 3]
        assert pf.generate(p, 8) == plain.generate(p, 8)
        # a prompt of a different length falls back to the scan path
        assert pf.generate([5, 9], 6) == plain.generate([5, 9], 6)

    def test_int4_quantized_shares_params(self):
        from smelter_tpu.runtime.generate import FusedGenerator

        step_g, pf_g = self._pair(quant="int4-g32")
        assert any(n.op_type == "FusedDequantMatMulI4" for n in pf_g.nodes)
        plain = FusedGenerator(step_g)
        n_before = len(plain._params)
        pf = FusedGenerator(step_g, prefill_graph=pf_g)
        p = [5, 9, 2, 17, 3]
        assert pf.generate(p, 8) == plain.generate(p, 8)
        # every quantized weight is shared by name: the prefill adds only
        # its small private constants (pos_ids, pads, shapes)
        extra = len(pf._params) - n_before
        big = sum(1 for k, v in pf._params.items()
                  if v.size > 4096 and k not in plain._params)
        assert big == 0, (extra, big)

    def test_prefill_bucket_ladder(self):
        """A LIST of prefill graphs: each prompt length picks its exact
        bucket; unmatched lengths fall back to the scan path."""
        from smelter_tpu.runtime.generate import FusedGenerator

        w = llama_style.make_weights(max_len=24, **self.CFG)
        step_g, _ = llama_style.build_decode_step(w, max_len=24, **self.CFG)
        pfs = [llama_style.build_prefill(w, prompt_len=p, max_len=24,
                                         **self.CFG) for p in (3, 5)]
        plain = FusedGenerator(step_g)
        pf = FusedGenerator(step_g, prefill_graph=pfs)
        assert sorted(pf._decode_pf) == [3, 5]
        for p in ([5, 9, 2], [5, 9, 2, 17, 3], [1, 4]):
            assert pf.generate(p, 6) == plain.generate(p, 6), p

    def test_batched_prefill_parity(self):
        from smelter_tpu.runtime.generate import FusedBatchedGenerator

        step_g, pf_g = self._pair()
        plain = FusedBatchedGenerator(step_g, batch=2)
        pf = FusedBatchedGenerator(step_g, batch=2, prefill_graph=pf_g)
        prompts = [[5, 9, 2, 17, 3], [1, 4, 7, 2, 9]]
        assert pf.generate(prompts, 6) == plain.generate(prompts, 6)

    def test_sampled_prefill_reproducible(self):
        from smelter_tpu.runtime.generate import FusedGenerator

        step_g, pf_g = self._pair()
        pf = FusedGenerator(step_g, prefill_graph=pf_g)
        p = [5, 9, 2, 17, 3]
        a = pf.generate(p, 8, temperature=0.8, top_k=5, seed=3)
        b = pf.generate(p, 8, temperature=0.8, top_k=5, seed=3)
        assert a == b and len(a) == 13


class TestInt8KVCache:
    """kv_quant=True: int8 caches with per-row scales — half the cache
    HBM (long-context capacity + decode traffic). The quantization is
    the same lossy function in the step, chunk, and prefill forms, so
    generation parity across them stays EXACT; only vs the fp-cache
    graph is it approximate."""

    CFG = dict(vocab=96, dim=128, heads=4, kv_heads=2, ffn=256, layers=2)

    def test_logits_close_to_fp_cache(self):
        max_len = 32
        w = llama_style.make_weights(max_len=max_len, **self.CFG)
        sf = st.CompiledModel(
            llama_style.build_decode_step(w, max_len=max_len, **self.CFG)[0])
        sq = st.CompiledModel(
            llama_style.build_decode_step(w, max_len=max_len, kv_quant=True,
                                          **self.CFG)[0])
        kvd = 64
        cf = [np.zeros((max_len, kvd), np.float32) for _ in range(4)]
        cq = []
        for _ in range(2):
            cq += [np.zeros((max_len, kvd), np.int8),
                   np.zeros((max_len, 1), np.float32),
                   np.zeros((max_len, kvd), np.int8),
                   np.zeros((max_len, 1), np.float32)]
        worst = 0.0
        for p, t in enumerate([3, 17, 41, 8, 55, 2]):
            of = sf(np.array([t]), np.array([p], np.int64), *cf)
            cf = list(of[1:])
            oq = sq(np.array([t]), np.array([p], np.int64), *cq)
            cq = list(oq[1:])
            worst = max(worst, float(
                np.abs(of[0] - oq[0]).max() / np.abs(of[0]).max()))
        assert worst < 0.03, worst

    def test_prefill_and_speculative_parity(self):
        from smelter_tpu.runtime.generate import FusedGenerator
        from smelter_tpu.runtime.speculative import SpeculativeGenerator

        max_len = 32
        w = llama_style.make_weights(max_len=max_len, **self.CFG)
        step_q, _ = llama_style.build_decode_step(w, max_len=max_len,
                                                  kv_quant=True, **self.CFG)
        chunk_q, _ = llama_style.build_decode_step(
            w, max_len=max_len, chunk=5, kv_quant=True, **self.CFG)
        pf_q = llama_style.build_prefill(w, prompt_len=5, max_len=max_len,
                                         kv_quant=True, **self.CFG)
        draft, _ = llama_style.build_decode_step(
            max_len=max_len, seed=7, vocab=96, dim=32, heads=2, kv_heads=1,
            ffn=64, layers=1)
        plain = FusedGenerator(step_q)
        p = [5, 9, 2, 17, 3]
        want = plain.generate(p, 12)
        assert FusedGenerator(step_q, prefill_graph=pf_q).generate(p, 12) \
            == want
        assert SpeculativeGenerator(step_q, chunk_q, draft).generate(
            p, 12) == want
        # int8 cache dtype actually engaged
        assert any(str(d) == "int8" for d in plain.cache_dtypes)

    def test_prefill_parity_randomized(self):
        """Regression (round-4 review): with kv_quant the prefill graph
        must attend the SAME quantize-dequant K/V the decode step reads
        from the cache — fp-attention prefill flipped ~3.5% of first
        tokens at near-tie logits. Randomized sweep, zero flips."""
        from smelter_tpu.runtime.generate import FusedGenerator

        max_len = 32
        w = llama_style.make_weights(max_len=max_len, **self.CFG)
        step_q, _ = llama_style.build_decode_step(w, max_len=max_len,
                                                  kv_quant=True, **self.CFG)
        pf_q = llama_style.build_prefill(w, prompt_len=5, max_len=max_len,
                                         kv_quant=True, **self.CFG)
        plain = FusedGenerator(step_q)
        pf = FusedGenerator(step_q, prefill_graph=pf_q)
        rng = np.random.default_rng(0)
        for _ in range(40):
            p = [int(t) for t in rng.integers(0, self.CFG["vocab"], 5)]
            assert pf.generate(p, 3) == plain.generate(p, 3), p

    def test_decode_server_int8_cache(self):
        from smelter_tpu.serving.decode_server import DecodeServer

        max_len = 32
        w = llama_style.make_weights(max_len=max_len, **self.CFG)
        step_q, _ = llama_style.build_decode_step(w, max_len=max_len,
                                                  kv_quant=True, **self.CFG)
        pf_q = llama_style.build_prefill(w, prompt_len=4, max_len=max_len,
                                         kv_quant=True, **self.CFG)
        from smelter_tpu.runtime.generate import FusedGenerator

        gen = FusedGenerator(step_q)
        srv = DecodeServer(step_q, slots=2, prefill_graphs=[pf_q])
        try:
            prompts = [[5, 9, 2, 17], [1, 4], [7, 3, 9]]
            futs = [srv.submit(p, 6) for p in prompts]
            got = [f.result(timeout=120) for f in futs]
            assert got == [gen.generate(p, 6) for p in prompts]
        finally:
            srv.shutdown()
