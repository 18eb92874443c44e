"""Speculative decoding (runtime/speculative.py): greedy draft-and-verify
must be token-for-token identical to plain greedy decoding of the target,
regardless of draft quality; acceptance bookkeeping is exact."""

import numpy as np
import pytest

import smelter_tpu as st
from smelter_tpu.models import llama_style
from smelter_tpu.runtime.generate import FusedGenerator
from smelter_tpu.runtime.speculative import SpeculativeGenerator

CFG = dict(vocab=96, dim=128, heads=4, kv_heads=2, ffn=256, layers=3)
DCFG = dict(vocab=96, dim=32, heads=2, kv_heads=1, ffn=64, layers=1)
MAX_LEN = 64


@pytest.fixture(scope="module")
def graphs():
    wt = llama_style.make_weights(max_len=MAX_LEN, **CFG)
    step_t, _ = llama_style.build_decode_step(wt, max_len=MAX_LEN, **CFG)
    chunk_t, _ = llama_style.build_decode_step(wt, max_len=MAX_LEN,
                                               chunk=5, **CFG)
    step_d, _ = llama_style.build_decode_step(max_len=MAX_LEN, seed=7,
                                              **DCFG)
    return wt, step_t, chunk_t, step_d


def test_chunk_step_matches_full():
    """chunk>1 decode step: c tokens in one causal forward must match the
    full graph position-for-position, mid-sequence."""
    w = llama_style.make_weights(max_len=MAX_LEN, **CFG)
    full = st.CompiledModel(llama_style.build_full(w, seq_len=7, **CFG))
    toks = np.array([3, 17, 41, 8, 55, 2, 30], np.int64)
    want = full(toks)[0]
    step = st.CompiledModel(
        llama_style.build_decode_step(w, max_len=MAX_LEN, **CFG)[0])
    chunk = st.CompiledModel(
        llama_style.build_decode_step(w, max_len=MAX_LEN, chunk=4,
                                      **CFG)[0])
    kvd = CFG["kv_heads"] * CFG["dim"] // CFG["heads"]
    caches = [np.zeros((MAX_LEN, kvd), np.float32)
              for _ in range(2 * CFG["layers"])]
    for p in range(3):
        outs = step(np.array([toks[p]]), np.array([p], np.int64), *caches)
        caches = list(outs[1:])
    outs = chunk(toks[3:7], np.array([3], np.int64), *caches)
    np.testing.assert_allclose(outs[0], want[3:7], rtol=2e-4, atol=2e-4)


def test_parity_random_draft(graphs):
    """A junk draft must not change the output — only the round count."""
    _, step_t, chunk_t, step_d = graphs
    plain = FusedGenerator(step_t)
    spec = SpeculativeGenerator(step_t, chunk_t, step_d)
    for prompt in ([5, 9, 2, 17, 3], [1], [7, 7]):
        assert spec.generate(prompt, 16) == plain.generate(prompt, 16)
        assert spec.last_rounds <= 16


def test_self_draft_full_acceptance(graphs):
    """Draft == target weights: every draft token verifies, so n_new
    tokens take ceil(n_new / (gamma+1)) rounds — this exercises the
    full-acceptance catch-up path (the draft must ingest its own last
    draft token before the next round)."""
    wt, step_t, chunk_t, _ = graphs
    step_d2, _ = llama_style.build_decode_step(wt, max_len=MAX_LEN, **CFG)
    plain = FusedGenerator(step_t)
    spec = SpeculativeGenerator(step_t, chunk_t, step_d2)
    p = [5, 9, 2, 17, 3]
    assert spec.generate(p, 20) == plain.generate(p, 20)
    assert spec.last_rounds == 4, spec.last_rounds  # ceil(20/5)
    assert spec.last_accept_rate == 1.0


def test_with_prefill_graph(graphs):
    wt, step_t, chunk_t, step_d = graphs
    pf = llama_style.build_prefill(wt, prompt_len=5, max_len=MAX_LEN,
                                   **CFG)
    plain = FusedGenerator(step_t)
    spec = SpeculativeGenerator(step_t, chunk_t, step_d, prefill_graph=pf)
    p = [5, 9, 2, 17, 3]
    assert spec.generate(p, 16) == plain.generate(p, 16)
    # non-matching prompt length falls back to the scan prompt phase
    assert spec.generate([3, 4], 10) == plain.generate([3, 4], 10)


def test_int4_quantized_target(graphs):
    """Quantized target (step+chunk twins through the int4 fused path)
    against an unquantized draft: parity vs the quantized plain path."""
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import quantize_weights

    wt, _, _, step_d = graphs
    step_q, _ = llama_style.build_decode_step(wt, max_len=MAX_LEN, **CFG)
    chunk_q, _ = llama_style.build_decode_step(wt, max_len=MAX_LEN,
                                               chunk=5, **CFG)
    for g in (step_q, chunk_q):
        quantize_weights(g, "int4-g32", min_elements=64)
        run_passes(g, ["fuse_dequant_matmul", "dce"])
    plain = FusedGenerator(step_q)
    spec = SpeculativeGenerator(step_q, chunk_q, step_d)
    p = [5, 9, 2, 17, 3]
    assert spec.generate(p, 12) == plain.generate(p, 12)


def test_tail_near_max_len(graphs):
    """Near the cache end the chunk cannot scatter gamma+1 rows, so the
    rounds loop stops early and a plain-step tail finishes — the token
    contract (n_new = max_len - plen) must match FusedGenerator exactly
    (regression: the old cap silently dropped up to gamma tokens)."""
    _, step_t, chunk_t, step_d = graphs
    plain = FusedGenerator(step_t)
    spec = SpeculativeGenerator(step_t, chunk_t, step_d)
    for plen, n in [(MAX_LEN - 6, 6), (MAX_LEN - 2, 2), (MAX_LEN - 1, 1),
                    (MAX_LEN - 10, 99)]:
        p = list(range(1, plen + 1))
        a, b = plain.generate(p, n), spec.generate(p, n)
        assert a == b, (plen, n)
        assert len(a) == plen + min(n, MAX_LEN - plen)


def test_full_stack_composition_and_graph_reuse(graphs):
    """int4 weights + int8 KV + prefill + speculative composed under
    bf16, AND the same prefill/chunk graph objects reused across several
    generator instances (regression: _merge_params used to rename edges
    in the caller's graph, corrupting earlier lazily-traced instances)."""
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import quantize_weights

    cfg = dict(vocab=96, dim=128, heads=4, kv_heads=2, ffn=256, layers=2)
    w = llama_style.make_weights(max_len=48, **cfg)

    def q4(g):
        quantize_weights(g, "int4-g32", min_elements=64)
        run_passes(g, ["fuse_dequant_matmul", "dce"])
        return g

    kw = dict(max_len=48, kv_quant=True)
    step = q4(llama_style.build_decode_step(w, **kw, **cfg)[0])
    chunk = q4(llama_style.build_decode_step(w, chunk=5, **kw, **cfg)[0])
    pf = q4(llama_style.build_prefill(w, prompt_len=8, **kw, **cfg))
    draft, _ = llama_style.build_decode_step(
        max_len=48, seed=7, vocab=96, dim=32, heads=2, kv_heads=1,
        ffn=64, layers=1)
    bf = st.Config(compute_dtype="bfloat16")
    plain = FusedGenerator(step, bf, prefill_graph=pf)
    spec = SpeculativeGenerator(step, chunk, draft, config=bf,
                                prefill_graph=pf)  # pf reused
    p = list(range(1, 9))
    a = plain.generate(p, 16)  # traces AFTER spec merged the same pf
    b = spec.generate(p, 16)
    assert a == b, (a, b)


def test_mixtral_moe_chunk_parity():
    """chunk>1 + MoE FFNs (contrib MoE op on (c, dim) tokens): speculative
    decode of a Mixtral-style target matches plain greedy."""
    cfg = dict(vocab=60, dim=32, heads=4, kv_heads=2, ffn=64, layers=2)
    w = llama_style.make_weights(max_len=32, n_experts=4, **cfg)
    step, _ = llama_style.build_decode_step(w, max_len=32, **cfg)
    chunk, _ = llama_style.build_decode_step(w, max_len=32, chunk=4, **cfg)
    draft, _ = llama_style.build_decode_step(max_len=32, seed=5, **cfg)
    plain = FusedGenerator(step)
    spec = SpeculativeGenerator(step, chunk, draft)
    p = [5, 9, 2]
    assert spec.generate(p, 12) == plain.generate(p, 12)


def test_merge_params_renames_colliding_constants():
    """_merge_params: same-named initializers with DIFFERENT content
    (auto-named constants from separately built graphs) must be renamed
    in the companion graph, while content-identical names share one
    buffer (regression for the chunk-graph constant corruption)."""
    import jax.numpy as jnp

    from smelter_tpu.ir.build import GraphBuilder
    from smelter_tpu.runtime.executor import Executor
    from smelter_tpu.runtime.generate import _merge_params

    def make(mul):
        b = GraphBuilder("g", opset=17)
        x = b.input("x", (1, 4))
        w = b.init(np.full((4, 4), 2.0, np.float32), "w_shared")
        y = b.node("MatMul", [x, w])
        y = b.node("Mul", [y, b.init(np.float32(mul), "const_1")])
        b.output(y, (1, 4))
        return b.graph

    base, other = make(3.0), make(5.0)
    ex = Executor(base, st.Config())
    params = ex.init_params()
    host = {n: base.initializers[n] for n in params}
    ex2 = _merge_params(params, host, other, st.Config())
    fn = ex2.build_fn()
    x = np.ones((1, 4), np.float32)
    got = np.asarray(fn(params, x)[0])
    np.testing.assert_allclose(got, np.full((1, 4), 8.0 * 5.0))
    # base fn still sees its own constant
    got0 = np.asarray(ex.build_fn()(params, x)[0])
    np.testing.assert_allclose(got0, np.full((1, 4), 8.0 * 3.0))
    # the shared weight was NOT duplicated
    assert "w_shared" in params and "w_shared__p" not in params
    assert any("const_1__p" in n for n in params), sorted(params)


class TestSampledSpeculative:
    """Rejection-sampling speculative decode: output DISTRIBUTION equals
    plain sampling from the target (tokens differ — the key is consumed
    in a different order)."""

    def test_deterministic_and_greedy_collapse(self, graphs):
        _, step_t, chunk_t, step_d = graphs
        spec = SpeculativeGenerator(step_t, chunk_t, step_d)
        p = [5, 9, 2]
        a = spec.generate(p, 10, temperature=0.9, top_k=8, seed=5)
        assert a == spec.generate(p, 10, temperature=0.9, top_k=8, seed=5)
        assert len(a) == 13
        # temperature -> 0 collapses to the greedy chain
        assert spec.generate(p, 10, temperature=1e-4, seed=11) \
            == spec.generate(p, 10)

    def test_first_token_distribution_matches_target(self):
        """Marginal of the first sampled token vs the target's EXACT
        distribution: total variation within sampling noise (and no
        worse than plain sampling measured the same way)."""
        import collections

        cfg = dict(vocab=12, dim=64, heads=4, kv_heads=2, ffn=128,
                   layers=2)
        max_len = 16
        wt = llama_style.make_weights(max_len=max_len, **cfg)
        step, _ = llama_style.build_decode_step(wt, max_len=max_len, **cfg)
        chunk, _ = llama_style.build_decode_step(wt, max_len=max_len,
                                                 chunk=4, **cfg)
        draft, _ = llama_style.build_decode_step(
            max_len=max_len, seed=7, vocab=12, dim=32, heads=2,
            kv_heads=1, ffn=64, layers=1)
        spec = SpeculativeGenerator(step, chunk, draft)
        p = [3, 7, 1]
        temp, n = 1.1, 300
        full = st.CompiledModel(llama_style.build_full(wt, seq_len=3,
                                                       **cfg))
        logits = np.asarray(full(np.asarray(p, np.int64))[0][2],
                            np.float64)
        pz = np.exp(logits / temp - np.max(logits / temp))
        pz /= pz.sum()
        cnt = collections.Counter()
        for s in range(n):
            cnt[spec.generate(p, 1, temperature=temp, seed=s)[3]] += 1
        emp = np.array([cnt.get(i, 0) for i in range(12)],
                       np.float64) / n
        tv = 0.5 * np.abs(emp - pz).sum()
        assert tv < 0.15, tv  # ~2x the expected sqrt(k/n)/2 noise
