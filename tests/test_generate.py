"""KV-cache decode tests: incremental step logits must match the full-seq
causal forward at every position, and greedy generation must agree."""

import numpy as np
import pytest

import smelter_tpu as st
from smelter_tpu.models.tiny_gpt import build_decode_step, build_full
from smelter_tpu.runtime.generate import Generator


@pytest.fixture(scope="module")
def gpt():
    step_g, weights = build_decode_step(vocab=50, dim=32, heads=4, layers=2,
                                        max_len=16)
    return step_g, weights


class TestKVCacheDecode:
    def test_incremental_matches_full(self, gpt):
        step_g, weights = gpt
        T = 8
        full_g = build_full(weights, seq_len=T, vocab=50, dim=32, heads=4, layers=2)
        tokens = np.array([3, 1, 4, 1, 5, 9, 2, 6], np.int64)
        full_logits = st.CompiledModel(full_g)(tokens)[0]          # (T, vocab)

        m = st.CompiledModel(step_g)
        caches = [np.zeros(tuple(v.type.shape), np.float32)
                  for v in step_g.inputs if "cache" in v.name]
        step_logits = []
        for pos in range(T):
            outs = m(np.asarray([tokens[pos]], np.int64),
                     np.asarray([pos], np.int64), *caches)
            step_logits.append(outs[0][0])
            caches = outs[1:]
        step_logits = np.stack(step_logits)
        np.testing.assert_allclose(step_logits, full_logits, rtol=1e-3, atol=1e-4)

    def test_greedy_generation(self, gpt):
        step_g, _ = gpt
        gen = Generator(st.import_model(st.export_model(step_g)))
        out = gen.generate([3, 1, 4], n_new=5)
        assert len(out) == 8
        assert out[:3] == [3, 1, 4]
        assert all(0 <= t < 50 for t in out)

    def test_generation_deterministic(self, gpt):
        step_g, _ = gpt
        gen = Generator(step_g)
        a = gen.generate([7, 7], n_new=4)
        b = gen.generate([7, 7], n_new=4)
        assert a == b


class TestBatchedGenerator:
    def test_batched_matches_single(self, gpt):
        from smelter_tpu.runtime.generate import BatchedGenerator

        step_g, _ = gpt
        single = Generator(step_g)
        a = single.generate([3, 1, 4], n_new=4)
        b = single.generate([9, 9, 9], n_new=4)
        batched = BatchedGenerator(step_g, batch=2)
        got = batched.generate([[3, 1, 4], [9, 9, 9]], n_new=4)
        assert got[0] == a and got[1] == b


class TestFusedGenerator:
    def test_matches_host_loop(self):
        """One-dispatch lax.scan decode must be token-for-token identical
        to the per-step host loop (greedy)."""
        from smelter_tpu.models import tiny_gpt
        from smelter_tpu.runtime.generate import FusedGenerator

        step_g, _ = tiny_gpt.build_decode_step(vocab=50, dim=32, heads=4,
                                               layers=2, max_len=24)
        want = Generator(step_g).generate([3, 7, 11], 12)
        got = FusedGenerator(step_g).generate([3, 7, 11], 12)
        assert got == want

    def test_single_token_prompt_and_cap(self):
        from smelter_tpu.models import tiny_gpt
        from smelter_tpu.runtime.generate import FusedGenerator

        step_g, _ = tiny_gpt.build_decode_step(vocab=50, dim=32, heads=4,
                                               layers=2, max_len=8)
        gen = FusedGenerator(step_g)
        out = gen.generate([5], 100)  # capped at max_len
        assert out[:1] == [5] and len(out) == 8
        assert out == Generator(step_g).generate([5], 100)[:len(out)]

    def test_batched_fused_matches_singles(self):
        from smelter_tpu.models import tiny_gpt
        from smelter_tpu.runtime.generate import (FusedBatchedGenerator,
                                                  FusedGenerator)

        step_g, _ = tiny_gpt.build_decode_step(vocab=50, dim=32, heads=4,
                                               layers=2, max_len=24)
        single = FusedGenerator(step_g)
        batched = FusedBatchedGenerator(step_g, batch=3)
        prompts = [[3, 7], [1, 2], [9, 4]]
        got = batched.generate(prompts, 10)
        for p, row in zip(prompts, got):
            assert row == single.generate(p, 10)


class TestSampledDecode:
    def _gen(self):
        from smelter_tpu.models import tiny_gpt
        from smelter_tpu.runtime.generate import FusedGenerator

        step_g, _ = tiny_gpt.build_decode_step(vocab=50, dim=32, heads=4,
                                               layers=2, max_len=24)
        return FusedGenerator(step_g)

    def test_seed_reproducible(self):
        gen = self._gen()
        a = gen.generate([3, 7], 8, temperature=0.8, top_k=10, seed=1)
        b = gen.generate([3, 7], 8, temperature=0.8, top_k=10, seed=1)
        c = gen.generate([3, 7], 8, temperature=0.8, top_k=10, seed=2)
        assert a == b
        assert len(a) == 10
        # different seeds should diverge somewhere for a 50-vocab model
        d = [gen.generate([3, 7], 8, temperature=2.0, seed=s) for s in range(5)]
        assert len({tuple(t) for t in d + [tuple(c)]}) > 1

    def test_top_k_1_is_greedy(self):
        gen = self._gen()
        greedy = gen.generate([5, 9], 8)
        topk1 = gen.generate([5, 9], 8, top_k=1, temperature=1.0, seed=7)
        assert greedy == topk1


class TestBatchedSampledDecode:
    def test_batched_sampling(self):
        from smelter_tpu.models import tiny_gpt
        from smelter_tpu.runtime.generate import FusedBatchedGenerator

        step_g, _ = tiny_gpt.build_decode_step(vocab=50, dim=32, heads=4,
                                               layers=2, max_len=24)
        bgen = FusedBatchedGenerator(step_g, batch=2)
        greedy = bgen.generate([[3, 7], [5, 9]], 6)
        a = bgen.generate([[3, 7], [5, 9]], 6, temperature=1.5, seed=1)
        b = bgen.generate([[3, 7], [5, 9]], 6, temperature=1.5, seed=1)
        assert a == b  # seed-reproducible
        assert len(a[0]) == 8 and len(a[1]) == 8
        # per-stream keys: identical prompts must not produce identical
        # samples (this exact divergence is what per-stream key splitting
        # guarantees; seed fixed so the outcome is deterministic)
        c = bgen.generate([[3, 7], [3, 7]], 8, temperature=3.0, seed=2)
        assert c[0] != c[1]
        assert greedy[0] != greedy[1]  # different prompts, greedy differs too


class TestAotDecode:
    def test_save_load_roundtrip(self, tmp_path):
        from smelter_tpu.models import tiny_gpt
        from smelter_tpu.runtime.generate import FusedGenerator

        step_g, _ = tiny_gpt.build_decode_step(vocab=50, dim=32, heads=4,
                                               layers=2, max_len=24)
        gen = FusedGenerator(step_g)
        want = gen.generate([3, 7, 11], 8)
        gen.aot_save(tmp_path, plen=3, n_new=8)
        gen.aot_save(tmp_path, plen=3, n_new=8, temperature=0.8, top_k=5)
        gen2 = FusedGenerator(step_g)
        assert gen2.aot_load(tmp_path) == 2
        assert (3, 8, 0, False) in gen2._aot
        # the executable must actually run — the self-heal fallback
        # deletes the entry and warns; both are regressions (the r4
        # suite silently recompiled because execution_devices defaulted
        # to all 8 virtual devices)
        import warnings as _w

        with _w.catch_warnings():
            _w.simplefilter("error")
            assert gen2.generate([3, 7, 11], 8) == want
        assert (3, 8, 0, False) in gen2._aot
        s1 = gen.generate([3, 7, 11], 8, temperature=0.8, top_k=5, seed=3)
        with _w.catch_warnings():
            _w.simplefilter("error")
            s2 = gen2.generate([3, 7, 11], 8, temperature=0.8, top_k=5,
                               seed=3)
        assert (3, 8, 5, True) in gen2._aot
        assert s1 == s2
