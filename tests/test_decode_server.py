"""Continuous-batching decode server (serving/decode_server.py)."""

import numpy as np
import pytest

from smelter_tpu.models import speech_decoder, tiny_gpt
from smelter_tpu.runtime.generate import FusedGenerator
from smelter_tpu.serving.decode_server import DecodeServer


@pytest.fixture(scope="module")
def gpt_step():
    step_g, _ = tiny_gpt.build_decode_step(vocab=50, dim=32, heads=4,
                                           layers=2, max_len=24)
    return step_g


class TestDecodeServer:
    def test_matches_fused_generator(self, gpt_step):
        srv = DecodeServer(gpt_step, slots=4)
        try:
            gen = FusedGenerator(gpt_step)
            prompts = [[3, 7, 11], [5], [9, 2], [1, 2, 3, 4]]
            futs = [srv.submit(p, 6) for p in prompts]
            got = [f.result(timeout=120) for f in futs]
            for p, g in zip(prompts, got):
                assert g == gen.generate(p, 6), p
        finally:
            srv.shutdown()

    def test_more_requests_than_slots(self, gpt_step):
        srv = DecodeServer(gpt_step, slots=2)
        try:
            gen = FusedGenerator(gpt_step)
            prompts = [[i + 1, i + 2] for i in range(7)]
            futs = [srv.submit(p, 5) for p in prompts]
            for p, f in zip(prompts, futs):
                assert f.result(timeout=240) == gen.generate(p, 5)
        finally:
            srv.shutdown()

    def test_stop_tokens(self, gpt_step):
        gen = FusedGenerator(gpt_step)
        full = gen.generate([3, 7, 11], 10)
        stop = full[5]  # a token we know the rollout produces
        first = full.index(stop, 3)  # its FIRST generated occurrence
        srv = DecodeServer(gpt_step, slots=2, stop_tokens=(stop,))
        try:
            out = srv.submit([3, 7, 11], 10).result(timeout=120)
            assert out == full[:first + 1]  # stops right at the stop token
        finally:
            srv.shutdown()

    def test_ragged_admission_and_slot_reuse(self, gpt_step):
        """Sequences of different lengths finishing at different times must
        not corrupt each other (slot reuse without cache reset)."""
        srv = DecodeServer(gpt_step, slots=2)
        try:
            gen = FusedGenerator(gpt_step)
            f1 = srv.submit([3], 12)
            f2 = srv.submit([5, 9, 2, 8], 3)  # finishes much earlier
            f3 = srv.submit([7, 7], 8)        # admitted into f2's slot
            assert f2.result(timeout=120) == gen.generate([5, 9, 2, 8], 3)
            assert f3.result(timeout=120) == gen.generate([7, 7], 8)
            assert f1.result(timeout=120) == gen.generate([3], 12)
        finally:
            srv.shutdown()

    def test_context_model(self):
        step_g, _ = speech_decoder.build_decode_step(
            vocab=50, dim=32, heads=4, layers=1, max_len=12, t_enc=6)
        gen = FusedGenerator(step_g)
        rng = np.random.default_rng(0)
        mems = [rng.standard_normal((6, 32)).astype(np.float32)
                for _ in range(3)]
        srv = DecodeServer(step_g, slots=2)
        try:
            futs = [srv.submit([1, 2], 5, context={"memory": m})
                    for m in mems]
            for m, f in zip(mems, futs):
                assert f.result(timeout=120) == gen.generate(
                    [1, 2], 5, context={"memory": m})
        finally:
            srv.shutdown()

    def test_stats_and_shutdown_drain(self, gpt_step):
        srv = DecodeServer(gpt_step, slots=1)
        st_ = srv.stats()
        assert st_["slots"] == 1 and st_["active"] == 0
        srv.shutdown()


class TestDecodeServerRobustness:
    def test_n_new_zero_and_long_prompt(self, gpt_step):
        srv = DecodeServer(gpt_step, slots=2)
        try:
            assert srv.submit([1, 2], 0).result(timeout=30) == [1, 2]
            with pytest.raises(ValueError):
                srv.submit(list(range(30)), 4).result(timeout=30)
        finally:
            srv.shutdown()

    def test_bad_context_fails_future_not_server(self):
        from smelter_tpu.models import speech_decoder

        step_g, _ = speech_decoder.build_decode_step(
            vocab=50, dim=32, heads=4, layers=1, max_len=12, t_enc=6)
        srv = DecodeServer(step_g, slots=2)
        try:
            bad = srv.submit([1], 4, context={"memory":
                                              np.zeros((7, 32), np.float32)})
            with pytest.raises(Exception):
                bad.result(timeout=30)
            # server must still serve good requests afterwards
            good = srv.submit([1], 4, context={"memory":
                                               np.zeros((6, 32), np.float32)})
            assert len(good.result(timeout=60)) == 5
        finally:
            srv.shutdown()


class TestPrefillAdmission:
    """DecodeServer(prefill_graphs=...): admission fills a slot's cache
    rows in one forward (bucket ladder; pad-up and partial-prefill both
    safe because every row is written-before-read). Outputs must match
    the per-tick feeding path exactly."""

    CFG = dict(vocab=60, dim=128, heads=4, kv_heads=2, ffn=128, layers=2)

    def _graphs(self, max_len=32, buckets=(4, 8)):
        from smelter_tpu.models import llama_style

        w = llama_style.make_weights(max_len=max_len, **self.CFG)
        step_g, _ = llama_style.build_decode_step(w, max_len=max_len,
                                                  **self.CFG)
        pfs = [llama_style.build_prefill(w, prompt_len=p, max_len=max_len,
                                         **self.CFG) for p in buckets]
        return step_g, pfs

    def test_prefill_admission_parity(self):
        step_g, pfs = self._graphs()
        plain = DecodeServer(step_g, slots=3)
        pf = DecodeServer(step_g, slots=3, prefill_graphs=pfs)
        try:
            prompts = [
                [5, 9, 2, 17],          # exact bucket 4
                [1, 4],                 # pad-up into bucket 4
                [7, 3, 9, 1, 2, 8, 6],  # bucket 8 pad-up
                [2] * 12,               # longer than largest: partial
                [9],                    # length-1: per-tick path
            ]
            want = [plain.submit(p, 6).result(timeout=120) for p in prompts]
            got = [pf.submit(p, 6).result(timeout=120) for p in prompts]
            assert got == want
        finally:
            plain.shutdown()
            pf.shutdown()

    def test_prefill_mixed_with_active_slots(self):
        """Admitting with prefill while other slots are mid-decode must
        not disturb them (the .at[slot].set scatter touches one row)."""
        step_g, pfs = self._graphs()
        plain = DecodeServer(step_g, slots=2)
        pf = DecodeServer(step_g, slots=2, prefill_graphs=pfs)
        try:
            prompts = [[3, 7, 11, 2], [5, 1], [9, 2, 4, 8, 1],
                       [6, 6, 6, 6], [1, 2, 3], [8, 4]]
            futs_w = [plain.submit(p, 8) for p in prompts]
            futs_g = [pf.submit(p, 8) for p in prompts]
            want = [f.result(timeout=180) for f in futs_w]
            got = [f.result(timeout=180) for f in futs_g]
            assert got == want
        finally:
            plain.shutdown()
            pf.shutdown()


class TestSpecDecodeServer:
    """Speculative continuous batching: every tick is a vmapped
    draft-and-verify round; prompt tokens ride as forced-accepted drafts
    (gamma+1/tick ingestion). Greedy outputs must be token-identical to
    FusedGenerator/DecodeServer."""

    CFG = dict(vocab=60, dim=64, heads=4, kv_heads=2, ffn=96, layers=2)
    PROMPTS = [[5, 9, 2, 17], [1, 4], [7, 3, 9, 1, 2, 8, 6], [2] * 9, [9]]

    @pytest.fixture(scope="class")
    def graphs(self):
        from smelter_tpu.models import llama_style

        w = llama_style.make_weights(max_len=32, **self.CFG)
        step, _ = llama_style.build_decode_step(w, max_len=32, **self.CFG)
        chunk, _ = llama_style.build_decode_step(w, max_len=32, chunk=4,
                                                 **self.CFG)
        draft, _ = llama_style.build_decode_step(
            max_len=32, seed=9, vocab=60, dim=32, heads=2, kv_heads=1,
            ffn=64, layers=1)
        pfs = [llama_style.build_prefill(w, prompt_len=p, max_len=32,
                                         **self.CFG) for p in (4, 8)]
        return w, step, chunk, draft, pfs

    def _want(self, step, n=6):
        gen = FusedGenerator(step)
        return [gen.generate(p, n) for p in self.PROMPTS]

    def test_parity_forced_draft_prompts(self, graphs):
        from smelter_tpu.serving.decode_server import SpecDecodeServer

        _, step, chunk, draft, _ = graphs
        srv = SpecDecodeServer(step, chunk, draft, slots=3)
        try:
            futs = [srv.submit(p, 6) for p in self.PROMPTS]
            got = [f.result(timeout=180) for f in futs]
        finally:
            srv.shutdown()
        assert got == self._want(step)

    def test_parity_with_prefill_admission(self, graphs):
        from smelter_tpu.serving.decode_server import SpecDecodeServer

        _, step, chunk, draft, pfs = graphs
        srv = SpecDecodeServer(step, chunk, draft, slots=2,
                               prefill_graphs=pfs)
        try:
            futs = [srv.submit(p, 6) for p in self.PROMPTS]
            got = [f.result(timeout=180) for f in futs]
        finally:
            srv.shutdown()
        assert got == self._want(step)

    def test_self_draft_and_stop_tokens(self, graphs):
        from smelter_tpu.models import llama_style
        from smelter_tpu.serving.decode_server import SpecDecodeServer

        w, step, chunk, _, _ = graphs
        draft_self, _ = llama_style.build_decode_step(w, max_len=32,
                                                      **self.CFG)
        want = self._want(step, 8)
        srv = SpecDecodeServer(step, chunk, draft_self, slots=2)
        try:
            futs = [srv.submit(p, 8) for p in self.PROMPTS[:3]]
            got = [f.result(timeout=180) for f in futs]
        finally:
            srv.shutdown()
        assert got == want[:3]
        # stop token mid-run truncates exactly like DecodeServer
        stop = want[0][5]
        srv2 = SpecDecodeServer(step, chunk, draft_self, slots=2,
                                stop_tokens=(stop,))
        try:
            got2 = srv2.submit(self.PROMPTS[0], 8).result(timeout=120)
        finally:
            srv2.shutdown()
        assert got2 == want[0][:6]

    def test_acceptance_stats(self, graphs):
        """Voluntary acceptance accounting: self-draft -> 1.0, the
        tiny independent random draft -> near zero; forced prompt
        ingestion must not inflate the rate (bench.py --serve-decode
        reports this number)."""
        from smelter_tpu.models import llama_style
        from smelter_tpu.serving.decode_server import SpecDecodeServer

        w, step, chunk, draft, _ = graphs
        draft_self, _ = llama_style.build_decode_step(w, max_len=32,
                                                      **self.CFG)
        rates = {}
        for name, d in (("self", draft_self), ("tiny", draft)):
            srv = SpecDecodeServer(step, chunk, d, slots=2)
            try:
                futs = [srv.submit(p, 8) for p in self.PROMPTS[:3]]
                for f in futs:
                    f.result(timeout=180)
                st_ = srv.stats()
            finally:
                srv.shutdown()
            assert st_["ticks"] > 0 and st_["gamma"] == 3
            rates[name] = st_["accept_rate"]
        assert rates["self"] == pytest.approx(1.0)
        assert rates["tiny"] < 0.5


class TestBucketedDecodeServer:
    """KV bucket ladder: mixed-length workloads hold less cache HBM than
    slots x max_len while producing DecodeServer-identical tokens
    (VERDICT r4 #5; probe78's caches-not-weights memory constraint)."""

    CFG = dict(vocab=60, dim=64, heads=4, kv_heads=2, ffn=96, layers=2)

    def _buckets(self, w, lens=(16, 64), slots=(3, 2), prefills=False):
        from smelter_tpu.models import llama_style

        out = []
        for L, n in zip(lens, slots):
            step, _ = llama_style.build_decode_step(w, max_len=L,
                                                    **self.CFG)
            pfs = ([llama_style.build_prefill(w, prompt_len=min(8, L // 2),
                                              max_len=L, **self.CFG)]
                   if prefills else [])
            out.append({"step": step, "slots": n, "prefills": pfs})
        return out

    def test_parity_and_memory(self):
        from smelter_tpu.models import llama_style
        from smelter_tpu.serving.decode_server import (
            BucketedDecodeServer, DecodeServer)

        w = llama_style.make_weights(max_len=64, **self.CFG)
        step64, _ = llama_style.build_decode_step(w, max_len=64,
                                                  **self.CFG)
        prompts = [[5, 9, 2], [1] * 10, [7, 3] * 12, [4], [2, 8, 6, 1]]
        flat = DecodeServer(step64, slots=5)
        try:
            want = [flat.submit(p, 6).result(timeout=180) for p in prompts]
            flat_bytes = flat.cache_bytes()
        finally:
            flat.shutdown()

        srv = BucketedDecodeServer(self._buckets(w))
        try:
            futs = [srv.submit(p, 6) for p in prompts]
            got = [f.result(timeout=180) for f in futs]
            assert srv.cache_bytes() < srv.uniform_cache_bytes()
            # (3x16 + 2x64) / (5x64) rows = 55% of the flat allocation
            assert srv.cache_bytes() <= 0.56 * flat_bytes
        finally:
            srv.shutdown()
        assert got == want

    def test_routing_and_spill(self):
        from smelter_tpu.models import llama_style
        from smelter_tpu.serving.decode_server import BucketedDecodeServer

        w = llama_style.make_weights(max_len=64, **self.CFG)
        srv = BucketedDecodeServer(self._buckets(w))
        try:
            # short fits the 16-bucket; long must land in the 64-bucket
            short = srv.submit([3, 1], 4)
            long = srv.submit([9] * 30, 8)
            assert short.result(timeout=120) and long.result(timeout=120)
            st_ = srv.stats()
            assert [b["max_len"] for b in st_["buckets"]] == [16, 64]
            # over-long: largest bucket rejects like DecodeServer
            bad = srv.submit([1] * 64, 4)
            with pytest.raises(ValueError):
                bad.result(timeout=60)
        finally:
            srv.shutdown()

    def test_weights_shared_not_duplicated(self):
        import warnings

        from smelter_tpu.models import llama_style
        from smelter_tpu.serving.decode_server import BucketedDecodeServer

        w = llama_style.make_weights(max_len=64, **self.CFG)
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # dup-weight warning must not fire
            srv = BucketedDecodeServer(self._buckets(w))
        try:
            ps = [s._params for s in srv._servers]
            assert ps[0] is ps[1]  # one shared dict
            # every weight-sized entry is a single device buffer
            big = [n for n, a in ps[0].items() if a.size > 1000]
            assert big
        finally:
            srv.shutdown()

    def test_prefill_buckets_compose(self):
        from smelter_tpu.models import llama_style
        from smelter_tpu.serving.decode_server import (
            BucketedDecodeServer, DecodeServer)

        w = llama_style.make_weights(max_len=64, **self.CFG)
        step64, _ = llama_style.build_decode_step(w, max_len=64,
                                                  **self.CFG)
        prompts = [[5, 9, 2, 4], [1] * 6, [7, 3] * 10]
        flat = DecodeServer(step64, slots=3)
        try:
            want = [flat.submit(p, 5).result(timeout=180) for p in prompts]
        finally:
            flat.shutdown()
        srv = BucketedDecodeServer(self._buckets(w, prefills=True))
        try:
            futs = [srv.submit(p, 5) for p in prompts]
            got = [f.result(timeout=180) for f in futs]
        finally:
            srv.shutdown()
        assert got == want

    def test_early_exit_self_draft(self):
        """Draft&Verify-style early-exit drafting: the draft is the
        first K layers of the TARGET (same weight dict, shared on
        device) + its final norm/head — no separate draft model. Greedy
        parity holds by construction regardless of draft quality."""
        from smelter_tpu.models import llama_style
        from smelter_tpu.serving.decode_server import SpecDecodeServer

        cfg = dict(vocab=60, dim=64, heads=4, kv_heads=2, ffn=96)
        w = llama_style.make_weights(max_len=32, layers=4, **cfg)
        step, _ = llama_style.build_decode_step(w, max_len=32, layers=4,
                                                **cfg)
        chunk, _ = llama_style.build_decode_step(w, max_len=32, layers=4,
                                                 chunk=4, **cfg)
        draft, _ = llama_style.build_decode_step(w, max_len=32, layers=2,
                                                 **cfg)
        srv = SpecDecodeServer(step, chunk, draft, slots=2)
        try:
            # the shared layer weights must be ONE device buffer set:
            # the merge keeps name+content-equal params un-renamed
            renamed = [n for n in srv._params if n.endswith("__p")
                       and srv._params[n].size > 1000]
            assert not renamed, renamed
            futs = [srv.submit([5, 9, 2], 10), srv.submit([1, 4], 8)]
            outs = [f.result(timeout=180) for f in futs]
            stats = srv.stats()
        finally:
            srv.shutdown()
        from smelter_tpu.runtime.generate import FusedGenerator

        gen = FusedGenerator(step)
        assert outs[0] == gen.generate([5, 9, 2], 10)
        assert outs[1] == gen.generate([1, 4], 8)
        assert stats["accept_rate"] is not None


class TestMultiStepTick:
    """DecodeServer(tick_steps=T): T chained decode steps per dispatch —
    the host round trip (the slot loop's dominant cost over an RPC
    tunnel) is paid once per T tokens. Greedy outputs must be
    token-identical to the single-step server."""

    def test_parity_mixed_prompts(self, gpt_step):
        want_srv = DecodeServer(gpt_step, slots=4)
        multi = DecodeServer(gpt_step, slots=4, tick_steps=4)
        try:
            prompts = [[3, 7, 11], [5], [9, 2], [1, 2, 3, 4, 5, 6, 7]]
            want = [want_srv.submit(p, 7).result(timeout=120)
                    for p in prompts]
            futs = [multi.submit(p, 7) for p in prompts]
            got = [f.result(timeout=120) for f in futs]
        finally:
            want_srv.shutdown()
            multi.shutdown()
        assert got == want

    def test_parity_with_stop_tokens(self, gpt_step):
        gen = FusedGenerator(gpt_step)
        full = gen.generate([3, 7, 11], 10)
        stop = full[5]
        first = full.index(stop, 3)
        srv = DecodeServer(gpt_step, slots=2, tick_steps=3,
                           stop_tokens=(stop,))
        try:
            out = srv.submit([3, 7, 11], 10).result(timeout=120)
        finally:
            srv.shutdown()
        assert out == full[:first + 1]

    def test_parity_near_max_len(self, gpt_step):
        # max_len 24: generation must clamp identically to single-step
        plain = DecodeServer(gpt_step, slots=1)
        multi = DecodeServer(gpt_step, slots=1, tick_steps=5)
        try:
            want = plain.submit([2, 4], 30).result(timeout=120)
            got = multi.submit([2, 4], 30).result(timeout=120)
        finally:
            plain.shutdown()
            multi.shutdown()
        assert got == want

    def test_with_prefill_admission(self):
        from smelter_tpu.models import llama_style

        cfg = dict(vocab=60, dim=64, heads=4, kv_heads=2, ffn=96,
                   layers=2)
        w = llama_style.make_weights(max_len=32, **cfg)
        step, _ = llama_style.build_decode_step(w, max_len=32, **cfg)
        pfs = [llama_style.build_prefill(w, prompt_len=4, max_len=32,
                                         **cfg)]
        plain = DecodeServer(step, slots=2)
        multi = DecodeServer(step, slots=2, tick_steps=4,
                             prefill_graphs=pfs)
        try:
            prompts = [[5, 9, 2, 17], [1, 4], [7, 3, 9, 1, 2, 8]]
            want = [plain.submit(p, 6).result(timeout=120)
                    for p in prompts]
            got = [multi.submit(p, 6).result(timeout=120)
                   for p in prompts]
        finally:
            plain.shutdown()
            multi.shutdown()
        assert got == want

    def test_context_model_multi(self):
        step_g, _ = speech_decoder.build_decode_step(
            vocab=50, dim=32, heads=4, layers=1, max_len=12, t_enc=6)
        gen = FusedGenerator(step_g)
        rng = np.random.default_rng(0)
        mems = [rng.standard_normal((6, 32)).astype(np.float32)
                for _ in range(2)]
        srv = DecodeServer(step_g, slots=2, tick_steps=3)
        try:
            futs = [srv.submit([1, 2], 5, context={"memory": m})
                    for m in mems]
            for m, f in zip(mems, futs):
                assert f.result(timeout=120) == gen.generate(
                    [1, 2], 5, context={"memory": m})
        finally:
            srv.shutdown()


class TestSpecBucketLadder:
    """Speculative buckets inside BucketedDecodeServer: a short-cache
    spec bucket + a long-cache plain bucket share one uploaded weight
    set; outputs match the flat servers."""

    def test_mixed_spec_and_plain_buckets(self):
        from smelter_tpu.models import llama_style
        from smelter_tpu.serving.decode_server import (
            BucketedDecodeServer, DecodeServer)

        cfg = dict(vocab=60, dim=64, heads=4, kv_heads=2, ffn=96,
                   layers=2)
        w = llama_style.make_weights(max_len=64, **cfg)
        step16, _ = llama_style.build_decode_step(w, max_len=16, **cfg)
        chunk16, _ = llama_style.build_decode_step(w, max_len=16,
                                                   chunk=3, **cfg)
        draft16, _ = llama_style.build_decode_step(
            w, max_len=16, **dict(cfg, layers=1))
        step64, _ = llama_style.build_decode_step(w, max_len=64, **cfg)

        flat = DecodeServer(step64, slots=4)
        try:
            prompts = [[5, 9, 2], [1] * 30, [7, 3], [4, 4, 4]]
            want = [flat.submit(p, 6).result(timeout=120)
                    for p in prompts]
        finally:
            flat.shutdown()

        srv = BucketedDecodeServer([
            {"step": step16, "chunk": chunk16, "draft": draft16,
             "slots": 2},
            {"step": step64, "slots": 2},
        ])
        try:
            futs = [srv.submit(p, 6) for p in prompts]
            got = [f.result(timeout=180) for f in futs]
            st_ = srv.stats()
            assert st_["buckets"][0]["max_len"] == 16
            assert "accept_rate" in st_["buckets"][0]
            assert srv.cache_bytes() < srv.uniform_cache_bytes()
        finally:
            srv.shutdown()
        assert got == want


class TestMultiRoundSpecTick:
    """SpecDecodeServer(rounds_per_tick=R): R draft-and-verify rounds
    chained on device per dispatch — greedy outputs identical to R=1;
    engages only when every active slot is past its prompt with full
    acceptance headroom (host falls back to single rounds otherwise)."""

    CFG = dict(vocab=60, dim=64, heads=4, kv_heads=2, ffn=96, layers=2)

    def _graphs(self, max_len=64):
        from smelter_tpu.models import llama_style

        w = llama_style.make_weights(max_len=max_len, **self.CFG)
        step, _ = llama_style.build_decode_step(w, max_len=max_len,
                                                **self.CFG)
        chunk, _ = llama_style.build_decode_step(w, max_len=max_len,
                                                 chunk=4, **self.CFG)
        draft, _ = llama_style.build_decode_step(w, max_len=max_len,
                                                 **dict(self.CFG,
                                                        layers=1))
        return step, chunk, draft

    def test_parity_with_single_round(self):
        from smelter_tpu.serving.decode_server import SpecDecodeServer

        step, chunk, draft = self._graphs()
        prompts = [[5, 9, 2, 17], [1, 4], [7, 3, 9, 1, 2, 8, 6]]
        single = SpecDecodeServer(step, chunk, draft, slots=3)
        multi = SpecDecodeServer(step, chunk, draft, slots=3,
                                 rounds_per_tick=3)
        try:
            want = [single.submit(p, 12).result(timeout=180)
                    for p in prompts]
            single_ticks = single.stats()["ticks"]
            futs = [multi.submit(p, 12) for p in prompts]
            got = [f.result(timeout=180) for f in futs]
            # the multi program must actually ENGAGE: chaining R=3
            # rounds per dispatch must need measurably fewer ticks
            # than the single-round server took for the same work
            st_ = multi.stats()
            assert 0 < st_["ticks"] < single_ticks
        finally:
            single.shutdown()
            multi.shutdown()
        assert got == want

    def test_stop_token_and_capacity(self):
        from smelter_tpu.runtime.generate import FusedGenerator
        from smelter_tpu.serving.decode_server import SpecDecodeServer

        step, chunk, draft = self._graphs(max_len=32)
        gen = FusedGenerator(step)
        full = gen.generate([3, 7, 11], 12)
        stop = full[6]
        first = full.index(stop, 3)
        srv = SpecDecodeServer(step, chunk, draft, slots=2,
                               rounds_per_tick=4, stop_tokens=(stop,))
        try:
            out = srv.submit([3, 7, 11], 12).result(timeout=180)
            # near-capacity request: multi must fall back, not corrupt
            long_out = srv.submit([2] * 20, 20).result(timeout=180)
        finally:
            srv.shutdown()
        assert out == full[:first + 1]
        flat = SpecDecodeServer(step, chunk, draft, slots=1)
        try:
            want_long = flat.submit([2] * 20, 20).result(timeout=180)
        finally:
            flat.shutdown()
        assert long_out == want_long
