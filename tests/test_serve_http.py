"""HTTP front-end tests: real socket round-trips against the threaded server."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import smelter_tpu as st
from smelter_tpu.models import mobilenet_v2
from smelter_tpu.tools.serve_http import ThreadingHTTPServer, make_handler


@pytest.fixture(scope="module")
def http_server():
    g, tm, shape = mobilenet_v2.build(1, 96, width_mult=0.35, num_classes=10)
    srv = st.serve(g, max_batch=4, max_wait_ms=5)
    state = {"servers": {"default": srv}, "default": "default", "verbose": False}
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", shape
    httpd.shutdown()
    srv.shutdown()


class TestHttp:
    def test_healthz(self, http_server):
        base, _ = http_server
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            assert json.loads(r.read())["ok"] is True

    def test_infer_npy(self, http_server):
        base, shape = http_server
        x = np.random.default_rng(0).standard_normal(shape[1:]).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        req = urllib.request.Request(
            base + "/v1/infer", data=buf.getvalue(),
            headers={"Content-Type": "application/npy", "Accept": "application/npy"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = np.load(io.BytesIO(r.read()))
        assert out.shape == (10,)

    def test_infer_json(self, http_server):
        base, shape = http_server
        x = np.zeros(shape[1:], np.float32)
        req = urllib.request.Request(
            base + "/v1/infer",
            data=json.dumps({"inputs": x.tolist()}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())["outputs"]
        assert len(out[0]) == 10

    def test_stats_after_traffic(self, http_server):
        base, _ = http_server
        with urllib.request.urlopen(base + "/v1/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["requests"] >= 2

    def test_bad_payload_400(self, http_server):
        base, _ = http_server
        req = urllib.request.Request(base + "/v1/infer", data=b"not a tensor",
                                     headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400

    def test_404(self, http_server):
        base, _ = http_server
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(base + "/nope", timeout=30)
        assert ei.value.code == 404

    def test_prometheus_metrics(self, http_server):
        base, _ = http_server
        with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
            body = r.read().decode()
        assert 'smelter_requests{model="default"}' in body
        assert "smelter_latency_ms_p50" in body


class TestMultiModelRouting:
    """Image + audio models served from one process: per-model routes work
    and the batching path handles heterogeneous input ranks."""

    @pytest.fixture(scope="class")
    def multi_server(self):
        from smelter_tpu.models import audio_kws

        gi, _, ishape = mobilenet_v2.build(1, 96, width_mult=0.35, num_classes=10)
        ga, _, ashape = audio_kws.build(batch=1, samples=4000, channels=16,
                                        blocks=2)
        srv_img = st.serve(gi, max_batch=4, max_wait_ms=5)
        srv_aud = st.serve(ga, max_batch=4, max_wait_ms=5)
        state = {"servers": {"image": srv_img, "audio": srv_aud},
                 "default": "image", "verbose": False}
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{httpd.server_address[1]}", ishape, ashape
        httpd.shutdown()
        srv_img.shutdown()
        srv_aud.shutdown()

    def test_model_list(self, multi_server):
        base, _, _ = multi_server
        with urllib.request.urlopen(base + "/v1/models", timeout=30) as r:
            assert set(json.loads(r.read())["models"]) == {"image", "audio"}

    def test_audio_route(self, multi_server):
        base, _, ashape = multi_server
        x = (np.random.default_rng(0).standard_normal(ashape[1:]) * 0.1).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        req = urllib.request.Request(
            base + "/v1/models/audio/infer", data=buf.getvalue(),
            headers={"Content-Type": "application/npy", "Accept": "application/npy"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = np.load(io.BytesIO(r.read()))
        assert out.shape == (12,)

    def test_image_route_still_default(self, multi_server):
        base, ishape, _ = multi_server
        x = np.zeros(ishape[1:], np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        req = urllib.request.Request(
            base + "/v1/infer", data=buf.getvalue(),
            headers={"Content-Type": "application/npy", "Accept": "application/npy"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = np.load(io.BytesIO(r.read()))
        assert out.shape == (10,)

    def test_unknown_model_404(self, multi_server):
        base, _, _ = multi_server
        req = urllib.request.Request(base + "/v1/models/nope/infer", data=b"x",
                                     headers={"Content-Type": "application/npy"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 404


class TestGenerateEndpoint:
    """POST /v1/generate over a FusedGenerator decode model."""

    @pytest.fixture(scope="class")
    def gen_server(self):
        from smelter_tpu.models import tiny_gpt
        from smelter_tpu.runtime.generate import FusedGenerator

        gi, _, ishape = mobilenet_v2.build(1, 96, width_mult=0.35, num_classes=10)
        srv = st.serve(gi, max_batch=2, max_wait_ms=5)
        step_g, _ = tiny_gpt.build_decode_step(vocab=50, dim=32, heads=4,
                                               layers=2, max_len=24)
        state = {"servers": {"default": srv}, "default": "default",
                 "generator": FusedGenerator(step_g), "verbose": False}
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{httpd.server_address[1]}"
        httpd.shutdown()
        srv.shutdown()

    def _post(self, base, payload):
        req = urllib.request.Request(
            base + "/v1/generate", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        return urllib.request.urlopen(req, timeout=120)

    def test_generate(self, gen_server):
        with self._post(gen_server, {"prompt": [3, 7, 11], "n_new": 8}) as r:
            toks = json.loads(r.read())["tokens"]
        assert toks[:3] == [3, 7, 11] and len(toks) == 11

    def test_deterministic(self, gen_server):
        out = []
        for _ in range(2):
            with self._post(gen_server, {"prompt": [5], "n_new": 6}) as r:
                out.append(json.loads(r.read())["tokens"])
        assert out[0] == out[1]

    def test_empty_prompt_400(self, gen_server):
        with pytest.raises(urllib.error.HTTPError) as ei:
            self._post(gen_server, {"prompt": [], "n_new": 4})
        assert ei.value.code == 400

    def test_no_generator_404(self, http_server):
        base, _ = http_server  # module fixture has no generator
        req = urllib.request.Request(
            base + "/v1/generate",
            data=json.dumps({"prompt": [1], "n_new": 2}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 404


class TestGenerateWithContext:
    """POST /v1/generate with context arrays (cross-attention decoder)."""

    @pytest.fixture(scope="class")
    def ctx_server(self):
        from smelter_tpu.models import speech_decoder
        from smelter_tpu.runtime.generate import FusedGenerator

        step_g, _ = speech_decoder.build_decode_step(
            vocab=50, dim=32, heads=4, layers=1, max_len=12, t_enc=6)
        state = {"servers": {}, "default": None,
                 "generator": FusedGenerator(step_g), "verbose": False}
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{httpd.server_address[1]}"
        httpd.shutdown()

    def _post(self, base, payload):
        req = urllib.request.Request(
            base + "/v1/generate", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        return urllib.request.urlopen(req, timeout=120)

    def test_generate_with_memory(self, ctx_server):
        import numpy as np

        mem = np.random.default_rng(0).standard_normal((6, 32)).tolist()
        with self._post(ctx_server, {"prompt": [1, 2], "n_new": 5,
                                     "context": {"memory": mem}}) as r:
            toks = json.loads(r.read())["tokens"]
        assert toks[:2] == [1, 2] and len(toks) == 7

    def test_missing_context_400(self, ctx_server):
        with pytest.raises(urllib.error.HTTPError) as ei:
            self._post(ctx_server, {"prompt": [1], "n_new": 2})
        assert ei.value.code == 400
        body = json.loads(ei.value.read())
        assert "memory" in body["error"]


class TestDecodeServerEndpoint:
    """POST /v1/generate backed by the continuous-batching DecodeServer."""

    @pytest.fixture(scope="class")
    def slot_server(self):
        from smelter_tpu.models import tiny_gpt
        from smelter_tpu.runtime.generate import FusedGenerator
        from smelter_tpu.serving.decode_server import DecodeServer

        step_g, _ = tiny_gpt.build_decode_step(vocab=50, dim=32, heads=4,
                                               layers=2, max_len=24)
        state = {"servers": {}, "default": None,
                 "generator": FusedGenerator(step_g),
                 "decode_server": DecodeServer(step_g, slots=2),
                 "verbose": False}
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{httpd.server_address[1]}", state
        httpd.shutdown()
        state["decode_server"].shutdown()

    def test_concurrent_requests(self, slot_server):
        import concurrent.futures

        base, state = slot_server
        prompts = [[3, 7], [5, 9, 1], [2], [8, 8, 8, 8]]

        def post(p):
            req = urllib.request.Request(
                base + "/v1/generate",
                data=json.dumps({"prompt": p, "n_new": 6}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())["tokens"]

        with concurrent.futures.ThreadPoolExecutor(4) as pool:
            got = list(pool.map(post, prompts))
        gen = state["generator"]
        for p, g in zip(prompts, got):
            assert g == gen.generate(p, 6)


class TestUint8Ingest:
    """POST raw HWC uint8 .npy to /v1/infer: native ingest converts to
    normalized f32 CHW before batching."""

    def test_u8_npy_matches_float_path(self, http_server):
        import io

        base, shape = http_server
        rng = np.random.default_rng(0)
        u8 = rng.integers(0, 256, (shape[2], shape[3], shape[1])).astype(np.uint8)
        buf = io.BytesIO()
        np.save(buf, u8)
        req = urllib.request.Request(
            base + "/v1/infer", data=buf.getvalue(),
            headers={"Content-Type": "application/npy"})
        with urllib.request.urlopen(req, timeout=120) as r:
            got = np.asarray(json.loads(r.read())["outputs"][0])
        # float path with the same /255 CHW conversion
        f = np.transpose(u8.astype(np.float32) / 255.0, (2, 0, 1))
        req2 = urllib.request.Request(
            base + "/v1/infer",
            data=json.dumps({"inputs": f.tolist()}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req2, timeout=120) as r:
            want = np.asarray(json.loads(r.read())["outputs"][0])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestSpeculativeEndpoint:
    """POST /v1/generate through a SpeculativeGenerator (--decode-draft/
    --decode-chunk): greedy token-identical to the fused path; sampling
    params deterministic per seed."""

    @pytest.fixture(scope="class")
    def spec_server(self):
        from smelter_tpu.models import llama_style
        from smelter_tpu.runtime.generate import FusedGenerator
        from smelter_tpu.runtime.speculative import SpeculativeGenerator

        cfg = dict(vocab=60, dim=64, heads=4, kv_heads=2, ffn=96, layers=2)
        w = llama_style.make_weights(max_len=24, **cfg)
        step_g, _ = llama_style.build_decode_step(w, max_len=24, **cfg)
        chunk_g, _ = llama_style.build_decode_step(w, max_len=24, chunk=4,
                                                   **cfg)
        draft_g, _ = llama_style.build_decode_step(
            max_len=24, seed=9, vocab=60, dim=32, heads=2, kv_heads=1,
            ffn=64, layers=1)
        state = {"servers": {}, "default": None,
                 "generator": FusedGenerator(step_g),
                 "spec_generator": SpeculativeGenerator(step_g, chunk_g,
                                                        draft_g),
                 "verbose": False}
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{httpd.server_address[1]}", state
        httpd.shutdown()

    def _post(self, base, payload):
        req = urllib.request.Request(
            base + "/v1/generate", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())["tokens"]

    def test_greedy_matches_fused(self, spec_server):
        base, state = spec_server
        p = [5, 9, 2]
        got = self._post(base, {"prompt": p, "n_new": 8})
        assert got == state["generator"].generate(p, 8)

    def test_sampled_deterministic(self, spec_server):
        base, _ = spec_server
        body = {"prompt": [5, 9, 2], "n_new": 8, "temperature": 0.8,
                "top_k": 10, "seed": 3}
        assert self._post(base, body) == self._post(base, body)


class TestBucketedDecodeEndpoint:
    """POST /v1/generate backed by the KV bucket ladder (the serve_http
    --decode-bucket surface): mixed-length prompts route to different
    buckets and still produce DecodeServer-identical tokens."""

    @pytest.fixture(scope="class")
    def bucket_server(self):
        from smelter_tpu.models import llama_style
        from smelter_tpu.runtime.generate import FusedGenerator
        from smelter_tpu.serving.decode_server import BucketedDecodeServer

        cfg = dict(vocab=50, dim=32, heads=4, kv_heads=2, ffn=64,
                   layers=2)
        w = llama_style.make_weights(max_len=24, **cfg)
        big, _ = llama_style.build_decode_step(w, max_len=24, **cfg)
        small, _ = llama_style.build_decode_step(w, max_len=8, **cfg)
        srv = BucketedDecodeServer([
            {"step": small, "slots": 2},
            {"step": big, "slots": 2},
        ])
        state = {"servers": {}, "default": None,
                 "generator": FusedGenerator(big),
                 "decode_server": srv, "verbose": False}
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{httpd.server_address[1]}", state
        httpd.shutdown()
        srv.shutdown()

    def test_mixed_lengths_route_and_match(self, bucket_server):
        import concurrent.futures

        base, state = bucket_server
        prompts = [[3, 7], [5, 9, 1], [2] * 12, [8] * 3]

        def post(p):
            req = urllib.request.Request(
                base + "/v1/generate",
                data=json.dumps({"prompt": p, "n_new": 5}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())["tokens"]

        with concurrent.futures.ThreadPoolExecutor(4) as pool:
            got = list(pool.map(post, prompts))
        gen = state["generator"]
        for p, g in zip(prompts, got):
            assert g == gen.generate(p, 5)
        cb = state["decode_server"].cache_bytes()
        assert cb < state["decode_server"].uniform_cache_bytes()


class TestPagedHTTP:
    """--decode-paged surface: a batched paged step graph round-tripped
    through save_model/load_model (the custom PagedCacheUpdate/
    PagedDecodeAttention nodes must survive serialization), served by
    PagedDecodeServer behind /v1/generate."""

    CFG = dict(vocab=60, dim=32, heads=4, kv_heads=2, ffn=64, layers=2)

    @pytest.fixture(scope="class")
    def paged_server(self, tmp_path_factory):
        from smelter_tpu.ir.importer import load_model, save_model
        from smelter_tpu.models import llama_style
        from smelter_tpu.serving.decode_server import DecodeServer
        from smelter_tpu.serving.paged_server import PagedDecodeServer

        w = llama_style.make_weights(max_len=24, **self.CFG)
        gp, _ = llama_style.build_decode_step_paged(
            weights=w, **self.CFG, slots=2, page_size=8, n_pages=8,
            npg=3)
        path = tmp_path_factory.mktemp("paged") / "paged_step.onnx"
        save_model(gp, path)
        srv = PagedDecodeServer(load_model(path))
        gd, _ = llama_style.build_decode_step(weights=w, **self.CFG,
                                              max_len=24)
        ref = DecodeServer(gd, slots=2)
        state = {"servers": {}, "default": None,
                 "decode_server": srv, "verbose": False}
        httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                    make_handler(state))
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{httpd.server_address[1]}", ref
        httpd.shutdown()
        srv.shutdown()
        ref.shutdown()

    def _post(self, base, payload):
        req = urllib.request.Request(
            base + "/v1/generate", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            return json.loads(r.read())["tokens"]

    def test_greedy_matches_decode_server(self, paged_server):
        base, ref = paged_server
        for p, n in (([5, 9, 2], 8), ([7], 5)):
            got = self._post(base, {"prompt": p, "n_new": n})
            assert got == ref.submit(p, n).result(timeout=300)

    def test_sampling_params_rejected(self, paged_server):
        base, _ = paged_server
        req = urllib.request.Request(
            base + "/v1/generate",
            data=json.dumps({"prompt": [5], "n_new": 4,
                             "temperature": 0.7}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=120)
        assert ei.value.code == 400


class TestSpecPagedHTTP:
    """--decode-paged --decode-draft: speculative paged serving behind
    /v1/generate (paged chunk graph + dense draft, both loaded from
    disk)."""

    CFG = dict(vocab=60, dim=32, heads=4, kv_heads=2, ffn=64, layers=2)

    @pytest.fixture(scope="class")
    def spec_paged(self, tmp_path_factory):
        from smelter_tpu.ir.importer import load_model, save_model
        from smelter_tpu.models import llama_style
        from smelter_tpu.serving.decode_server import DecodeServer
        from smelter_tpu.serving.paged_server import SpecPagedDecodeServer

        w = llama_style.make_weights(max_len=24, **self.CFG)
        chunk, _ = llama_style.build_decode_step_paged(
            weights=w, **self.CFG, slots=2, page_size=8, n_pages=8,
            npg=3, chunk=3)
        draft, _ = llama_style.build_decode_step(weights=w, **self.CFG,
                                                 max_len=24)
        d = tmp_path_factory.mktemp("spec_paged")
        save_model(chunk, d / "chunk.onnx")
        save_model(draft, d / "draft.onnx")
        srv = SpecPagedDecodeServer(load_model(d / "chunk.onnx"),
                                    load_model(d / "draft.onnx"))
        gd, _ = llama_style.build_decode_step(weights=w, **self.CFG,
                                              max_len=24)
        ref = DecodeServer(gd, slots=2)
        state = {"servers": {}, "default": None,
                 "decode_server": srv, "verbose": False}
        httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                    make_handler(state))
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{httpd.server_address[1]}", ref, srv
        httpd.shutdown()
        srv.shutdown()
        ref.shutdown()

    def test_greedy_parity_and_acceptance(self, spec_paged):
        base, ref, srv = spec_paged
        for p, n in (([5, 9, 2], 8), ([7, 3], 6)):
            req = urllib.request.Request(
                base + "/v1/generate",
                data=json.dumps({"prompt": p, "n_new": n}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                got = json.loads(r.read())["tokens"]
            assert got == ref.submit(p, n).result(timeout=300)
        st_ = srv.stats()
        assert st_["gamma"] == 2 and st_["ticks"] >= 1
