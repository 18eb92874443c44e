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
