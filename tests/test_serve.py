"""Continuous-batching server tests: correctness under concurrency,
bucketing/padding, metrics, error propagation."""

import threading
import numpy as np
import pytest
import torch

import smelter_tpu as st
from smelter_tpu.models import resnet50
from smelter_tpu.serving import InferenceServer


@pytest.fixture(scope="module")
def small_model():
    g, tm, shape = resnet50.build(1, 32, layers=(1, 1, 1, 1), width=16,
                                  num_classes=10)
    return g, tm, shape


class TestServer:
    def test_single_request(self, small_model):
        g, tm, shape = small_model
        srv = InferenceServer(g, max_batch=4)
        try:
            x = np.random.default_rng(0).standard_normal(shape[1:]).astype(np.float32)
            out = srv.infer(x)[0]
            with torch.no_grad():
                want = tm(torch.from_numpy(x[None])).numpy()[0]
            np.testing.assert_allclose(out, want, rtol=1e-3, atol=1e-4)
        finally:
            srv.shutdown()

    def test_concurrent_requests_batched(self, small_model):
        g, tm, shape = small_model
        srv = InferenceServer(g, max_batch=8, max_wait_ms=50)
        try:
            rng = np.random.default_rng(1)
            xs = [rng.standard_normal(shape[1:]).astype(np.float32) for _ in range(16)]
            futures = [srv.submit(x) for x in xs]
            outs = [f.result(timeout=120) for f in futures]
            with torch.no_grad():
                want = tm(torch.from_numpy(np.stack(xs))).numpy()
            got = np.stack([o[0] for o in outs])
            np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
            s = srv.stats()
            assert s["requests"] == 16
            assert s["batches"] < 16  # actually batched
            assert s["latency_ms_p50"] > 0
        finally:
            srv.shutdown()

    def test_bucket_padding(self, small_model):
        g, tm, shape = small_model
        srv = InferenceServer(g, max_batch=8, max_wait_ms=200, buckets=(4, 8))
        try:
            rng = np.random.default_rng(2)
            xs = [rng.standard_normal(shape[1:]).astype(np.float32) for _ in range(3)]
            futures = [srv.submit(x) for x in xs]
            outs = [f.result(timeout=120) for f in futures]
            with torch.no_grad():
                want = tm(torch.from_numpy(np.stack(xs))).numpy()
            got = np.stack([o[0] for o in outs])
            np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
            assert srv.stats()["occupancy"] == 3 / 4  # 3 real in a 4-bucket
        finally:
            srv.shutdown()

    def test_submit_after_shutdown(self, small_model):
        g, _, shape = small_model
        srv = InferenceServer(g, max_batch=2)
        srv.shutdown()
        with pytest.raises(RuntimeError):
            srv.submit(np.zeros(shape[1:], np.float32))

    def test_bad_input_fails_future_not_server(self, small_model):
        g, tm, shape = small_model
        srv = InferenceServer(g, max_batch=2, max_wait_ms=1)
        try:
            bad = np.zeros((5, 5), np.float32)  # wrong rank
            f = srv.submit(bad)
            with pytest.raises(Exception):
                f.result(timeout=120)
            # server still alive and serving
            x = np.random.default_rng(3).standard_normal(shape[1:]).astype(np.float32)
            out = srv.infer(x)[0]
            assert out.shape == (10,)
            assert srv.stats()["errors"] == 1
        finally:
            srv.shutdown()


class TestSharedParams:
    def test_buckets_share_device_weights(self, small_model):
        g, tm, shape = small_model
        srv = InferenceServer(g, max_batch=4, buckets=(1, 2, 4), eager_compile=True)
        try:
            # eager compile runs in a background warmer thread now
            import time as _time

            deadline = _time.monotonic() + 60
            while _time.monotonic() < deadline:
                with srv._exec_lock:
                    if len(srv._executors) == 3:
                        break
                _time.sleep(0.05)
            param_sets = [p for (_, _, p) in srv._executors.values()]
            assert len(param_sets) == 3
            first = param_sets[0]
            for other in param_sets[1:]:
                assert other is first  # same dict, same device buffers
            # still correct
            x = np.random.default_rng(5).standard_normal(shape[1:]).astype(np.float32)
            out = srv.infer(x)[0]
            with torch.no_grad():
                want = tm(torch.from_numpy(x[None])).numpy()[0]
            np.testing.assert_allclose(out, want, rtol=1e-3, atol=1e-4)
        finally:
            srv.shutdown()


class TestShardedServing:
    def test_serving_over_mesh(self, small_model):
        """Continuous batching with tensor+data-parallel sharded weights on
        the virtual 8-device mesh — the multi-host serving configuration
        (BASELINE.json:5) in CI form."""
        import jax
        from smelter_tpu.parallel import MeshPlan

        g, tm, shape = small_model
        plan = MeshPlan.for_devices(8, tp=2)
        srv = InferenceServer(g, st.Config(mesh=plan), max_batch=8,
                              buckets=(8,), max_wait_ms=100)
        try:
            rng = np.random.default_rng(7)
            xs = [rng.standard_normal(shape[1:]).astype(np.float32)
                  for _ in range(8)]
            futures = [srv.submit(x) for x in xs]
            outs = [f.result(timeout=180) for f in futures]
            with torch.no_grad():
                want = tm(torch.from_numpy(np.stack(xs))).numpy()
            got = np.stack([o[0] for o in outs])
            np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
            # weights really sharded: at least one param not fully replicated
            params = srv._shared_params
            assert any(not p.sharding.is_fully_replicated for p in params.values())
        finally:
            srv.shutdown()


class TestBackpressure:
    def test_queue_overload_sheds(self, small_model):
        g, _, shape = small_model
        srv = InferenceServer(g, max_batch=2, max_queue=4, max_wait_ms=1)
        try:
            x = np.zeros(shape[1:], np.float32)
            subs = []
            with pytest.raises(RuntimeError, match="overloaded"):
                for _ in range(500):
                    subs.append(srv.submit(x))
            # server recovers: drain and serve again
            for f in subs:
                f.result(timeout=120)
            assert srv.infer(x)[0].shape == (10,)
        finally:
            srv.shutdown()


class TestDeadlines:
    def test_expired_requests_dropped(self, small_model):
        import time as _time

        g, tm, shape = small_model
        srv = InferenceServer(g, max_batch=2, max_wait_ms=1)
        try:
            x = np.random.default_rng(0).standard_normal(shape[1:]).astype(np.float32)
            srv.infer(x)  # warm (compile) so timing below is honest
            # a request with an already-expired deadline
            f = srv.submit(x, timeout_ms=0.0)
            _time.sleep(0.05)
            with pytest.raises(TimeoutError):
                f.result(timeout=60)
            # normal requests still served
            assert srv.infer(x)[0].shape == (10,)
        finally:
            srv.shutdown()


class TestPipelinedDrain:
    def test_inflight_resolved_at_shutdown(self, small_model):
        g, _, shape = small_model
        srv = InferenceServer(g, max_batch=2, max_wait_ms=1)
        x = np.zeros(shape[1:], np.float32)
        srv.infer(x)  # warm
        f = srv.submit(x)
        srv.shutdown()
        assert f.result(timeout=30)[0].shape == (10,)


class TestServingHardening:
    def test_eager_compile_background_default(self, small_model):
        import time as _time

        g, _, shape = small_model
        srv = InferenceServer(g, max_batch=4, buckets=(1, 2, 4))
        try:
            deadline = _time.monotonic() + 60
            while _time.monotonic() < deadline:
                with srv._exec_lock:
                    if set(srv._executors) == {1, 2, 4}:
                        break
                _time.sleep(0.05)
            assert set(srv._executors) == {1, 2, 4}, "warmer did not compile"
            x = np.zeros(shape[1:], np.float32)
            assert srv.infer(x)[0].shape == (10,)
        finally:
            srv.shutdown()

    def test_post_dispatch_deadline_accounted(self, small_model):
        import time as _time

        g, _, shape = small_model
        srv = InferenceServer(g, max_batch=2, max_wait_ms=1,
                              eager_compile=False)
        try:
            x = np.zeros(shape[1:], np.float32)
            srv.infer(x)  # warm
            from smelter_tpu.serving.server import _Request

            req = _Request((x,), timeout_ms=0.5)
            _time.sleep(0.01)  # deadline passes "during the batch"
            outs = [np.zeros((1, 10), np.float32)]
            srv._resolve([req], 1, outs)
            with pytest.raises(TimeoutError):
                req.future.result(timeout=1)
            assert srv.stats()["deadline_misses"] == 1
        finally:
            srv.shutdown()

    def test_hosthealth_reinit_cycle(self, small_model):
        import time as _time

        from smelter_tpu.parallel.multihost import HostHealth

        g, _, shape = small_model
        h = HostHealth(timeout_s=0.05)
        calls = []
        srv = InferenceServer(
            g, max_batch=2, buckets=(1,), heartbeat_interval_s=0.02,
            health=h, host_id="me",
            on_membership_change=lambda lost, alive: calls.append((lost, alive)))
        try:
            h.heartbeat("remote-1")  # a peer that then goes silent
            deadline = _time.monotonic() + 30
            while not calls and _time.monotonic() < deadline:
                _time.sleep(0.02)
            assert calls and calls[0][0] == ["remote-1"]
            assert "me" in calls[0][1] and "remote-1" not in calls[0][1]
            assert srv.stats()["reinits"] >= 1
            # serving still works after the re-init cycle
            x = np.zeros(shape[1:], np.float32)
            assert srv.infer(x)[0].shape == (10,)
        finally:
            srv.shutdown()


class TestESRGANServing:
    """BASELINE config 4: large-activation conv graphs under continuous
    batching — ESRGAN through the InferenceServer, parity with the torch
    reference per request."""

    def test_esrgan_continuous_batching(self):
        from smelter_tpu.models import esrgan

        g, tm, shape = esrgan.build(1, 16, nf=8, nb=1, scale=4)
        srv = InferenceServer(g, max_batch=4, max_wait_ms=5)
        try:
            rng = np.random.default_rng(0)
            imgs = [rng.standard_normal(shape[1:]).astype(np.float32)
                    for _ in range(6)]
            futs = [srv.submit(im) for im in imgs]
            outs = [f.result(timeout=120) for f in futs]
            with torch.no_grad():
                for im, out in zip(imgs, outs):
                    want = tm(torch.from_numpy(im[None])).numpy()[0]
                    np.testing.assert_allclose(out[0], want, rtol=1e-3,
                                               atol=1e-3)
            s = srv.stats()
            assert s["requests"] >= 6
        finally:
            srv.shutdown()
