"""Accuracy-harness tests (tools/accuracy.py): the literal top-1 delta /
PSNR gates of BASELINE.md:9, runnable on zoo fixtures now and on real
weights when they exist (VERDICT r1 item 7)."""

import numpy as np
import pytest

import smelter_tpu as st
from smelter_tpu.tools import accuracy
from smelter_tpu.tools.accuracy import compare_psnr, compare_top1, psnr


@pytest.fixture(scope="module")
def small_model(tmp_path_factory):
    from smelter_tpu.models import mobilenet_v2

    g, _tm, shape = mobilenet_v2.build(8, 96, width_mult=0.35, num_classes=10)
    path = tmp_path_factory.mktemp("acc") / "mnv2.onnx"
    st.save_model(g, path)
    return str(path), shape


class TestPsnr:
    def test_identical_is_inf(self):
        a = np.random.default_rng(0).standard_normal((4, 4)).astype(np.float32)
        assert psnr(a, a) == float("inf")

    def test_known_noise(self):
        a = np.zeros((100, 100))
        b = a + 0.01
        # peak defaults to ref range (0) -> 1.0; mse = 1e-4 -> 40 dB
        assert abs(psnr(a, b) - 40.0) < 1e-6


class TestLibrary:
    def test_compare_top1_gate(self, small_model):
        path, shape = small_model
        g = st.load_model(path)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((16,) + shape[1:]).astype(np.float32)
        ref = st.compile(st.import_model(st.export_model(g)),
                         st.Config(batch_size=8))
        y = np.concatenate([
            np.asarray(ref(x[i:i + 8])[0]).argmax(-1) for i in (0, 8)])
        r = compare_top1(g, x, y, quant="int8", gate_pct=50.0, batch=8,
                         config=st.Config(batch_size=8))
        assert r["fp32"] == 1.0  # labels are the fp32 model's own argmax
        assert 0.0 <= r["quant"] <= 1.0
        assert r["passed"]  # generous gate
        r2 = compare_top1(g, x, y, quant="int8", gate_pct=-100.0, batch=8,
                          config=st.Config(batch_size=8))
        assert not r2["passed"]  # impossible gate fails

    def test_compare_psnr(self, small_model):
        path, shape = small_model
        g = st.load_model(path)
        x = np.random.default_rng(1).standard_normal(
            (8,) + shape[1:]).astype(np.float32)
        r = compare_psnr(g, x, quant="fp16", gate_db=20.0, batch=8,
                         config=st.Config(batch_size=8))
        assert r["psnr_db_worst"] > 20.0 and r["passed"]


class TestCli:
    def test_top1_synthetic_pass(self, small_model):
        path, _ = small_model
        rc = accuracy.main([path, "--synthetic", "16", "--batch", "8",
                            "--quant", "int8", "--gate", "50"])
        assert rc == 0

    def test_psnr_mode(self, small_model):
        path, _ = small_model
        rc = accuracy.main([path, "--mode", "psnr", "--synthetic", "8",
                            "--batch", "8", "--quant", "fp16", "--gate", "20"])
        assert rc == 0

    def test_usage_error(self, small_model):
        path, _ = small_model
        assert accuracy.main([path]) == 2  # no --eval / --synthetic


class TestOnnx2TpuVerify:
    def test_verify_gate_pass(self, small_model, tmp_path):
        from smelter_tpu.tools import onnx2tpu

        path, _ = small_model
        out = tmp_path / "out.onnx"
        rc = onnx2tpu.main([path, "-o", str(out), "--quant", "int8",
                            "--verify", "8", "--verify-gate", "50"])
        assert rc == 0 and out.exists()

    def test_verify_gate_fail_blocks_artifact(self, small_model, tmp_path):
        from smelter_tpu.tools import onnx2tpu

        path, _ = small_model
        out = tmp_path / "out.onnx"
        rc = onnx2tpu.main([path, "-o", str(out), "--quant", "int8",
                            "--verify", "8", "--verify-gate", "-100"])
        assert rc == 1 and not out.exists()
