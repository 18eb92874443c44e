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


class TestRealWeightsPath:
    """The path pretrained checkpoints take through the gate (VERDICT r4
    missing #1): a torchvision-style state dict (.npz or .pt) loads into
    the zoo torch module and the re-exported graph computes with THOSE
    weights — verified by matching the donor module's torch outputs."""

    def _donor_and_ckpt(self, tmp_path, fmt, **bkw):
        import torch

        from smelter_tpu.models import mobilenet_v2

        _g, donor, shape = mobilenet_v2.build(4, 64, seed=123, **bkw)
        sd = donor.state_dict()
        if fmt == "npz":
            path = tmp_path / "w.npz"
            np.savez(path, **{k: v.numpy() for k, v in sd.items()})
        else:
            path = tmp_path / "w.pt"
            torch.save({"state_dict": {"module." + k: v
                                       for k, v in sd.items()}}, path)
        return donor, shape, str(path)

    @pytest.mark.parametrize("fmt", ["npz", "pt"])
    def test_reexport_matches_donor(self, tmp_path, fmt):
        import torch

        from smelter_tpu.frontend.weights import reexport_with_weights
        from smelter_tpu.models import mobilenet_v2

        donor, shape, path = self._donor_and_ckpt(
            tmp_path, fmt, width_mult=0.35, num_classes=10)
        g, _tm, _shape = reexport_with_weights(
            mobilenet_v2.build, path, batch=4, image_size=64,
            width_mult=0.35, num_classes=10)  # fresh random init inside
        x = np.random.default_rng(0).standard_normal(shape) \
            .astype(np.float32)
        import smelter_tpu as st

        out = np.asarray(st.CompiledModel(g)(x)[0])
        with torch.no_grad():
            want = donor(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(out, want, atol=1e-3, rtol=1e-3)

    def test_cli_gate_with_weights(self, tmp_path):
        from smelter_tpu.tools.accuracy import main

        _donor, _shape, path = self._donor_and_ckpt(tmp_path, "npz")
        rc = main(["zoo:mobilenet_v2", "--weights", path, "--synthetic",
                   "64", "--batch", "4", "--image-size", "64",
                   "--quant", "int8", "--gate", "5"])
        assert rc == 0
