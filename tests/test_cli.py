"""onnx2tpu CLI tests (in-process main())."""

import numpy as np
import pytest

import smelter_tpu as st
from smelter_tpu.ir.graph import TensorType, ValueInfo
from smelter_tpu.tools.onnx2tpu import main as cli_main
from smelter_tpu.utils import dtypes as dt


class TestCli:
    def test_dim_override(self, tmp_path, rng):
        b = st.GraphBuilder("dyn", opset=13)
        b.graph.inputs.append(ValueInfo("x", TensorType(dt.FLOAT, ("batch", 4))))
        y = b.node("Relu", ["x"])
        g = b.finish([y])
        p_in = tmp_path / "dyn.onnx"
        p_out = tmp_path / "dyn.tpu.onnx"
        st.save_model(g, p_in)
        rc = cli_main([str(p_in), "-o", str(p_out), "--dim", "batch=3"])
        assert rc == 0
        g2 = st.load_model(p_out)
        assert g2.inputs[0].type.shape == (3, 4)
        out = st.CompiledModel(g2)(np.ones((3, 4), np.float32))[0]
        assert out.shape == (3, 4)

    def test_artifact_output(self, tmp_path, rng):
        from smelter_tpu.runtime.artifact import load_artifact

        b = st.GraphBuilder("art", opset=13)
        b.graph.inputs.append(ValueInfo("x", TensorType(dt.FLOAT, ("batch", 4))))
        w = b.init(rng.standard_normal((4, 4)).astype(np.float32), "w")
        y = b.node("MatMul", ["x", w])
        g = b.finish([y])
        p_in = tmp_path / "art.onnx"
        st.save_model(g, p_in)
        out_dir = tmp_path / "artifact"
        rc = cli_main([str(p_in), "-o", str(out_dir), "--artifact",
                       "--batch", "2"])
        assert rc == 0
        assert (out_dir / "model.onnx").exists()
        assert (out_dir / "meta.json").exists()
        m = load_artifact(out_dir)
        out = m(np.ones((2, 4), np.float32))[0]
        assert out.shape == (2, 4)

    def test_missing_file(self, tmp_path, capsys):
        rc = cli_main([str(tmp_path / "nope.onnx"), "-o", str(tmp_path / "o")])
        assert rc == 2
        assert "not found" in capsys.readouterr().err


class TestInspect:
    def test_inspect_summary(self, tmp_path, capsys):
        from smelter_tpu.models import mobilenet_v2
        from smelter_tpu.tools.inspect import main as inspect_main

        g, _, _ = mobilenet_v2.build(1, 96, width_mult=0.35, num_classes=10)
        p = tmp_path / "m.onnx"
        st.save_model(g, p)
        rc = inspect_main([str(p), "--top", "3", "--dot", str(tmp_path / "g.dot")])
        assert rc == 0
        out = capsys.readouterr().out
        assert "roofline" in out and "GFLOP" in out
        assert (tmp_path / "g.dot").read_text().startswith("digraph")

    def test_inspect_missing(self, tmp_path, capsys):
        from smelter_tpu.tools.inspect import main as inspect_main

        assert inspect_main([str(tmp_path / "no.onnx")]) == 2
