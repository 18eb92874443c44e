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

    def test_missing_file(self, tmp_path, capsys):
        rc = cli_main([str(tmp_path / "nope.onnx"), "-o", str(tmp_path / "o")])
        assert rc == 2
        assert "not found" in capsys.readouterr().err
