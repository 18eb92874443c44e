"""Cost model / roofline tests."""

import numpy as np

import smelter_tpu as st
from smelter_tpu.models import resnet50
from smelter_tpu.runtime.profiler import TPU_V5E, model_cost, op_cost_table, roofline


class TestCostModel:
    def test_resnet_flops_scale(self):
        g, _, shape = resnet50.build(1, 64, layers=(1, 1, 1, 1), width=16,
                                     num_classes=10)
        st.Executor(g).infer_value_types()
        cost = model_cost(g)
        # sanity: a conv net is > 1 MFLOP even tiny, < 1 TFLOP
        assert 1e6 < cost["flops"] < 1e12
        table = op_cost_table(g)
        convs = [c for c in table if c.op_type == "Conv"]
        assert convs and all(c.flops > 0 for c in convs)
        # conv arithmetic intensity should beat elementwise ops'
        relus = [c for c in table if c.op_type == "Relu"]
        assert min(c.arithmetic_intensity for c in convs) > max(
            c.arithmetic_intensity for c in relus)

    def test_roofline_bounds(self):
        r = roofline(flops=197e12, bytes_=1.0, chip=TPU_V5E)  # pure compute
        assert r["bound"] == "compute" and abs(r["t_compute_s"] - 1.0) < 1e-6
        r = roofline(flops=1.0, bytes_=819e9, chip=TPU_V5E)  # pure memory
        assert r["bound"] == "memory" and abs(r["t_memory_s"] - 1.0) < 1e-6


class TestTrace:
    def test_trace_context(self, tmp_path):
        import jax.numpy as jnp

        from smelter_tpu.runtime.profiler import trace

        with trace(str(tmp_path / "tr")) as logdir:
            jnp.square(jnp.arange(16.0)).block_until_ready()
        import os
        assert os.path.isdir(logdir) and os.listdir(logdir)


def test_depthwise_conv_priced_on_vpu():
    """Depthwise-conv flops are VPU work (128x128 MXU cannot contract
    1-channel groups): op_cost_table marks them vpu_flops and the
    roofline bound prices them at flops_vpu (r4)."""
    import numpy as np

    from smelter_tpu.ir.build import GraphBuilder
    from smelter_tpu.runtime.executor import Executor
    from smelter_tpu.runtime.profiler import op_cost_table
    from smelter_tpu.tools.roofline import model_roofline

    b = GraphBuilder("dw", opset=13)
    x = b.input("x", (1, 32, 16, 16))
    w_dw = b.init(np.ones((32, 1, 3, 3), np.float32))
    w_px = b.init(np.ones((32, 32, 1, 1), np.float32))
    h = b.node("Conv", [x, w_dw], group=32, pads=[1, 1, 1, 1],
               kernel_shape=[3, 3])
    y = b.node("Conv", [h, w_px], kernel_shape=[1, 1])
    b.output(y, (1, 32, 16, 16))
    g = b.graph
    Executor(g).infer_value_types()
    table = {c.name or c.op_type + str(i): c
             for i, c in enumerate(op_cost_table(g))}
    convs = [c for c in table.values() if c.op_type == "Conv"]
    dw = [c for c in convs if c.vpu_flops > 0]
    px = [c for c in convs if c.vpu_flops == 0]
    assert len(dw) == 1 and len(px) == 1
    assert dw[0].vpu_flops == dw[0].flops  # all of it is VPU work
    rl = model_roofline(g)
    assert rl["t_vpu_s"] > 0
    assert rl["sol_s"] >= rl["t_vpu_s"]


class TestRequiredTrafficBound:
    """r5 roofline: pool/relayout interior I/O is required HBM traffic
    (the SegNet 5.8% row was measured against a bound that priced the
    pool/unpool/D2S pipeline at zero); dense-conv I/O is deliberately
    NOT counted (falsified by MobileNetV2's measured 43.7k img/s)."""

    def _bound(self, with_pool):
        import numpy as np

        from smelter_tpu.ir.build import GraphBuilder
        from smelter_tpu.tools.roofline import model_roofline

        rng = np.random.default_rng(0)
        b = GraphBuilder("m", opset=17)
        x = b.input("x", (2, 8, 32, 32))
        w = b.init(rng.standard_normal((8, 8, 3, 3)).astype(np.float32))
        y = b.node("Conv", [x, w], pads=[1, 1, 1, 1])
        if with_pool:
            y = b.node("MaxPool", [y], kernel_shape=[2, 2],
                       strides=[2, 2])
            y = b.node("Conv", [y, b.init(
                rng.standard_normal((8, 8, 3, 3)).astype(np.float32))],
                pads=[1, 1, 1, 1])
        b.output(y, None)
        return model_roofline(b.graph)

    def test_pool_io_counts(self):
        plain = self._bound(False)
        pooled = self._bound(True)
        # the pool's in+out edges add required HBM time
        assert pooled["t_hbm_s"] > plain["t_hbm_s"]

    def test_conv_io_not_counted(self):
        # a conv-only graph's t_hbm is io+weights only: interior conv
        # edges are excluded (the falsified all-conv-I/O bound)
        import numpy as np

        from smelter_tpu.ir.build import GraphBuilder
        from smelter_tpu.tools.roofline import model_roofline

        rng = np.random.default_rng(0)
        b = GraphBuilder("m", opset=17)
        x = b.input("x", (2, 8, 16, 16))
        y = x
        for _ in range(3):
            y = b.node("Conv", [y, b.init(
                rng.standard_normal((8, 8, 3, 3)).astype(np.float32))],
                pads=[1, 1, 1, 1])
        b.output(y, None)
        import pytest

        rl = model_roofline(b.graph)
        io = (2 * 8 * 16 * 16 * 2) * 2          # in + out, bf16
        w = 3 * 8 * 8 * 3 * 3 * 4               # f32 weights
        assert rl["t_hbm_s"] * 819e9 == pytest.approx(io + w, rel=0.01)
