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
