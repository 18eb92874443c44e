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
