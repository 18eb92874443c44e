"""Sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4c): sharded
vs single-device parity, scaling harness, host health."""

import numpy as np
import pytest
import jax

import smelter_tpu as st
from smelter_tpu.models import resnet50, vit
from smelter_tpu.parallel import MeshPlan, param_shardings, shard_params
from smelter_tpu.parallel.multihost import HostHealth


@pytest.fixture(scope="module")
def eight_devices():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return jax.devices()


class TestSharding:
    def test_sharded_matches_single_device(self, eight_devices):
        g, tm, shape = resnet50.build(8, 32, layers=(1, 1, 1, 1), width=16,
                                      num_classes=10)
        ex = st.Executor(g)
        x = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
        want = st.CompiledModel(g)(x)[0]

        plan = MeshPlan.for_devices(8)
        with plan.mesh:
            params = shard_params(ex, plan)
            fn = jax.jit(ex.build_fn(),
                         in_shardings=(param_shardings(ex, plan), plan.batch_sharding()))
            got = np.asarray(fn(params, x)[0])
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_tp_actually_shards_weights(self, eight_devices):
        g, _, _ = resnet50.build(8, 32, layers=(1, 1, 1, 1), width=16,
                                 num_classes=16)
        ex = st.Executor(g)
        plan = MeshPlan.for_devices(8, tp=4)
        shardings = param_shardings(ex, plan)
        sharded = [n for n, s in shardings.items() if not s.is_fully_replicated]
        assert len(sharded) >= 10, f"only {len(sharded)} sharded params"

    def test_vit_tp_parity(self, eight_devices):
        g, tm, shape = vit.build(4, 32, patch=8, dim=128, depth=2, heads=4,
                                 num_classes=16)
        ex = st.Executor(g)
        x = np.random.default_rng(1).standard_normal(shape).astype(np.float32)
        want = st.CompiledModel(g)(x)[0]
        plan = MeshPlan.for_devices(8, tp=2)
        with plan.mesh:
            params = shard_params(ex, plan)
            fn = jax.jit(ex.build_fn(),
                         in_shardings=(param_shardings(ex, plan), plan.batch_sharding()))
            got = np.asarray(fn(params, x)[0])
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_mesh_shapes(self, eight_devices):
        assert MeshPlan.for_devices(8, tp=4).mesh.shape == {"dp": 2, "tp": 4}
        assert MeshPlan.for_devices(4, tp=1).mesh.shape == {"dp": 4, "tp": 1}

    def test_dryrun_entry(self, eight_devices):
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)


class TestHostHealth:
    def test_heartbeat_and_sweep(self):
        hh = HostHealth(timeout_s=5.0)
        hh.heartbeat("a", t=0.0)
        hh.heartbeat("b", t=0.0)
        assert hh.sweep(now=1.0) == []
        hh.heartbeat("a", t=4.0)
        assert hh.sweep(now=6.0) == ["b"]
        assert hh.healthy_hosts() == ["a"]
        assert hh.should_reinit("a")
        hh.heartbeat("b", t=7.0)
        assert hh.healthy_hosts() == ["a", "b"]


class TestMultihostHelpers:
    def test_global_mesh_single_process(self, eight_devices):
        from smelter_tpu.parallel import global_mesh

        plan = global_mesh(tp=2)
        assert plan.tp_size == 2
        assert plan.dp_size * plan.tp_size == len(jax.devices())

    def test_process_local_batch_single(self):
        from smelter_tpu.parallel import process_local_batch

        x = np.arange(8)
        np.testing.assert_array_equal(process_local_batch(x), x)

    def test_init_distributed_noop_single(self):
        from smelter_tpu.parallel import init_distributed

        assert init_distributed(num_processes=1) is False


class TestPipeline:
    def test_split_and_parity(self, eight_devices):
        from smelter_tpu.parallel import PipelinedModel, split_graph

        g, tm, shape = resnet50.build(2, 32, layers=(1, 1, 1, 1), width=16,
                                      num_classes=10)
        x = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
        want = st.CompiledModel(g)(x)[0]

        stages = split_graph(g, 4)
        assert len(stages) == 4
        assert sum(len(s.nodes) for s in stages) == len(g.nodes)

        pm = PipelinedModel(g, 4)
        got = pm(x)[0]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_stream_microbatches(self, eight_devices):
        from smelter_tpu.parallel import PipelinedModel

        g, tm, shape = resnet50.build(1, 32, layers=(1, 1, 1, 1), width=16,
                                      num_classes=10)
        pm = PipelinedModel(g, 2)
        rng = np.random.default_rng(1)
        mbs = [rng.standard_normal(shape).astype(np.float32) for _ in range(3)]
        outs = pm.stream(mbs)
        import torch
        for mb, out in zip(mbs, outs):
            with torch.no_grad():
                want = tm(torch.from_numpy(mb)).numpy()
            np.testing.assert_allclose(out[0], want, rtol=1e-3, atol=1e-4)

    def test_params_on_stage_devices(self, eight_devices):
        from smelter_tpu.parallel import PipelinedModel

        g, _, _ = resnet50.build(1, 32, layers=(1, 1, 1, 1), width=16,
                                 num_classes=10)
        pm = PipelinedModel(g, 3)
        for params, dev in zip(pm._params, pm.devices):
            for p in params.values():
                assert list(p.devices()) == [dev]


class TestRingAttention:
    def test_matches_full_attention(self, eight_devices):
        from jax.sharding import Mesh
        from smelter_tpu.parallel import sequence_sharded_attention
        from smelter_tpu.kernels.flash_attention import flash_attention_reference

        rng = np.random.default_rng(0)
        b, h, n, d = 2, 4, 256, 64  # n split 8 x 32
        q = np.asarray(rng.standard_normal((b, h, n, d)), np.float32)
        k = np.asarray(rng.standard_normal((b, h, n, d)), np.float32)
        v = np.asarray(rng.standard_normal((b, h, n, d)), np.float32)
        mesh = Mesh(np.asarray(jax.devices()), ("sp",))
        got = np.asarray(sequence_sharded_attention(q, k, v, mesh, scale=0.125))
        want = np.asarray(flash_attention_reference(q, k, v, scale=0.125))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_extreme_logits_stable_on_ring(self, eight_devices):
        from jax.sharding import Mesh
        from smelter_tpu.parallel import sequence_sharded_attention

        rng = np.random.default_rng(1)
        q = np.asarray(rng.standard_normal((1, 2, 128, 32)), np.float32) * 20
        k = np.asarray(rng.standard_normal((1, 2, 128, 32)), np.float32) * 20
        v = np.asarray(rng.standard_normal((1, 2, 128, 32)), np.float32)
        mesh = Mesh(np.asarray(jax.devices()), ("sp",))
        got = np.asarray(sequence_sharded_attention(q, k, v, mesh, scale=1.0))
        assert np.isfinite(got).all()


class TestMoE:
    def test_sharded_matches_dense(self, eight_devices):
        from jax.sharding import Mesh
        from smelter_tpu.parallel import MoELayer

        moe = MoELayer.init(d_model=32, d_ff=64, n_experts=8, capacity=16)
        x = jnp_arr = np.random.default_rng(0).standard_normal((64, 32)).astype(np.float32)
        dense = np.asarray(moe.apply_dense(x))
        mesh = Mesh(np.asarray(jax.devices()), ("ep",))
        sharded = np.asarray(moe.apply_sharded(x, mesh))
        np.testing.assert_allclose(sharded, dense, rtol=1e-4, atol=1e-5)
        # routing actually spreads tokens (not all dropped/one expert)
        assert np.abs(dense).sum() > 0

    def test_capacity_drops_tokens(self):
        from smelter_tpu.parallel import MoELayer

        moe = MoELayer.init(d_model=8, d_ff=16, n_experts=2, capacity=1)
        x = np.random.default_rng(1).standard_normal((32, 8)).astype(np.float32)
        out = np.asarray(moe.apply_dense(x))
        # with capacity 1 and 32 tokens, most rows are dropped -> zeros
        zero_rows = (np.abs(out).sum(axis=1) == 0).sum()
        assert zero_rows >= 28
