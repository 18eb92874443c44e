"""Worker process for the real 2-process jax.distributed CPU test
(tests/test_multiprocess.py). Each process owns 2 virtual CPU devices;
the global mesh is (dp=2 across processes, tp=2 within) — the same
topology rule global_mesh applies on real v5e hosts (tp on ICI, dp on
DCN). Asserts dp+tp sharded forward parity against a single-device
reference, then prints WORKER_OK."""

import os
import sys

# Script-invoked subprocess gets sys.path[0]=tests/, not the repo root;
# bootstrap so `import smelter_tpu` works regardless of install state.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    port, pid = sys.argv[1], int(sys.argv[2])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from smelter_tpu.parallel.multihost import (
        global_mesh, init_distributed, process_local_batch)

    ok = init_distributed(coordinator=f"127.0.0.1:{port}", num_processes=2,
                          process_id=pid)
    assert ok, "init_distributed returned False"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    import smelter_tpu as st
    from smelter_tpu.models import resnet50
    from smelter_tpu.parallel import param_shardings, shard_params
    from smelter_tpu.runtime.executor import Executor

    g, _tm, shape = resnet50.build(8, 32, layers=(1, 1, 1, 1), width=16,
                                   num_classes=10)
    rng = np.random.default_rng(0)
    xg = rng.standard_normal(shape).astype(np.float32)  # identical everywhere

    # single-device reference (local)
    ref = np.asarray(st.CompiledModel(g)(xg)[0])

    plan = global_mesh(tp=2)
    assert plan.dp_size == 2 and plan.tp_size == 2, plan.mesh
    ex = Executor(g, st.Config())
    fn = jax.jit(ex.build_fn(),
                 in_shardings=(param_shardings(ex, plan),
                               plan.batch_sharding()))
    params = shard_params(ex, plan)
    x_local = process_local_batch(xg)
    assert x_local.shape[0] == shape[0] // 2
    x_global = multihost_utils.host_local_array_to_global_array(
        x_local, plan.mesh, P(plan.dp_axis))
    out = fn(params, x_global)[0]
    out_local = multihost_utils.global_array_to_host_local_array(
        out, plan.mesh, P(plan.dp_axis))
    mine = ref[pid * 4:(pid + 1) * 4]
    np.testing.assert_allclose(np.asarray(out_local), mine,
                               rtol=1e-3, atol=1e-4)
    print(f"WORKER_OK {pid}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
