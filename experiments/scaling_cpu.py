"""Scaling-efficiency harness (BASELINE gate: >=85% images/s efficiency
1 chip -> 2 hosts). On real slices this script runs per-host under
jax.distributed; here it demonstrates the methodology on the virtual CPU
mesh (1 -> 8 devices) — same program, different mesh.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python experiments/scaling_cpu.py
"""

import os
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import smelter_tpu as st
    from smelter_tpu.models import resnet50
    from smelter_tpu.parallel import MeshPlan, param_shardings, shard_params

    per_device_batch = 8
    results = {}
    for n_dev in (1, 2, 4, 8):
        batch = per_device_batch * n_dev
        g, _tm, shape = resnet50.build(batch=batch, image_size=64,
                                       layers=(1, 1, 1, 1), width=32)
        ex = st.Executor(g)
        plan = MeshPlan.for_devices(n_dev, tp=1)  # pure dp scaling
        with plan.mesh:
            params = shard_params(ex, plan)
            fn = jax.jit(ex.build_fn(),
                         in_shardings=(param_shardings(ex, plan),
                                       plan.batch_sharding()))
            x = jax.device_put(
                np.random.default_rng(0).standard_normal(shape).astype(np.float32),
                plan.batch_sharding())
            jax.block_until_ready(fn(params, x))
            t0 = time.perf_counter()
            iters = 10
            for _ in range(iters):
                out = fn(params, x)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / iters
        ips = batch / dt
        results[n_dev] = ips
        eff = ips / (results[1] * n_dev) if 1 in results else 1.0
        print(f"devices={n_dev}: batch={batch} {ips:.0f} img/s "
              f"(scaling efficiency {eff*100:.0f}%)", flush=True)

    return results


if __name__ == "__main__":
    main()
