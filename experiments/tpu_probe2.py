"""TPU measurement campaign #1: true chip throughput with readback sync.

Run as ONE process (axon tunnel serializes client claims; killed clients
wedge the chip). Logs incrementally to stdout (flush) so partial progress
survives.

Measures:
 1. matmul speed-of-light check (bf16 MXU)
 2. ResNet-50 b32 fp32 vs bf16 vs int8-dequant (XLA path)
 3. NCHW vs NHWC conv stack (layout decision)
 4. Pallas dequant_matmul vs XLA dequant+matmul vs pure bf16 matmul
"""

import time

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    scalar = leaf[(0,) * getattr(leaf, "ndim", 0)]; np.asarray(scalar)


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    # 1. matmul speed of light
    for size in (4096, 8192):
        x = jax.device_put(np.random.randn(size, size).astype(np.float32)).astype(jnp.bfloat16)
        w = jax.device_put(np.random.randn(size, size).astype(np.float32)).astype(jnp.bfloat16)

        @jax.jit
        def mm(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        dt = timeit(mm, x, w, iters=20)
        print(f"[1] bf16 matmul {size}: {dt*1e3:.2f} ms = "
              f"{2*size**3/dt/1e12:.1f} TFLOP/s", flush=True)

    # 2. ResNet-50 batch-32 variants
    import smelter_tpu as st
    from smelter_tpu.models import resnet50
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import quantize_weights

    g, _tm, shape = resnet50.build(batch=32, image_size=224)
    x = jax.device_put(np.random.randn(*shape).astype(np.float32))

    for label, cfg, quant in [
        ("fp32", st.Config(compute_dtype="float32"), None),
        ("bf16", st.Config(compute_dtype="bfloat16"), None),
        ("bf16+int8w", st.Config(compute_dtype="bfloat16"), "int8"),
    ]:
        import copy

        gg = st.import_model(st.export_model(g))
        run_passes(gg)
        if quant:
            quantize_weights(gg, quant)
        m = st.CompiledModel(gg, cfg)
        dt = timeit(m._fn, m.params, x, iters=10)
        print(f"[2] resnet50 b32 {label}: {dt*1e3:.1f} ms = {32/dt:.0f} img/s",
              flush=True)

    # 3. layout: NCHW vs NHWC conv stack (realistic resnet stage)
    from jax import lax

    def make_stack(layout):
        dn = ("NCHW", "OIHW", "NCHW") if layout == "nchw" else ("NHWC", "HWIO", "NHWC")

        @jax.jit
        def stack(x, ws):
            for w in ws:
                x = lax.conv_general_dilated(
                    x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
                x = jnp.maximum(x, 0)
            return x

        return stack

    C = 256
    ws_oihw = [np.random.randn(C, C, 3, 3).astype(np.float32) * 0.05 for _ in range(8)]
    xb = np.random.randn(32, C, 28, 28).astype(np.float32)
    for layout in ("nchw", "nhwc"):
        if layout == "nchw":
            xs = jax.device_put(xb).astype(jnp.bfloat16)
            ws = [jax.device_put(w).astype(jnp.bfloat16) for w in ws_oihw]
        else:
            xs = jax.device_put(xb.transpose(0, 2, 3, 1)).astype(jnp.bfloat16)
            ws = [jax.device_put(w.transpose(2, 3, 1, 0)).astype(jnp.bfloat16) for w in ws_oihw]
        fn = make_stack(layout)
        dt = timeit(fn, xs, ws, iters=10)
        flops = 2 * 32 * 28 * 28 * C * C * 9 * 8
        print(f"[3] conv stack {layout}: {dt*1e3:.2f} ms = {flops/dt/1e12:.1f} TFLOP/s",
              flush=True)

    # 4. Pallas dequant_matmul vs XLA variants
    from smelter_tpu.kernels.dequant_matmul import dequant_matmul, dequant_matmul_reference
    from smelter_tpu.quant import quantize_array

    for (M, K, N) in [(1024, 4096, 4096), (128, 4096, 4096), (8192, 4096, 4096)]:
        xk = jax.device_put(np.random.randn(M, K).astype(np.float32)).astype(jnp.bfloat16)
        wf = np.random.randn(K, N).astype(np.float32)
        q, s = quantize_array(wf, axis=1)
        qd = jax.device_put(q)
        sd = jax.device_put(s.reshape(-1))
        wb = jax.device_put(wf).astype(jnp.bfloat16)

        @jax.jit
        def xla_bf16(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        ref = jax.jit(dequant_matmul_reference)
        flops = 2 * M * K * N
        t_bf16 = timeit(xla_bf16, xk, wb, iters=20)
        t_ref = timeit(ref, xk, qd, sd, iters=20)
        t_pal = timeit(dequant_matmul, xk, qd, sd, iters=20)
        print(f"[4] M{M} K{K} N{N}: bf16 {t_bf16*1e3:.2f}ms "
              f"({flops/t_bf16/1e12:.0f}TF) | xla-dequant {t_ref*1e3:.2f}ms "
              f"({flops/t_ref/1e12:.0f}TF) | pallas {t_pal*1e3:.2f}ms "
              f"({flops/t_pal/1e12:.0f}TF)", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
