"""TPU campaign #3: ResNet batch sweep (throughput amortization) and
Pallas dequant_matmul block-size tuning."""

import time

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


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

    import smelter_tpu as st
    from smelter_tpu.models import resnet50

    print("devices:", jax.devices(), flush=True)

    # 1. ResNet-50 int8w batch sweep
    for batch in (32, 64, 128, 256):
        g, _tm, shape = resnet50.build(batch=batch, image_size=224)
        m = st.compile(g, st.Config(compute_dtype="bfloat16"), quant="int8")
        x = jax.device_put(np.random.randn(*shape).astype(np.float32))
        dt = timeit(m._fn, m.params, x, iters=8)
        print(f"[1] resnet50 int8w b{batch}: {dt*1e3:.1f} ms = {batch/dt:.0f} img/s",
              flush=True)
        del m, x

    # 2. Pallas dequant_matmul block tuning at M=8192 (serving-shape gemm)
    from smelter_tpu.kernels.dequant_matmul import dequant_matmul
    from smelter_tpu.quant import quantize_array

    M, K, N = 8192, 4096, 4096
    xk = jax.device_put(np.random.randn(M, K).astype(np.float32)).astype(jnp.bfloat16)
    wf = np.random.randn(K, N).astype(np.float32)
    q, s = quantize_array(wf, axis=1)
    qd = jax.device_put(q)
    sd = jax.device_put(s.reshape(-1))
    flops = 2 * M * K * N
    for bm, bn, bk in [(256, 256, 512), (512, 512, 512), (512, 1024, 512),
                       (1024, 512, 512), (256, 1024, 1024), (512, 256, 2048),
                       (1024, 256, 1024), (2048, 512, 512)]:
        try:
            fn = lambda a, b, c: dequant_matmul(a, b, c, block_m=bm,
                                                block_n=bn, block_k=bk)
            dt = timeit(fn, xk, qd, sd, iters=10)
            print(f"[2] bm{bm} bn{bn} bk{bk}: {dt*1e3:.2f} ms = "
                  f"{flops/dt/1e12:.0f} TFLOP/s", flush=True)
        except Exception as e:
            print(f"[2] bm{bm} bn{bn} bk{bk}: FAIL {type(e).__name__}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
