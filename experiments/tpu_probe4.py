"""Diagnose the MobileNetV2 int8/nhwc regression: factor matrix over
dtype x layout x quant, plus depthwise-conv microbenchmarks."""

import time

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=8, warmup=2):
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
    from smelter_tpu.models import mobilenet_v2

    print("devices:", jax.devices(), flush=True)
    batch = 256
    g0, _tm, shape = mobilenet_v2.build(batch=batch, image_size=224)
    x = jax.device_put(np.random.randn(*shape).astype(np.float32))

    cases = [
        ("fp32 nchw raw", dict(optimize=False, quant=None, layout="nchw"), "float32"),
        ("bf16 nchw opt", dict(optimize=True, quant=None, layout="nchw"), "bfloat16"),
        ("bf16 nhwc opt", dict(optimize=True, quant=None, layout="nhwc"), "bfloat16"),
        ("bf16 nchw int8", dict(optimize=True, quant="int8", layout="nchw"), "bfloat16"),
        ("bf16 nhwc int8", dict(optimize=True, quant="int8", layout="nhwc"), "bfloat16"),
    ]
    for label, kw, dtype in cases:
        g = st.import_model(st.export_model(g0))
        m = st.compile(g, st.Config(compute_dtype=dtype), **kw)
        dt = timeit(m._fn, m.params, x)
        print(f"[1] mnv2 b{batch} {label}: {dt*1e3:.1f} ms = {batch/dt:.0f} img/s",
              flush=True)
        del m

    # depthwise conv micro: NCHW vs NHWC, f32 weights vs dequant-int8
    from jax import lax

    C, H = 96, 56
    xn = jax.device_put(np.random.randn(batch, C, H, H).astype(np.float32)).astype(jnp.bfloat16)
    xh = jax.device_put(np.random.randn(batch, H, H, C).astype(np.float32)).astype(jnp.bfloat16)
    w = np.random.randn(C, 1, 3, 3).astype(np.float32)
    wn = jax.device_put(w).astype(jnp.bfloat16)
    wh = jax.device_put(w.transpose(2, 3, 1, 0)).astype(jnp.bfloat16)  # HWIO
    q = np.clip(np.round(w / 0.01), -127, 127).astype(np.int8)
    qh = jax.device_put(q.transpose(2, 3, 1, 0))
    sc = jax.device_put(np.full(C, 0.01, np.float32))

    @jax.jit
    def dw_nchw(x, w):
        return lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                        dimension_numbers=("NCHW", "OIHW", "NCHW"),
                                        feature_group_count=C)

    @jax.jit
    def dw_nhwc(x, w):
        return lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                        feature_group_count=C)

    @jax.jit
    def dw_nhwc_dequant(x, q, s):
        w = q.astype(jnp.float32) * s.reshape(1, 1, 1, C)
        return lax.conv_general_dilated(x, w.astype(x.dtype), (1, 1),
                                        [(1, 1), (1, 1)],
                                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                        feature_group_count=C)

    for label, fn, args in [
        ("dw nchw bf16", dw_nchw, (xn, wn)),
        ("dw nhwc bf16", dw_nhwc, (xh, wh)),
        ("dw nhwc int8-dequant", dw_nhwc_dequant, (xh, qh, sc)),
    ]:
        dt = timeit(fn, *args)
        print(f"[2] {label}: {dt*1e3:.2f} ms", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
