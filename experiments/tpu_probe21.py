"""TPU campaign #21: final U-Net/ESRGAN end-to-end multipliers at HEAD
(after probe20's fixes: matmul-resize only for linear/cubic, broadcast
nearest, subpixel gated to C_in>=128). Also batch-128 rows for
BENCHMARKS.md and a bilinear-resize sanity check inside the compiled
model path.
"""

import time

import numpy as np

def sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=4, warmup=1):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import smelter_tpu as st

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    from smelter_tpu.models import esrgan, unet
    for name, build, batch, size in [("unet b16 256^2", unet.build, 16, 256),
                                     ("esrgan b8 128^2", esrgan.build, 8, 128)]:
        g, _tm, shape = build(batch=batch, image_size=size)
        x = jax.device_put(rng.standard_normal(shape).astype(np.float32))
        base = st.CompiledModel(
            st.import_model(st.export_model(g)),
            st.Config(compute_dtype="float32", fused_layernorm=False))
        dt = timeit(base._fn, base.params, x, iters=4)
        bips = batch / dt
        print(f"[C] {name} naive fp32: {bips:.1f} img/s", flush=True)
        del base
        for tag, quant in [("int8w", "int8"), ("bf16", None)]:
            m = st.compile(st.import_model(st.export_model(g)),
                           st.Config(compute_dtype="bfloat16"), quant=quant)
            dt = timeit(m._fn, m.params, x, iters=6)
            print(f"[C] {name} {tag}: {batch/dt:.1f} img/s "
                  f"({batch/dt/bips:.2f}x)", flush=True)
            del m
        del x

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
