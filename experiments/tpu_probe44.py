"""TPU campaign #44: decoder zoo re-measure with pixel_conv_regions.

The NHCW pixel-conv pass (probe43: 2.5x on an RRDB trunk) is now in
DEFAULT_PIPELINE. Re-measure the decoder configs end-to-end through the
engine (loop-amortized): ESRGAN b8 128->512, U-Net b16 256, SegNet b16
256 — naive fp32 vs engine bf16 vs engine int8w. Old rows: ESRGAN 257
(bf16+pack), U-Net 1,488 (int8w), SegNet 2,007 (bf16)."""

import time

import numpy as np

LOOP = 20


def sync(x):
    leaf = x[0] if isinstance(x, (tuple, list)) else x
    np.asarray(leaf[(0,) * leaf.ndim])


def chain(step):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(params, xx):
        ysh = jax.eval_shape(step, params, xx)

        def body(i, carry):
            c0 = carry[(0,) * carry.ndim].astype(xx.dtype)
            return step(params, xx + c0 * jnp.zeros((), xx.dtype))
        return jax.lax.fori_loop(0, LOOP, body,
                                 jnp.zeros(ysh.shape, ysh.dtype))
    return run


def timeit(fn, params, x, iters=3, warmup=1):
    for _ in range(warmup):
        sync(fn(params, x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, x)
    sync(out)
    return (time.perf_counter() - t0) / iters / LOOP


def main():
    import jax

    import smelter_tpu as st
    from smelter_tpu.models import ZOO

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    import sys
    todo = sys.argv[1:] or ["esrgan", "unet", "segnet"]
    for model, batch, size in [("esrgan", 8, 128), ("unet", 16, 256),
                               ("segnet", 16, 256)]:
        if model not in todo:
            continue
        g, _tm, shape = ZOO[model](batch=batch, image_size=size)
        x0 = jax.device_put(rng.standard_normal(shape).astype(np.float32))
        for label, cfg, quant in [
            ("naive fp32", st.Config(compute_dtype="float32"), None),
            ("engine bf16", st.Config(compute_dtype="bfloat16"), None),
            ("engine int8w", st.Config(compute_dtype="bfloat16"), "int8"),
        ]:
            import copy
            gg = copy.deepcopy(g)
            m = (st.compile(gg, cfg, quant=quant) if quant or label != "naive fp32"
                 else st.CompiledModel(gg, cfg))

            def step(p, xx, fn=m._fn):
                return fn(p, xx)[0]

            dt = timeit(chain(step), m.params, x0)
            print(f"[{model:7s} {label:12s}] {dt*1e3:9.3f} ms "
                  f"{batch/dt:9,.0f} img/s", flush=True)
            del m
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
