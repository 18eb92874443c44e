"""TPU campaign #39: SegNet zoo row re-measure after the probe37 fix.

probe37 isolated SegNet's 167 ms to the MaxUnpool one-hot expansion
(109 ms/pair) and the tap-stack pool-indices form (11.4 ms vs 0.94 plain).
Both were replaced with reduce_window + nearest-upsample-compare forms.
Engine int8w re-measured 9.45 ms/b16. This records the naive-fp32
comparator for the zoo table (loop-amortized, same methodology as
probe34d/e)."""

import time

import numpy as np

LOOP = 20
B = 16


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


def timeit(fn, params, x, iters=4, warmup=1):
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

    g, _tm, shape = ZOO["segnet"](batch=B, image_size=256)
    x0 = jax.device_put(rng.standard_normal(shape).astype(np.float32))

    for label, cfg, quant in [
        ("naive fp32", st.Config(compute_dtype="float32"), None),
        ("engine bf16", st.Config(compute_dtype="bfloat16"), None),
        ("engine int8w", st.Config(compute_dtype="bfloat16"), "int8"),
    ]:
        m = st.compile(g, cfg, quant=quant) if quant else st.CompiledModel(g, cfg)

        def step(p, xx, fn=m._fn):
            return fn(p, xx)[0]

        dt = timeit(chain(step), m.params, x0)
        print(f"[{label:13s}] {dt*1e3:8.3f} ms  {B/dt:8,.0f} img/s",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
