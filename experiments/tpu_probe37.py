"""TPU campaign #37: where do SegNet's 167 ms go?

The zoo SegNet (base 32, depth 3, 7 convs, 0.2M params) costs ~0.1 ms of
conv FLOPs yet measures 167 ms/batch after the dense-unpool fix. Isolate
(loop-amortized): the engine full model, pool-with-indices alone, dense
unpool alone, and argmax/int64 formulation details.
"""

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
    import jax.numpy as jnp

    import smelter_tpu as st
    from smelter_tpu.models import ZOO
    from smelter_tpu.ir.build import GraphBuilder

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # A. engine full segnet int8w
    g, _tm, shape = ZOO["segnet"](batch=B, image_size=256)
    m = st.compile(g, st.Config(compute_dtype="bfloat16"), quant="int8")
    x0 = jax.device_put(rng.standard_normal(shape).astype(np.float32))

    def engine_step(p, xx):
        return m._fn(p, xx)[0]

    dt = timeit(chain(engine_step), m.params, x0)
    print(f"[A engine segnet    ] {dt*1e3:8.3f} ms", flush=True)

    # B. pool-with-indices alone (256^2 x 32), via the engine lowering
    b = GraphBuilder("p", opset=13)
    xi = b.input("x", (B, 32, 256, 256))
    y, idx = b.node("MaxPool", [xi], outputs=2,
                    kernel_shape=[2, 2], strides=[2, 2])
    gp = b.finish([y, idx])
    mp_ = st.CompiledModel(gp, st.Config(compute_dtype="bfloat16"))
    xp = jax.device_put(rng.standard_normal((B, 32, 256, 256))
                        .astype(np.float32))

    def pool_step(p, xx):
        return mp_._fn(p, xx)[0]

    dt = timeit(chain(pool_step), mp_.params, xp)
    print(f"[B pool+indices     ] {dt*1e3:8.3f} ms", flush=True)

    # C. plain MaxPool (no indices), same shape
    b = GraphBuilder("p2", opset=13)
    xi = b.input("x", (B, 32, 256, 256))
    y = b.node("MaxPool", [xi], kernel_shape=[2, 2], strides=[2, 2])
    gp2 = b.finish([y])
    mp2 = st.CompiledModel(gp2, st.Config(compute_dtype="bfloat16"))

    def pool2_step(p, xx):
        return mp2._fn(p, xx)[0]

    dt = timeit(chain(pool2_step), mp2.params, xp)
    print(f"[C pool plain       ] {dt*1e3:8.3f} ms", flush=True)

    # D. dense unpool alone (pool then unpool, subtract B)
    b = GraphBuilder("p3", opset=13)
    xi = b.input("x", (B, 32, 256, 256))
    y, idx = b.node("MaxPool", [xi], outputs=2,
                    kernel_shape=[2, 2], strides=[2, 2])
    out = b.node("MaxUnpool", [y, idx], kernel_shape=[2, 2], strides=[2, 2])
    gp3 = b.finish([out])
    mp3 = st.CompiledModel(gp3, st.Config(compute_dtype="bfloat16"))

    def pool3_step(p, xx):
        return mp3._fn(p, xx)[0]

    dt = timeit(chain(pool3_step), mp3.params, xp)
    print(f"[D pool+idx+unpool  ] {dt*1e3:8.3f} ms", flush=True)

    # E. raw conv stack equivalent (no pools) for the FLOPs floor
    w1 = jnp.asarray(rng.standard_normal((3, 3, 32, 32)).astype(np.float32),
                     jnp.bfloat16)

    def conv_step(p, xx):
        from jax import lax

        h = xx.astype(jnp.bfloat16)
        h = jnp.transpose(h, (0, 2, 3, 1))
        for _ in range(2):
            h = lax.conv_general_dilated(
                h, p, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return h

    dt = timeit(chain(conv_step), w1, xp)
    print(f"[E two 3x3 convs    ] {dt*1e3:8.3f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
