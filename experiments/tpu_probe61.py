"""TPU probe #61: (i) int8 vs bf16 conv efficiency at ResNet body shapes
with a K-spread wide enough for the small stages (probe60's 14x14/7x7
rows collapsed into dispatch noise); (ii) SegNet e2e with the unpool
kernel at its measured-roofline rows=128.
"""

import time

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def main():
    import jax
    import jax.numpy as jnp

    import smelter_tpu as st
    from smelter_tpu.models import ZOO

    print("devices:", jax.devices(), flush=True)

    def chained(step, loop):
        @jax.jit
        def run(x):
            ysh = jax.eval_shape(step, x)

            def body(_, carry):
                c0 = carry[(0,) * carry.ndim].astype(jnp.float32)
                bits = jax.lax.bitcast_convert_type(c0, jnp.int32)
                zero = jnp.where(bits == jnp.int32(0x7DEAD001), 1, 0)
                return step(x + zero.astype(x.dtype))
            return jax.lax.fori_loop(0, loop, body,
                                     jnp.zeros(ysh.shape, ysh.dtype))
        return run

    def timeit(step, x, lo=8, hi=72, rounds=5):
        f_lo, f_hi = chained(step, lo), chained(step, hi)
        sync(f_lo(x)), sync(f_hi(x))
        t_lo = t_hi = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter(); sync(f_lo(x))
            t_lo = min(t_lo, time.perf_counter() - t0)
            t0 = time.perf_counter(); sync(f_hi(x))
            t_hi = min(t_hi, time.perf_counter() - t0)
        return max(1e-9, (t_hi - t_lo) / (hi - lo))

    rng = np.random.default_rng(0)
    for (hh, cin, cout) in [(56, 64, 64), (28, 128, 128), (14, 256, 256),
                            (7, 512, 512)]:
        xq = jax.device_put(rng.integers(-127, 128, (128, hh, hh, cin),
                                         dtype=np.int8))
        wq = jax.device_put(rng.integers(-127, 128, (3, 3, cin, cout),
                                         dtype=np.int8))
        xb = jax.device_put(rng.standard_normal((128, hh, hh, cin))
                            .astype(np.float32)).astype(jnp.bfloat16)
        wb = jax.device_put(rng.standard_normal((3, 3, cin, cout))
                            .astype(np.float32)).astype(jnp.bfloat16)
        mscale = jax.device_put((rng.random(cout) * .01).astype(np.float32))

        def conv_i8(t, wq=wq, mscale=mscale):
            y = jax.lax.conv_general_dilated(
                t, wq, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return jnp.clip(jnp.round(y.astype(jnp.float32) * mscale),
                            -128, 127).astype(jnp.int8)

        def conv_bf(t, wb=wb):
            return jax.lax.conv_general_dilated(
                t, wb, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        fl = 2 * 128 * hh * hh * cin * cout * 9
        di = timeit(conv_i8, xq)
        db = timeit(conv_bf, xb)
        print(f"conv {hh}x{hh} c{cin}: int8 {di*1e3:.3f} ms "
              f"{fl/di/1e12:.0f} TOP/s ({100*fl/di/394e12:.0f}% peak) | "
              f"bf16 {db*1e3:.3f} ms {fl/db/1e12:.0f} TF "
              f"({100*fl/db/197e12:.0f}% peak)", flush=True)

    # (ii) SegNet e2e, unpool kernel rows=128 default
    g, _tm, shape = ZOO["segnet"](batch=16, image_size=256)
    m = st.compile(g, st.Config(compute_dtype="bfloat16"), layout="nhwc")
    x = jax.device_put(rng.standard_normal(shape).astype(np.float32))

    def step(t, m=m):
        return m._fn(m.params, t)[0]

    dt = timeit(step, x, lo=4, hi=12, rounds=5)
    print(f"segnet b16 rows=128: {dt*1e3:.2f} ms = {16/dt:.0f} img/s",
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
