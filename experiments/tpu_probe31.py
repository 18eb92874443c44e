"""TPU campaign #31: chip-side batch-1 latency past the RPC floor.

bench.py --latency measures 28.7 ms p50 for ResNet AND MobileNetV2 — pure
tunnel round-trip (VERDICT r1 missing item 5). Chaining K batch-1
forwards inside ONE dispatch (carry-fed, so XLA cannot overlap/elide
iterations) and dividing amortizes the floor away: the quotient is the
true on-chip single-image latency a co-located host would see.
"""

import time

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


LOOP = 50


def main():
    import jax
    import jax.numpy as jnp

    import smelter_tpu as st
    from smelter_tpu.models import ZOO

    print("devices:", jax.devices())
    for name, quant in (("resnet50", "int8"), ("mobilenet_v2", "int8"),
                        ("vit_b16", None)):
        g, _tm, shape = ZOO[name](batch=1, image_size=224)
        m = st.compile(g, st.Config(compute_dtype="bfloat16"), quant=quant)
        x = jax.device_put(np.random.default_rng(0)
                           .standard_normal(shape).astype(np.float32))
        params = m.params
        fn = m._fn

        @jax.jit
        def chained(params, xx):
            def body(i, carry):
                c0 = carry[(0,) * carry.ndim].astype(xx.dtype)
                return fn(params, xx + c0 * 0)[0]

            y0 = fn(params, xx)[0]
            return jax.lax.fori_loop(0, LOOP, body, y0)

        sync(chained(params, x))  # compile
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            sync(chained(params, x))
            times.append((time.perf_counter() - t0) / (LOOP + 1))
        lat = sorted(times)[len(times) // 2]
        print(f"[{name} b1 {quant or 'bf16'}] chip-side latency "
              f"p50 = {lat*1e3:.3f} ms ({1/lat:,.0f} img/s single-stream)")
    print("DONE")


if __name__ == "__main__":
    main()
