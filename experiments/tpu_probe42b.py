"""TPU campaign #42b: clean HBM bandwidth curve.

probe42's chain harness added a copy pass per iteration (x + c0*0),
polluting the GB/s numbers. Here the loop body feeds the output straight
back as the next input (shapes match), so each iteration is exactly one
read + one write. Sweep size and dtype: y = x + 1 on 8/32/128/512 MB,
bf16 and f32."""

import time

import numpy as np

LOOP = 30


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    for mbytes in (8, 32, 128, 512):
        for dt in ("bfloat16", "float32"):
            dtype = jnp.dtype(dt)
            n = mbytes * 2**20 // dtype.itemsize // 128
            x = jax.device_put(jnp.asarray(
                rng.standard_normal((n, 128)).astype(np.float32), dtype))

            @jax.jit
            def run(xx):
                def body(i, c):
                    return c + jnp.ones((), c.dtype)
                return jax.lax.fori_loop(0, LOOP, body, xx)

            np.asarray(run(x)[0, 0])  # warm
            t0 = time.perf_counter()
            for _ in range(4):
                out = run(x)
            np.asarray(out[0, 0])
            t = (time.perf_counter() - t0) / 4 / LOOP
            gbs = 2 * x.size * dtype.itemsize / t / 1e9
            print(f"[{mbytes:4d} MB {dt:9s}] {t*1e6:9.1f} us  "
                  f"{gbs:6.0f} GB/s", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
