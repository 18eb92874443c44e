"""TPU campaign #9: flash-attention kernel at long sequences (its gated
domain, seq >= 512) vs XLA dot_product_attention."""

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

    from smelter_tpu.kernels.flash_attention import flash_attention

    print("devices:", jax.devices(), flush=True)

    @jax.jit
    def xla_dpa(q, k, v):
        qt = jnp.swapaxes(q, 1, 2)
        kt = jnp.swapaxes(k, 1, 2)
        vt = jnp.swapaxes(v, 1, 2)
        o = jax.nn.dot_product_attention(qt, kt, vt, scale=0.125)
        return jnp.swapaxes(o, 1, 2)

    for (b, h, n, d) in [(4, 8, 1024, 64), (2, 8, 4096, 64), (1, 8, 8192, 128)]:
        q = jax.device_put(np.random.randn(b, h, n, d).astype(np.float32)).astype(jnp.bfloat16)
        k = jax.device_put(np.random.randn(b, h, n, d).astype(np.float32)).astype(jnp.bfloat16)
        v = jax.device_put(np.random.randn(b, h, n, d).astype(np.float32)).astype(jnp.bfloat16)
        flops = 4 * b * h * n * n * d
        try:
            t_pal = timeit(lambda a, b_, c: flash_attention(a, b_, c, scale=0.125),
                           q, k, v)
            pal = f"{t_pal*1e3:.2f}ms ({flops/t_pal/1e12:.0f}TF)"
        except Exception as e:
            pal = f"FAIL {type(e).__name__} {str(e)[:100]}"
        t_x = timeit(xla_dpa, q, k, v)
        print(f"[1] b{b} h{h} n{n} d{d}: pallas-flash {pal} | "
              f"xla-dpa {t_x*1e3:.2f}ms ({flops/t_x/1e12:.0f}TF)", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
