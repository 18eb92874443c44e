"""TPU campaign #30: SD-UNet attention shapes across formulations.

The SD-UNet runs self-attention at (B=8, H=8, N=1024, hd=16) and
cross-attention at (N=1024, T=16) after the latent flatten. XLA's
dot_product_attention materializes O(N^2) scores from some N; the flash
kernel is gated seq>=2048 (ViT data) and the short-N kernel <512. N=1024
with tiny hd=16 sits in unmeasured territory — this decides the gates for
the diffusion family. Loop-amortized timing (one jitted fori_loop).
"""

import time

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=5, warmup=1):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


LOOP = 30


def chain(step, *xs):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*args):
        x0 = args[0]

        def body(i, carry):
            c0 = carry[(0,) * carry.ndim].astype(x0.dtype)
            return step(args[0] + c0 * 0, *args[1:])

        ysh = jax.eval_shape(step, *args)
        return jax.lax.fori_loop(0, LOOP, body,
                                 jnp.zeros(ysh.shape, ysh.dtype))

    return run


def main():
    import jax
    import jax.numpy as jnp

    from smelter_tpu.kernels.flash_attention import flash_attention

    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    for (B, H, N, T, hd) in ((8, 8, 1024, 1024, 16),   # SD self @32 latent
                             (8, 8, 1024, 16, 16),     # SD cross
                             (8, 8, 4096, 4096, 16),   # SD self @64 latent
                             (8, 8, 1024, 1024, 64)):  # wider-head variant
        q = jax.device_put(jnp.asarray(
            rng.standard_normal((B, N, H, hd)), jnp.bfloat16))
        k = jax.device_put(jnp.asarray(
            rng.standard_normal((B, T, H, hd)), jnp.bfloat16))
        v = jax.device_put(jnp.asarray(
            rng.standard_normal((B, T, H, hd)), jnp.bfloat16))
        scale = hd ** -0.5

        def dpa(q, k, v):
            return jax.nn.dot_product_attention(q, k, v, scale=scale)

        def manual(q, k, v):
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                           preferred_element_type=jnp.float32) * scale
            p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
            return jnp.einsum("bhqk,bkhd->bqhd", p, v)

        def flash(q, k, v):
            qt = jnp.swapaxes(q, 1, 2)
            kt = jnp.swapaxes(k, 1, 2)
            vt = jnp.swapaxes(v, 1, 2)
            return jnp.swapaxes(
                flash_attention(qt, kt, vt, scale=scale), 1, 2)

        r = {}
        r["dpa"] = timeit(chain(dpa, q, k, v), q, k, v)
        r["manual"] = timeit(chain(manual, q, k, v), q, k, v)
        if N == T and N >= 512 and hd >= 8:
            try:
                r["flash"] = timeit(chain(flash, q, k, v), q, k, v)
            except Exception as e:  # noqa: BLE001 — tile constraints
                print(f"  flash failed: {type(e).__name__}: {e}"[:120])
        flops = 4.0 * B * H * N * T * hd * LOOP
        for tag, t in r.items():
            print(f"[B{B} H{H} N{N} T{T} hd{hd}] {tag:7s}: "
                  f"{t*1e3:8.3f} ms  {flops/t/1e12:6.2f} TF/s")
    print("DONE")


if __name__ == "__main__":
    main()
