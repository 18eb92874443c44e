"""TPU probe #54: whole-MLP-block kernel vs XLA at ViT-B geometry.

The attention block won 2.5x (probe52); the MLP's fusion barriers are
smaller, so this one must earn wiring. B=128, N=197, D=768, F=3072.
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

    from smelter_tpu.kernels.mlp_block import mlp_block

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    B, N, D, F = 128, 197, 768, 3072
    x = jax.device_put(rng.standard_normal((B, N, D)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    g = jax.device_put((rng.standard_normal(D) * .1 + 1).astype(np.float32))
    b = jax.device_put((rng.standard_normal(D) * .1).astype(np.float32))
    w1 = jax.device_put((rng.standard_normal((D, F)) / np.sqrt(D))
                        .astype(np.float32)).astype(jnp.bfloat16)
    b1 = jax.device_put((rng.standard_normal(F) * .02).astype(np.float32))
    w2 = jax.device_put((rng.standard_normal((F, D)) / np.sqrt(F))
                        .astype(np.float32)).astype(jnp.bfloat16)
    b2 = jax.device_put((rng.standard_normal(D) * .02).astype(np.float32))

    def xla_mlp(t):
        tf = t.astype(jnp.float32)
        mu = jnp.mean(tf, -1, keepdims=True)
        xc = tf - mu
        var = jnp.mean(xc * xc, -1, keepdims=True)
        xn = (xc * jax.lax.rsqrt(var + 1e-5) * g + b).astype(t.dtype)
        h = (xn @ w1).astype(jnp.float32) + b1
        h = jax.nn.gelu(h, approximate=False).astype(t.dtype)
        y = (h @ w2).astype(jnp.float32) + b2
        return (t.astype(jnp.float32) + y).astype(t.dtype)

    def pallas_mlp(t):
        return mlp_block(t, g, b, w1, b1, w2, b2, interpret=False)

    got = jax.jit(pallas_mlp)(x)
    want = jax.jit(xla_mlp)(x)

    @jax.jit
    def relerr(a, c):
        d = jnp.max(jnp.abs(a.astype(jnp.float32) - c.astype(jnp.float32)))
        return d / (jnp.max(jnp.abs(c.astype(jnp.float32))) + 1e-9)

    print("on-chip rel err:", float(np.asarray(relerr(got, want))),
          flush=True)

    def chained(step, loop):
        @jax.jit
        def run(t):
            def body(_, carry):
                c0 = carry[(0,) * carry.ndim].astype(jnp.float32)
                bits = jax.lax.bitcast_convert_type(c0, jnp.int32)
                zero = jnp.where(bits == jnp.int32(0x7DEAD001),
                                 jnp.float32(1), jnp.float32(0))
                return step(t + zero.astype(t.dtype))
            return jax.lax.fori_loop(0, loop, body, jnp.zeros_like(t))
        return run

    def robust(step, lo=4, hi=12, rounds=4):
        f_lo, f_hi = chained(step, lo), chained(step, hi)
        sync(f_lo(x)), sync(f_hi(x))
        t_lo = t_hi = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter(); sync(f_lo(x))
            t_lo = min(t_lo, time.perf_counter() - t0)
            t0 = time.perf_counter(); sync(f_hi(x))
            t_hi = min(t_hi, time.perf_counter() - t0)
        return max(1e-9, (t_hi - t_lo) / (hi - lo))

    fl = B * 4 * N * D * F
    for tag, step in [("xla mlp block", xla_mlp),
                      ("pallas mlp block", pallas_mlp)]:
        dt = robust(step)
        print(f"{tag}: {dt*1e3:.3f} ms = {fl/dt/1e12:.1f} TF", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
