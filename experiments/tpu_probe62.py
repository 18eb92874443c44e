"""TPU probe #62: ConvNeXt block decomposition (25% of bound — why?).

Per-part microbench at the stage-1 geometry (b64, 56x56, d=96) and
stage-3 (14x14, d=384): depthwise 7x7, LayerNorm-over-channels, the two
pointwise GEMMs, and the whole block — each vs its own bound. Locates
whether the loss is XLA's large-window depthwise, the LN permute glue,
or the GEMMs.
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
    B = 64
    for (hh, d) in [(56, 96), (14, 384)]:
        x = jax.device_put(rng.standard_normal((B, hh, hh, d))
                           .astype(np.float32)).astype(jnp.bfloat16)
        wd = jax.device_put(rng.standard_normal((7, 7, 1, d))
                            .astype(np.float32)).astype(jnp.bfloat16)
        g = jax.device_put((rng.standard_normal(d) * .1 + 1)
                           .astype(np.float32))
        bb = jax.device_put((rng.standard_normal(d) * .1)
                            .astype(np.float32))
        w1 = jax.device_put((rng.standard_normal((d, 4 * d)) / np.sqrt(d))
                            .astype(np.float32)).astype(jnp.bfloat16)
        w2 = jax.device_put((rng.standard_normal((4 * d, d))
                             / np.sqrt(4 * d))
                            .astype(np.float32)).astype(jnp.bfloat16)

        def dw(t, wd=wd, d=d):
            return jax.lax.conv_general_dilated(
                t, wd, (1, 1), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=d).astype(jnp.bfloat16)

        def ln(t, g=g, bb=bb):
            tf = t.astype(jnp.float32)
            mu = jnp.mean(tf, -1, keepdims=True)
            xc = tf - mu
            var = jnp.mean(xc * xc, -1, keepdims=True)
            return ((xc * jax.lax.rsqrt(var + 1e-6)) * g + bb).astype(t.dtype)

        def mlp(t, w1=w1, w2=w2):
            h = jax.nn.gelu((t @ w1).astype(jnp.float32),
                            approximate=True).astype(t.dtype)
            return (h @ w2).astype(t.dtype)

        def block(t):
            return t + mlp(ln(dw(t)))

        n = B * hh * hh
        hbm = n * d * 2 * 2 / 819e9  # read+write once
        fl_dw = 2 * n * d * 49
        fl_mlp = 2 * n * d * 4 * d * 2
        rows = [
            ("dwconv7x7", dw, fl_dw, max(fl_dw / 197e12, hbm)),
            ("layernorm", ln, 0, hbm),
            ("mlp(2 GEMM)", mlp, fl_mlp, fl_mlp / 197e12),
            ("whole block", block, fl_dw + fl_mlp,
             fl_dw / 197e12 + fl_mlp / 197e12 + hbm),
        ]
        for tag, step, fl, bound in rows:
            dt = timeit(step, x)
            extra = f"{fl/dt/1e12:.0f} TF, " if fl else ""
            print(f"{hh}x{hh} d{d} {tag:12s}: {dt*1e3:.3f} ms ({extra}"
                  f"{100*bound/dt:.0f}% of its bound)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
