"""TPU probe #64: whole-ConvNeXt-block kernel vs XLA's composed block.

probe62: parts 1.05 ms, XLA-composed 1.767 ms at stage-1 (b64, 56x56,
d96). Interleaved A/B at stage-1 and stage-2 geometries; the kernel only
earns pass wiring if it wins here (MLP/cross precedent).
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

    from smelter_tpu.kernels.convnext_block import (
        convnext_block, convnext_block_reference)

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

    rng = np.random.default_rng(0)
    B = 64
    for (hh, c) in [(56, 96), (28, 192)]:
        f = 4 * c
        x = jax.device_put(rng.standard_normal((B, hh, hh, c))
                           .astype(np.float32)).astype(jnp.bfloat16)
        dw = jax.device_put((rng.standard_normal((7, 7, 1, c)) * .1)
                            .astype(np.float32)).astype(jnp.bfloat16)
        db = jax.device_put((rng.standard_normal(c) * .05)
                            .astype(np.float32))
        g = jax.device_put((rng.standard_normal(c) * .1 + 1)
                           .astype(np.float32))
        b = jax.device_put((rng.standard_normal(c) * .1).astype(np.float32))
        w1 = jax.device_put((rng.standard_normal((c, f)) / np.sqrt(c))
                            .astype(np.float32)).astype(jnp.bfloat16)
        b1 = jax.device_put((rng.standard_normal(f) * .02)
                            .astype(np.float32))
        w2 = jax.device_put((rng.standard_normal((f, c)) / np.sqrt(f))
                            .astype(np.float32)).astype(jnp.bfloat16)
        b2 = jax.device_put((rng.standard_normal(c) * .02)
                            .astype(np.float32))
        gm = jax.device_put((rng.standard_normal(c) * .1)
                            .astype(np.float32))

        def xla_block(t):
            return convnext_block_reference(t, dw, db, g, b, w1, b1, w2,
                                            b2, gm)

        def pallas_block(t):
            return convnext_block(t, dw, db, g, b, w1, b1, w2, b2, gm,
                                  interpret=False)

        got = jax.jit(pallas_block)(x)
        want = jax.jit(xla_block)(x)

        @jax.jit
        def relerr(a, cc):
            d = jnp.max(jnp.abs(a.astype(jnp.float32)
                                - cc.astype(jnp.float32)))
            return d / (jnp.max(jnp.abs(cc.astype(jnp.float32))) + 1e-9)

        print(f"{hh}x{hh} d{c} on-chip rel err:",
              float(np.asarray(relerr(got, want))), flush=True)

        arms = {}
        for tag, step in (("A xla", xla_block), ("B pallas", pallas_block)):
            f4, f12 = chained(step, 4), chained(step, 12)
            sync(f4(x)), sync(f12(x))
            arms[tag] = (f4, f12, [float("inf")], [float("inf")])
        for _ in range(5):
            for tag, (f4, f12, lo, hi) in arms.items():
                t0 = time.perf_counter(); sync(f4(x))
                lo[0] = min(lo[0], time.perf_counter() - t0)
                t0 = time.perf_counter(); sync(f12(x))
                hi[0] = min(hi[0], time.perf_counter() - t0)
        for tag, (f4, f12, lo, hi) in arms.items():
            dt = max(1e-9, (hi[0] - lo[0]) / 8)
            print(f"  {hh}x{hh} d{c} {tag}: {dt*1e3:.3f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
