"""TPU probe #59: Pallas MaxUnpool kernel A/B on SegNet.

probe58: the final full-res MaxUnpool costs 4.76 ms of SegNet's 8.81 —
~16x its traffic bound (XLA materializes the expanded operands). The
kernel (kernels/max_unpool.py) reads x+idx once at input resolution and
computes the landing parity in-register. Interleaved e2e A/B, plus
numerics check on-chip.
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
    import smelter_tpu.ops.nn as nn_ops
    from smelter_tpu.models import ZOO

    print("devices:", jax.devices(), flush=True)

    def chained(fn, params, x, loop, leaf_sd):
        @jax.jit
        def run(p, xx):
            def body(_, carry):
                c0 = carry[(0,) * carry.ndim].astype(jnp.float32)
                bits = jax.lax.bitcast_convert_type(c0, jnp.int32)
                zero = jnp.where(bits == jnp.int32(0x7DEAD001),
                                 jnp.float32(1), jnp.float32(0))
                out = fn(p, xx + zero.astype(xx.dtype))
                return jax.tree_util.tree_leaves(out)[0]
            return jax.lax.fori_loop(0, loop, body,
                                     jnp.zeros(leaf_sd.shape, leaf_sd.dtype))
        return run

    arms = {}
    shape = None
    for tag, use_kernel in (("A xla-unpool", False), ("B pallas-unpool", True)):
        # round 2 of the A/B: kernel rows raised 8 -> 256 (8192 grid steps
        # of tiny work drowned in per-step overhead)
        nn_ops._UNPOOL_KERNEL = use_kernel
        g, _tm, shape = ZOO["segnet"](batch=16, image_size=256)
        m = st.compile(g, st.Config(compute_dtype="bfloat16"), layout="nhwc")
        x = jax.device_put(np.random.default_rng(0)
                           .standard_normal(shape).astype(np.float32))
        sd = jax.tree_util.tree_leaves(
            jax.eval_shape(m._fn, m.params, x))[0]
        f4 = chained(m._fn, m.params, x, 4, sd)
        f12 = chained(m._fn, m.params, x, 12, sd)
        out = jax.jit(m._fn)(m.params, x)
        sync(f4(m.params, x)), sync(f12(m.params, x))
        arms[tag] = (m, x, f4, f12, [float("inf")], [float("inf")], out)
        print(f"{tag}: compiled", flush=True)

    @jax.jit
    def maxdiff(a, c):
        return jnp.max(jnp.abs(a[0].astype(jnp.float32)
                               - c[0].astype(jnp.float32)))

    d = float(np.asarray(maxdiff(arms["A xla-unpool"][6],
                                 arms["B pallas-unpool"][6])))
    print("on-chip A/B output max diff:", d, flush=True)

    for _ in range(5):
        for tag, (m, x, f4, f12, lo, hi, _o) in arms.items():
            t0 = time.perf_counter(); sync(f4(m.params, x))
            lo[0] = min(lo[0], time.perf_counter() - t0)
            t0 = time.perf_counter(); sync(f12(m.params, x))
            hi[0] = min(hi[0], time.perf_counter() - t0)
    for tag, (m, x, f4, f12, lo, hi, _o) in arms.items():
        dt = max(1e-9, (hi[0] - lo[0]) / 8)
        print(f"segnet b16 {tag}: {dt*1e3:.2f} ms = {16/dt:.0f} img/s",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
