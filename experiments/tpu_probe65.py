"""TPU probe #65: ConvNeXt whole-block kernel e2e A/B (b64, int8w).

Isolated block won 1.40x/1.13x (probe64); the MLP and cross-attn kernels
both inverted e2e, so the default rides this measurement.
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
    from smelter_tpu.passes.layout import NHWC_PIPELINE
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import quantize_weights

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
    for tag, skip in (("A xla-blocks", True), ("B fused-blocks", False)):
        g, _tm, shape = ZOO["convnext"](batch=64, image_size=224)
        run_passes(g)
        quantize_weights(g, mode="int8")
        pipe = [p for p in NHWC_PIPELINE
                if not (skip and p == "fuse_convnext_block")]
        run_passes(g, pipe)
        run_passes(g, ["dce"])
        n = sum(1 for nd in g.nodes if nd.op_type == "ConvNeXtBlock")
        m = st.CompiledModel(g, st.Config(compute_dtype="bfloat16"))
        x = jax.device_put(np.random.default_rng(0)
                           .standard_normal(shape).astype(np.float32))
        sd = jax.tree_util.tree_leaves(
            jax.eval_shape(m._fn, m.params, x))[0]
        f4 = chained(m._fn, m.params, x, 4, sd)
        f12 = chained(m._fn, m.params, x, 12, sd)
        sync(f4(m.params, x)), sync(f12(m.params, x))
        print(f"{tag}: {n} fused, compiled", flush=True)
        arms[tag] = (m, x, f4, f12, [float("inf")], [float("inf")])
    for _ in range(5):
        for tag, (m, x, f4, f12, lo, hi) in arms.items():
            t0 = time.perf_counter(); sync(f4(m.params, x))
            lo[0] = min(lo[0], time.perf_counter() - t0)
            t0 = time.perf_counter(); sync(f12(m.params, x))
            hi[0] = min(hi[0], time.perf_counter() - t0)
    for tag, (m, x, f4, f12, lo, hi) in arms.items():
        dt = max(1e-9, (hi[0] - lo[0]) / 8)
        print(f"convnext b64 {tag}: {dt*1e3:.2f} ms = {64/dt:.0f} img/s",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
