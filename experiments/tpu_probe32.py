"""TPU campaign #32: SD-UNet transpose-sandwich collapse (ROADMAP #4).

layout_nhwc leaves Transpose/Reshape/Transpose sandwiches around every
SpatialTransformer (10 of them in the bench config, 22 internal
transposes), because the original graph expresses token flattening via
NCHW. collapse_layout_transposes rewrites each sandwich to ONE free NHWC
reshape. This probe measures whether XLA was already seeing through the
sandwiches (transpose-of-reshape-of-transpose is bitcast-expressible) or
whether the graph-level collapse buys real throughput.

A/B: SD-UNet 256px (latent 32, base 128) b8 int8-conv + bf16, with and
without the collapse pass; ViT-B/16 b128 bf16 as a secondary check (one
patch-embed sandwich).
"""

import time

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def bench(m, x, iters=20):
    fn, params = m._fn, m.params
    for _ in range(2):
        sync(fn(params, x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, x)
    sync(out)
    return (time.perf_counter() - t0) / iters


def build(name, batch, image_size, quant, collapse, dtype="bfloat16"):
    import smelter_tpu as st
    from smelter_tpu.models import ZOO
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import quantize_weights

    g, _tm, shape = ZOO[name](batch=batch, image_size=image_size)
    run_passes(g)
    if quant == "int8-conv":
        quantize_weights(g, mode="int8", ops=("Conv", "ConvTranspose"))
    elif quant:
        quantize_weights(g, mode=quant)
    pipeline = ["layout_nhwc"]
    if collapse:
        pipeline.append("collapse_layout_transposes")
    run_passes(g, pipeline)
    run_passes(g, ["dce"])
    nt = sum(1 for _ in g.find_nodes("Transpose"))
    return st.CompiledModel(g, st.Config(compute_dtype=dtype)), shape, nt


def main():
    import jax

    print("devices:", jax.devices())
    cases = [
        ("sd_unet", 8, 256, "int8-conv"),
        ("sd_unet", 8, 256, None),
        ("vit_b16", 128, 224, None),
    ]
    for name, batch, size, quant in cases:
        for collapse in (False, True):
            m, shape, nt = build(name, batch, size, quant, collapse)
            x = jax.device_put(np.random.default_rng(0)
                               .standard_normal(shape).astype(np.float32))
            dt = bench(m, x)
            print(f"[{name} b{batch} {quant or 'bf16'} collapse={collapse}] "
                  f"{batch/dt:,.0f} img/s  ({dt*1e3:.2f} ms/b, "
                  f"{nt} transposes in graph)", flush=True)
            del m, x
    print("DONE")


if __name__ == "__main__":
    main()
