"""TPU campaign #5: ViT efficiency (lowest speedup config) and ResNet b256
with the fixed pipeline.

ViT variants: default (XLA dot_product_attention) vs Pallas flash kernel
vs unfused attention, and fp32-vs-native LayerNorm accumulation.
"""

import time

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    import smelter_tpu as st
    from smelter_tpu.models import resnet50, vit
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import quantize_weights

    print("devices:", jax.devices(), flush=True)
    batch = 64
    g0, _tm, shape = vit.build(batch=batch, image_size=224)
    x = jax.device_put(np.random.randn(*shape).astype(np.float32))

    def prep(attn_fusion=True, quant="int8"):
        g = st.import_model(st.export_model(g0))
        pipeline = ["eliminate_nops", "fold_constants", "fuse_bn_conv"]
        if attn_fusion:
            pipeline.append("fuse_attention")
        pipeline += ["eliminate_nops", "dce"]
        run_passes(g, pipeline)
        if quant:
            quantize_weights(g, quant)
            run_passes(g, ["fuse_dequant_matmul", "dce"])
        return g

    cases = [
        ("xla-dpa int8", prep(True, "int8"), False),
        ("pallas-flash int8", prep(True, "int8"), True),
        ("unfused-attn int8", prep(False, "int8"), False),
        ("xla-dpa bf16-only", prep(True, None), False),
    ]
    for label, g, use_pallas in cases:
        m = st.CompiledModel(g, st.Config(compute_dtype="bfloat16",
                                          use_pallas=use_pallas))
        dt = timeit(m._fn, m.params, x)
        print(f"[1] vit b{batch} {label}: {dt*1e3:.1f} ms = {batch/dt:.0f} img/s",
              flush=True)
        del m

    # ResNet-50 b256 with the full fixed pipeline
    g, _tm, shape = resnet50.build(batch=256, image_size=224)
    m = st.compile(g, st.Config(compute_dtype="bfloat16"), quant="int8")
    xr = jax.device_put(np.random.randn(*shape).astype(np.float32))
    dt = timeit(m._fn, m.params, xr, iters=6)
    print(f"[2] resnet50 b256 full pipeline: {dt*1e3:.1f} ms = {256/dt:.0f} img/s",
          flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
