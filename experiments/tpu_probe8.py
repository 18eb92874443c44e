"""TPU campaign #8: isolate the ViT large-batch regression.
Factors: dtype, attention fusion, int8 weight quant."""

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
    from smelter_tpu.models import vit
    from smelter_tpu.passes.pass_manager import run_passes
    from smelter_tpu.quant import quantize_weights

    print("devices:", jax.devices(), flush=True)
    batch = 128
    g0, _tm, shape = vit.build(batch=batch, image_size=224)
    x = jax.device_put(np.random.randn(*shape).astype(np.float32))

    def prep(attn=False, quant=None):
        g = st.import_model(st.export_model(g0))
        pipeline = ["eliminate_nops", "fold_constants"]
        if attn:
            pipeline.append("fuse_attention")
        pipeline += ["dce"]
        run_passes(g, pipeline)
        if quant:
            quantize_weights(g, quant)
            run_passes(g, ["fuse_dequant_matmul", "dce"])
        return g

    cases = [
        ("fp32 raw", prep(), "float32"),
        ("bf16 plain", prep(), "bfloat16"),
        ("bf16 +attnfuse", prep(attn=True), "bfloat16"),
        ("bf16 +int8", prep(quant="int8"), "bfloat16"),
        ("bf16 +attnfuse +int8", prep(attn=True, quant="int8"), "bfloat16"),
    ]
    for label, g, dtype in cases:
        m = st.CompiledModel(g, st.Config(compute_dtype=dtype))
        dt = timeit(m._fn, m.params, x)
        print(f"[1] vit b{batch} {label}: {dt*1e3:.1f} ms = {batch/dt:.0f} img/s",
              flush=True)
        del m

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
