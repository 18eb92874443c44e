"""TPU campaign #22: bisect the ESRGAN end-to-end regression (probe21:
optimized bf16/int8w 173 img/s < naive fp32 180). Candidates: the
split_concat_conv rewrite (microbench 2.52x but dense-block topology may
break XLA fusion e2e), subpixel (should be gated off at nf=64), layout,
quant mode. Runs ESRGAN b8 128^2 bf16 under pass-pipeline variants.
"""

import time

import numpy as np


def sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=6, warmup=1):
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
    from smelter_tpu.passes.pass_manager import DEFAULT_PIPELINE, run_passes
    from smelter_tpu.models import esrgan

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    g0, _tm, shape = esrgan.build(batch=8, image_size=128)
    blob = st.export_model(g0)
    x = jax.device_put(rng.standard_normal(shape).astype(np.float32))

    def fresh():
        return st.import_model(blob)

    def bench(tag, g, cfg):
        m = st.CompiledModel(g, cfg)
        dt = timeit(m._fn, m.params, x)
        print(f"[{tag}] {8/dt:.1f} img/s", flush=True)
        del m

    bf = st.Config(compute_dtype="bfloat16")
    # pass-fire census
    g = fresh()
    run_passes(g, verbose=True)
    print("--- variants", flush=True)

    bench("fp32 nchw nopass", fresh(), st.Config(compute_dtype="float32"))
    bench("bf16 nchw nopass", fresh(), bf)
    g = fresh(); run_passes(g, ["layout_nhwc", "dce"])
    bench("bf16 nhwc only", g, bf)
    g = fresh(); run_passes(g); run_passes(g, ["layout_nhwc", "dce"])
    bench("bf16 full", g, bf)
    pipe_nosplit = [p for p in DEFAULT_PIPELINE if p != "split_concat_conv"]
    g = fresh(); run_passes(g, pipe_nosplit); run_passes(g, ["layout_nhwc", "dce"])
    bench("bf16 full-nosplit", g, bf)
    pipe_min = [p for p in DEFAULT_PIPELINE
                if p not in ("split_concat_conv", "subpixel_upsample_conv")]
    g = fresh(); run_passes(g, pipe_min); run_passes(g, ["layout_nhwc", "dce"])
    bench("bf16 full-nosplit-nosub", g, bf)

    # int8w with and without split
    m = st.compile(st.import_model(blob), bf, quant="int8")
    dt = timeit(m._fn, m.params, x)
    print(f"[int8w full] {8/dt:.1f} img/s", flush=True)
    del m
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
